#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify's
output against the DuckDB oracle and report per-query row/schema/hash
match. Mimics the documented compare: sort columns by name, sort rows,
canonical-round floats (1e-9), hash values.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        # driver testdata ships each table as a single parquet FILE;
        # Spark-written copies (the sf1 scale probe) are a DIRECTORY of
        # part-files — glob accordingly so both layouts compare
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        # the driver's events file has nanos-as-TIMESTAMP; a Spark-written
        # copy stores raw BIGINT nanos. Normalize to micros-truncated
        # TIMESTAMP (the same truncation graft.sources.Tables.events
        # applies) so every oracle query is layout-invariant.
        if t == "events":
            ts_type = con.execute(
                "SELECT column_type FROM (DESCRIBE events) WHERE column_name='ts'"
            ).fetchone()[0]
            if ts_type == "BIGINT":
                con.execute(
                    "CREATE OR REPLACE VIEW events AS SELECT "
                    "event_id, make_timestamp(ts // 1000) AS ts, user_id, "
                    f"event_type, value, props FROM {src}")
    n_ok = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"{'ROWS-ONLY':10} {name}: rows={len(got)}")
            n_ok += 1 if len(got) > 0 else 0
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{'ORACLE-ERR':10} {name}: {e}")
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"{'SCHEMA':10} {name}: spark={list(g.columns)} oracle={list(e.columns)}")
            continue
        if len(g) != len(e):
            print(f"{'ROWCOUNT':10} {name}: spark={len(g)} oracle={len(e)}")
            continue
        if g.equals(e):
            print(f"{'OK':10} {name}: rows={len(g)}")
            n_ok += 1
        else:
            neq = (g != e) & ~(g.isna() & e.isna())
            bad_rows = neq.any(axis=1)
            print(f"{'HASH':10} {name}: {int(bad_rows.sum())}/{len(g)} rows differ")
            idx = bad_rows[bad_rows].index[:3]
            for i in idx:
                cols = [c for c in g.columns if neq.loc[i, c]]
                for c in cols[:4]:
                    print(f"             row {i} col {c}: spark={g.loc[i,c]!r} oracle={e.loc[i,c]!r}")
    print(f"\n{n_ok}/{len(names)} queries match")

if __name__ == "__main__":
    main()
