#!/usr/bin/env python3
"""Per-query oracle compare with subprocess isolation: one DuckDB
crash (its list_reduce fold is memory-fragile at sf0.1 volume) or
nondeterministic glitch doesn't kill the sweep. Same canonicalization
as tools/compare.py.

Usage: python3 tools/compare_each.py <verify_out_dir> <sf_dir>
"""
import sys, os, subprocess, tempfile

ONE = r'''
import duckdb, pandas as pd, numpy as np, glob, json, sys, os
out_dir, sf_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
oracle = json.load(open(out_dir + "/oracle_sql.json"))
# COMPARE_SCALABLE=1: overlay scalable twins (validated row-identical
# against the naive primaries at the largest scale where both finish)
# so sf1+ sweeps don't time out on deliberately naive oracle SQL
if os.environ.get("COMPARE_SCALABLE") == "1":
    sc_path = out_dir + "/oracle_sql_scalable.json"
    if os.path.exists(sc_path):
        oracle.update(json.load(open(sc_path)))
got = pd.concat([pd.read_parquet(f)
                 for f in glob.glob(out_dir + "/" + name + "/*.parquet")],
                ignore_index=True)
if name not in oracle:
    print("ROWS-ONLY", len(got)); sys.exit(0)
con = duckdb.connect()
import os as _os, re as _re
sql_under_test = oracle[name]
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    # Each subprocess compares ONE query: only bind (and, for
    # directory layouts, copy) the tables its SQL actually names —
    # materializing all ~10 per process multiplies the upfront parquet
    # decode by the sweep's query count for nothing.
    # match case-insensitively (table names are lowercase, but a twin
    # may name them in any case); a CTE/alias sharing a table name just
    # causes a harmless extra bind
    if not _re.search(r"\b" + t + r"\b", sql_under_test.lower()):
        continue
    # single-file (driver testdata) vs Spark-written directory layouts
    p = f"{sf_dir}/{t}.parquet"
    is_dir = _os.path.isdir(p)
    src = f"'{p}/*.parquet'" if is_dir else f"'{p}'"
    # Directory globs bind with estimated cardinality 0/1 in DuckDB, and
    # the optimizer then collapses multi-join queries into CROSS_PRODUCT
    # plans (observed: q116's pairs x item at sf1 — quadratic, >1800 s
    # for a 6 s query; the round-11 "oracle timeout"). Materializing the
    # directory sources as tables restores real stats and sane join
    # orders at the cost of an upfront copy.
    # events gets a normalizing view on top, so its physical source
    # lands under a _src name and `events` is always the view
    tgt = "events_src" if t == "events" else t
    if is_dir:
        con.execute(f"CREATE TABLE {tgt} AS SELECT * FROM {src}")
    else:
        con.execute(f"CREATE VIEW {tgt} AS SELECT * FROM {src}")
    if t == "events":
        ts_type = con.execute(
            "SELECT column_type FROM (DESCRIBE events_src) WHERE column_name='ts'"
        ).fetchone()[0]
        if ts_type == "BIGINT":  # raw nanos -> micros-truncated TIMESTAMP
            con.execute(
                "CREATE VIEW events AS SELECT "
                "event_id, make_timestamp(ts // 1000) AS ts, user_id, "
                "event_type, value, props FROM events_src")
        else:
            con.execute("CREATE VIEW events AS SELECT * FROM events_src")
exp = con.execute(oracle[name]).fetchdf()
def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object: df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating): df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer): df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)
g, e = canon(got), canon(exp)
if list(g.columns) != list(e.columns): print("SCHEMA", list(g.columns), list(e.columns))
elif len(g) != len(e): print("ROWCOUNT", len(g), len(e))
elif g.equals(e): print("OK", len(g))
else: print("HASH")
'''

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    with tempfile.NamedTemporaryFile('w', suffix='.py', delete=False) as f:
        f.write(ONE)
        one = f.name
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # optional 3rd arg: comma-separated subset (resume / re-check)
    if len(sys.argv) > 3:
        pick = set(sys.argv[3].split(","))
        names = [n for n in names if n in pick or n.split("_")[0] in pick]
    timeout = int(os.environ.get("COMPARE_TIMEOUT", "1800"))
    n_ok = 0
    for name in names:
        try:
            r = subprocess.run([sys.executable, one, out_dir, sf_dir, name],
                               capture_output=True, text=True, timeout=timeout)
            status = (r.stdout.strip() if r.returncode == 0
                      else f"CRASH rc={r.returncode}")
        except subprocess.TimeoutExpired:
            status = f"TIMEOUT >{timeout}s"  # oracle cost, not a mismatch
        if status.startswith(("OK", "ROWS-ONLY")): n_ok += 1
        print(f"{status.split()[0]:10} {name}: {' '.join(status.split()[1:])}",
              flush=True)
    print(f"\n{n_ok}/{len(names)} queries match")

if __name__ == "__main__":
    main()
