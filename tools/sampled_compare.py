#!/usr/bin/env python3
"""Copy-closed sampled-key oracle compare for the heavy queries whose
FULL DuckDB twins die oracle-side at sf10 (q115's 180M-edge CTE chain
crashes the process; q22's 16-way minhash cross join OOMs).

Idea: ScaleUp's replicas are DISJOINT SUBUNIVERSES — every key of copy
c is `orig * mult + c`, and no join/group/shingle-bucket relationship
crosses copies for these queries (closure arguments per query below).
So the engine's sfN output restricted to copy-0 keys must equal the
oracle SQL run over the INPUT TABLES restricted to copy 0
(`key % mult = 0`) — a DIRECT engine-vs-DuckDB check on a
deterministic 1/mult of the keys, with oracle-side work at 1/mult of
the data (sf0.1-scale for an sf10 probe), instead of a bespoke
per-query replication argument.

Closure, per configured query:
 - q115_pagerank: edges need a shared l_orderkey and ScaleUp shifts
   l_orderkey/l_partkey with the SAME copy index, so copies are
   disjoint subgraphs; PageRank on a disjoint component equals global
   PageRank restricted to it.
 - q139_triangle_count: same disjoint-subgraph argument (edges need a
   shared l_orderkey); per-vertex triangle counts restricted to copy-0
   vertices equal the copy-0-only counts.
 - q22_dedup_minhash_lsh: signatures/band hashes are PER-DOC
   (no corpus statistics), candidate generation is same-band-value
   equality, verify is per-pair — so the sampled run's pair set is
   exactly the full run's pairs with both docs in the sample.
 - q124_incremental_dedup: same per-doc/per-pair structure as q22;
   the %4 batch split commutes with the copy-0 restriction because it
   is a predicate on the same doc_id either way.

CORPUS-STATISTIC queries — closed ONLY on a DISJOINT-VOCABULARY
fixture (ScaleUp's `salt` mode: copy 0 verbatim, copy c's words tagged
`w#c`, so no shingle/window/band value can cross copies):
 - q39_dedup_ngram_capped: the df-cap (df <= 5) reads corpus document
   frequency. With disjoint vocabularies a shingle lives in exactly one
   copy, so full-corpus df = within-copy df and the cap keeps the same
   shingles the copy-0-only oracle keeps. (On the word-permuted
   fixture, coincidental cross-copy shingle sharing can push a df past
   the cap in the full corpus but not the sample — NOT closed there.)
 - q48_dedup_clusters / q59_dedup_clusters_star: capped pairs (above)
   plus connected components. No cross-copy edge can exist, so
   components stay within-copy and the min-label of a copy-0 component
   is a copy-0 doc; filtering output docs to copy 0 keeps labels
   comparable. The output filter deliberately restricts only `doc` —
   a cross-copy label would surface as a HASH mismatch, not be
   filtered away.
 - q51_corpus_curation: per-doc scoring (fixed stopword lists, no
   corpus thresholds) + the q48 components argument + a per-doc md5
   hash-coin sample — all per-doc or within-copy. Honesty note: on the
   salted fixture copy>0 docs FAIL the quality gate (tagged stopwords
   zero the stop_ratio), so the engine processes mult× docs but the
   compared output is the copy-0 subcorpus — a real engine-vs-oracle
   check, but q51's at-scale workload-shape evidence stays on the
   word-permuted fixture (decade probes, SCALING.md).
 - q165_substring_dedup / q166_substring_removal: the duplicated-window
   test (same 8-gram in >1 doc) is a corpus statistic; disjoint
   vocabularies make cross-copy window equality impossible, so a
   window is duplicated in the full corpus iff duplicated within its
   copy.

Validation protocol: run this at sf1 with mult=10 ON THE SAME FIXTURE
MODE, where the FULL twins also pass — if the sampled scheme agrees
there, the closure argument is measured, not assumed. r14 artifact:
bench/sampled_compare_r14.json (sf1-salted validation + sf10-salted
sweep). q21 (uncapped) has no sf10 entry BY DESIGN: its pre-flight
guard trips on the projected verify-join volume (bench/
probe_r13_q21_guard_sf10.json); its capped shape is covered by q39.

Usage:
  python3 tools/sampled_compare.py <verify_out_dir> <sf_dir> <mult> [names...]

Prints one line per query (OK/SCHEMA/ROWCOUNT/HASH + sampled row
count) and a summary; exit 1 on any mismatch.
"""
import glob
import json
import os
import re
import sys

import duckdb
import numpy as np
import pandas as pd

SAMPLED = {
    "q115_pagerank": {
        "input_filters": {"lineitem": "l_orderkey % {m} = 0"},
        "output_filter": "l_partkey % {m} = 0",
    },
    "q22_dedup_minhash_lsh": {
        "input_filters": {"documents": "doc_id % {m} = 0"},
        "output_filter": "ia % {m} = 0 AND ib % {m} = 0",
    },
    "q124_incremental_dedup": {
        "input_filters": {"documents": "doc_id % {m} = 0"},
        "output_filter": "ia % {m} = 0 AND ib % {m} = 0",
    },
    "q139_triangle_count": {
        "input_filters": {"lineitem": "l_orderkey % {m} = 0"},
        "output_filter": "u % {m} = 0",
    },
    # q111: per-user closure. The SCD2 history is a window PARTITION BY
    # user_id over the user's OWN change events, and the PIT join is
    # equi-keyed on user_id — no cross-user relationship anywhere.
    # ScaleUp shifts user_id and event_id with the SAME copy index, so
    # user_id % m = 0 selects exactly copy 0 of both relations; the
    # change-log filter (event_id % 3 = 0) is applied to the same
    # shifted ids in both engine and sampled oracle, so the histories
    # are built from identical rows. Intervals are disjoint per key,
    # so each event produces exactly one output row — rowcount is a
    # real check. Closed on ANY fixture mode (no corpus statistics).
    "q111_pit_join": {
        "input_filters": {"events": "user_id % {m} = 0"},
        "output_filter": "user_id % {m} = 0",
    },
    # ---- the entries below require a DISJOINT-VOCABULARY fixture
    # (ScaleUp `salt` mode); see the closure notes in the docstring ----
    "q39_dedup_ngram_capped": {
        "input_filters": {"documents": "doc_id % {m} = 0"},
        "output_filter": "ia % {m} = 0 AND ib % {m} = 0",
        "salted_fixture": True,
    },
    "q48_dedup_clusters": {
        "input_filters": {"documents": "doc_id % {m} = 0"},
        "output_filter": "doc % {m} = 0",
        "salted_fixture": True,
    },
    "q59_dedup_clusters_star": {
        "input_filters": {"documents": "doc_id % {m} = 0"},
        "output_filter": "doc % {m} = 0",
        "salted_fixture": True,
    },
    "q51_corpus_curation": {
        "input_filters": {"documents": "doc_id % {m} = 0"},
        "output_filter": "doc_id % {m} = 0",
        "salted_fixture": True,
    },
    "q165_substring_dedup": {
        "input_filters": {"documents": "doc_id % {m} = 0"},
        "output_filter": "doc_id % {m} = 0",
        "salted_fixture": True,
    },
    "q166_substring_removal": {
        "input_filters": {"documents": "doc_id % {m} = 0"},
        "output_filter": "doc_id % {m} = 0",
        "salted_fixture": True,
    },
}


def canon(df):
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
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def fixture_is_salted(sf_dir, mult):
    """True when documents copies >0 carry the `w#c` vocabulary tag —
    the property the corpus-statistic closures depend on. Checked on a
    handful of copy-1 docs, not assumed from how the fixture was
    (supposedly) generated. EVERY word must end with the copy's own
    tag: a mere '#' substring test would false-positive on source text
    that naturally contains hashtag/anchor tokens, and the closures
    would then be graded on a fixture where they do not hold."""
    con = duckdb.connect()
    p = f"{sf_dir}/documents.parquet"
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    rows = con.execute(
        f"SELECT text FROM {src} WHERE doc_id % {mult} = 1 "
        "AND length(text) > 0 LIMIT 5").fetchall()
    return bool(rows) and all(
        w.endswith("#1") for r in rows for w in r[0].split(" ") if w)


def compare_one(out_dir, sf_dir, mult, name, oracle):
    cfg = SAMPLED[name]
    con = duckdb.connect()
    sql = oracle[name]
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        if not re.search(r"\b" + t + r"\b", sql.lower()):
            continue
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        filt = cfg["input_filters"].get(t)
        where = " WHERE " + filt.format(m=mult) if filt else ""
        # materialize (stats for sane join orders, as in compare_each);
        # events needs the same ts-normalizing view compare_each binds
        # (BIGINT nanos layouts -> micros-truncated TIMESTAMP), or a
        # future events-named SAMPLED entry would compare raw longs
        tgt = "events_src" if t == "events" else t
        con.execute(f"CREATE TABLE {tgt} AS SELECT * FROM {src}{where}")
        if t == "events":
            ts_type = con.execute(
                "SELECT column_type FROM (DESCRIBE events_src) "
                "WHERE column_name='ts'").fetchone()[0]
            if ts_type == "BIGINT":
                con.execute(
                    "CREATE VIEW events AS SELECT "
                    "event_id, make_timestamp(ts // 1000) AS ts, user_id, "
                    "event_type, value, props FROM events_src")
            else:
                con.execute("CREATE VIEW events AS SELECT * FROM events_src")
    exp = con.execute(sql).fetchdf()
    got_full = pd.concat(
        [pd.read_parquet(f)
         for f in glob.glob(f"{out_dir}/{name}/*.parquet")],
        ignore_index=True)
    con.register("got_full", got_full)
    got = con.execute(
        "SELECT * FROM got_full WHERE "
        + cfg["output_filter"].format(m=mult)).fetchdf()
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        return ("SCHEMA", f"{list(g.columns)} vs {list(e.columns)}")
    if len(g) != len(e):
        return ("ROWCOUNT", f"engine {len(g)} vs oracle {len(e)}")
    if g.equals(e):
        return ("OK", f"rows={len(g)} (sampled 1/{mult} of keys)")
    return ("HASH", f"rows={len(g)}")


def main():
    out_dir, sf_dir, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:] or sorted(
        n for n in SAMPLED if os.path.isdir(os.path.join(out_dir, n)))
    oracle = json.load(open(out_dir + "/oracle_sql.json"))
    sc_path = out_dir + "/oracle_sql_scalable.json"
    if os.environ.get("COMPARE_SCALABLE") == "1" and os.path.exists(sc_path):
        oracle.update(json.load(open(sc_path)))
    ok, compared = 0, 0
    salted = None
    for name in names:
        if name not in SAMPLED:
            # not a failure: a SKIP is "no closure argument exists",
            # which the exit code must not conflate with a mismatch
            print(f"SKIP       {name}: no copy-closure config")
            continue
        if SAMPLED[name].get("salted_fixture"):
            if salted is None:
                salted = fixture_is_salted(sf_dir, mult)
            if not salted:
                # running the comparison anyway would grade a closure
                # that does not hold on this fixture — a mismatch would
                # be a fixture artifact, a match a coincidence
                print(f"SKIP       {name}: closure needs a disjoint-"
                      f"vocabulary fixture (ScaleUp salt mode); {sf_dir} "
                      "is not one")
                continue
        compared += 1
        status, detail = compare_one(out_dir, sf_dir, mult, name, oracle)
        if status == "OK":
            ok += 1
        print(f"{status:10} {name}: {detail}", flush=True)
    print(f"\n{ok}/{compared} sampled-key twins match"
          + (f" ({len(names) - compared} skipped)" if compared < len(names) else ""))
    sys.exit(0 if ok == compared else 1)


if __name__ == "__main__":
    main()
