#!/usr/bin/env bash
# One-command reproduction of the heavy-set sampled-key oracle sweep
# (the round-14 protocol behind bench/sampled_compare_r14.json):
#
#   1. generate the SALTED ScaleUp fixtures (disjoint-vocabulary copies;
#      the corpus-statistic closures hold only there) at sf1 and sf10
#   2. engine-run the heavy set at sf1, validate BOTH the full DuckDB
#      twins and the sampled twins (closure = measured, not assumed)
#   3. engine-run the heavy set at sf10, run the sampled compare
#
# q139 needs a driver heap that can host its broadcast adjacency at
# sf10 (the heap-aware ceiling otherwise degrades it to the slower
# shuffle plan — still correct, just slower), hence SPARK_DRIVER_MEM.
#
# Usage: tools/sampled_sweep.sh [workdir]   (default /tmp)
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/tmp}"
HEAVY="q115,q22,q124,q139,q39,q48,q59,q51,q165,q166"

echo "== fixtures (salted) =="
SPARK_GRAFT_CPUS=16 sbt -batch \
  "runMain graft.tools.ScaleUp /root/testdata/sf0.1 $WORK/graft_sf1s 10 salt"
SPARK_GRAFT_CPUS=16 sbt -batch \
  "runMain graft.tools.ScaleUp /root/testdata/sf0.1 $WORK/graft_sf10s 100 salt"

echo "== sf1: engine run =="
rm -rf "$WORK/verify_sf1s"
GRAFT_ONLY="$HEAVY" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g sbt -batch \
  "runMain graft.Verify $WORK/graft_sf1s $WORK/verify_sf1s"

echo "== sf1: full-twin validation =="
COMPARE_SCALABLE=1 python3 tools/compare_each.py \
  "$WORK/verify_sf1s" "$WORK/graft_sf1s" "$HEAVY"

echo "== sf1: sampled-twin validation (mult=10) =="
COMPARE_SCALABLE=1 python3 tools/sampled_compare.py \
  "$WORK/verify_sf1s" "$WORK/graft_sf1s" 10

echo "== sf10: engine run =="
rm -rf "$WORK/verify_sf10s"
GRAFT_ONLY="$HEAVY" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g sbt -batch \
  "runMain graft.Verify $WORK/graft_sf10s $WORK/verify_sf10s"

echo "== sf10: sampled compare (mult=100) =="
COMPARE_SCALABLE=1 python3 tools/sampled_compare.py \
  "$WORK/verify_sf10s" "$WORK/graft_sf10s" 100

echo "sampled sweep complete"
