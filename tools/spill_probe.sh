#!/bin/bash
# Spill-path proof: run the heaviest batch queries under a deliberately
# small unified memory pool (spark.testing.memory) and compare results
# against an unconstrained baseline with identical parallelism. The
# in-CI version of this is SpillSpec (sbt "testOnly graft.SpillSpec");
# this script is the manual/forensic form that leaves the parquet pairs
# and spills.json around for inspection. Usage:
#   tools/spill_probe.sh [outdir]     (default /tmp/graft_spill)
set -e
OUT=${1:-/tmp/graft_spill}
cd "$(dirname "$0")/.."
rm -rf "$OUT"
mkdir -p "$OUT"
echo "== tier 1: 96 MB pool, shuffle-heavy eight =="
# tee the full sbt output so a probe failure leaves its own forensics
SPARK_GRAFT_CPUS=8 sbt -batch \
  "runMain graft.tools.SpillProbe /root/testdata/sf0.1 $OUT/t96 96 q21,q22,q48,q51,q116,q139,q149,q162" \
  2>&1 | tee "$OUT/t96.log" | grep '"pool_mb"'
echo "== tier 2: 384 MB pool, q115 pagerank =="
SPARK_GRAFT_CPUS=8 sbt -batch \
  "runMain graft.tools.SpillProbe /root/testdata/sf0.1 $OUT/t384 384 q115" \
  2>&1 | tee "$OUT/t384.log" | grep '"pool_mb"'
echo "results under $OUT/{t96,t384}/{constrained,baseline}, spills.json per tier"
