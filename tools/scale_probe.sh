#!/bin/bash
# sf1 scale probe: time the heavy queries at sf0.1 and at the ScaleUp'd
# ~sf1 layout on the SAME machine, so the ratio (ideal ~10x for
# linear-in-data queries) is a measured scaling exponent rather than a
# plan-shape argument. Usage:
#   tools/scale_probe.sh [sf1_dir]    (default /tmp/graft_sf1)
# Prereq: sbt "runMain graft.tools.ScaleUp" has populated sf1_dir.
set -e
SF1=${1:-/tmp/graft_sf1}
HEAVY="q05,q07,q18,q21,q22,q38,q45,q48,q51,q59,q68,q73,q97,q115,q116,q120,q124,q139,q143,q149,q152,q153"
cd "$(dirname "$0")/.."
echo "== sf0.1 baseline =="
GRAFT_ONLY=$HEAVY SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tee /tmp/probe_sf01.json
echo "== sf1 probe =="
GRAFT_ONLY=$HEAVY SPARK_GRAFT_SF_DIR=$SF1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tee /tmp/probe_sf1.json
