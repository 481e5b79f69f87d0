#!/bin/bash
# Executor-loss fault injection for the batch iterative family under
# graft.checkpoint.reliable=true: real multi-process cluster
# (local-cluster[2,4,2048]), SIGKILL one executor mid-run, require the
# job to finish with a row-identical result. Writes bench/fault_probe.json.
# Usage: tools/fault_probe.sh [sfDir] [qPrefixCsv]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
QS=${2:-q48,q59,q115,q124}
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_CPUS=8 \
  sbt -batch "runMain graft.tools.FaultProbe $SF $QS" 2>&1 | \
  grep -E "faultprobe:|\{\"q"
