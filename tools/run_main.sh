#!/usr/bin/env bash
# Launch a graft main as a bare JVM (no sbt lock held): compile first
# with `sbt compile`, then tools/run_main.sh <MainClass> [args...].
# Heap via SPARK_DRIVER_MEM (default 8g); same module opens as build.sbt.
set -euo pipefail
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"
