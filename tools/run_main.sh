#!/usr/bin/env bash
# Run a graft main class straight from compiled classes (no sbt lock):
# long scale-generation / measurement jobs can run concurrently with an
# sbt test or compile session, which a `sbt runMain` cannot (the build
# server serializes them). Mirrors build.sbt's forked-run JVM options.
#
# Usage: tools/run_main.sh <MainClass> [args...]
#   SPARK_DRIVER_MEM  heap (default 8g)
#   SPARK_GRAFT_CPUS  respected by the mains themselves
set -euo pipefail
cd "$(dirname "$0")/.."

CLS="${1:?usage: run_main.sh <graft.MainClass> [args...]}"
shift

OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$CLS" "$@"
