#!/usr/bin/env bash
# Run a graft main class directly on the compiled classes + /opt/spark/jars,
# bypassing sbt (no project lock, no sbt startup). Mirrors build.sbt's
# forked-run JVM flags. Usage:
#   scripts/run_main.sh graft.Bench [args...]
# Env passthrough: SPARK_GRAFT_* work exactly as under sbt.
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=${GRAFT_CLASSES:-target/scala-2.13/classes}
[ -d "$CLASSES" ] || { echo "compile first: sbt -batch compile" >&2; exit 1; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -XX:ReservedCodeCacheSize=1g \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  ${GRAFT_JAVA_OPTS:-} \
  -cp "$CLASSES:/opt/spark/jars/*" \
  "$@"
