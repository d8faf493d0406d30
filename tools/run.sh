#!/usr/bin/env bash
# Dev-only: run a graft main (graft.Bench / graft.Verify / graft.tools.DataGen)
# directly with java, bypassing sbt — so long-running mains don't hold the
# sbt server lock and can run concurrently with `sbt test`.
# Usage: tools/run.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 48g), SPARK_GRAFT_JAVA_OPTS, SPARK_GRAFT_SF_DIR
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
[ -d "$CLASSES" ] || { echo "run 'sbt compile' first" >&2; exit 1; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MAIN="$1"; shift
# shellcheck disable=SC2086
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -XX:ReservedCodeCacheSize=512m \
  ${SPARK_GRAFT_JAVA_OPTS:-} \
  -cp "$CLASSES:/opt/spark/jars/*" "$MAIN" "$@"
