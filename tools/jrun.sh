#!/bin/sh
# Run a graft main via plain `java` — no sbt workspace lock, so
# long-running evidence jobs (GenData rungs, Bench ladders, stream
# state probes) can proceed while sbt compiles/tests in parallel.
# Mirrors build.sbt's forked-run JVM flags exactly (the --add-opens
# list Spark 4 on JDK 17 needs outside spark-submit, the enlarged JIT
# code cache, UTC, no UI). Compile first: `sbt compile` (classes are
# read from target/scala-2.13/classes).
#
# Usage: tools/jrun.sh <mainClass> [args...]
#   env: SPARK_DRIVER_MEM (default 8g) and the usual SPARK_GRAFT_*.
set -e
cd "$(dirname "$0")/.."
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -XX:ReservedCodeCacheSize=512m \
  -cp "${GRAFT_CLASSES:-target/scala-2.13/classes:target/scala-2.13/test-classes}:/opt/spark/jars/*" \
  "$@"
