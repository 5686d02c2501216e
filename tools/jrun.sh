#!/bin/bash
# Run a graft main class outside sbt (so sbt's project lock stays free and
# the JVM survives assistant-session death when daemonized). Mirrors
# build.sbt's javaOptions: JDK17 add-opens + UTC + heap.
# Usage: tools/jrun.sh <MainClass> [args...]   (env: SPARK_DRIVER_MEM, SPARK_GRAFT_*)
set -e
cd "$(dirname "$0")/.."
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
# GRAFT_JAVA_OPTS: extra -D flags (e.g. -Dspark.buffer.pageSize=4m for
# the attach-sort A/B — SparkConf picks spark.* system properties up)
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  ${GRAFT_JAVA_OPTS:-} \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
