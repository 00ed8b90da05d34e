#!/bin/bash
# Local bench runner matching the sbt fork's JVM flags (add-opens for
# Spark-4-on-JDK17, 48g heap). Usage:
#   tools/run_bench.sh [extra env via environment]
# e.g. SPARK_GRAFT_BENCH_FILTER=q_a,q_b SPARK_GRAFT_BENCH_RUNS=3 tools/run_bench.sh
set -u
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -cp "/opt/spark/jars/*:$(dirname "$0")/../target/scala-2.13/glaciersgeespark_2.13-0.1.0.jar" \
  graft.Bench
