#!/bin/bash
# standalone_bench.sh variant that KEEPS stderr (Spark logs + fatal
# errors) — for diagnosing a query that dies without a usable message.
# Usage: tools/run_query_debug.sh <query> [stderr_file]
set -u
cd "$(dirname "$0")/.."
Q="$1"
ERRF="${2:-/tmp/${Q}_debug.err}"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
MEM="${SPARK_DRIVER_MEM:-8g}"
GC="${SPARK_GRAFT_GC:-ParallelGC}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_ONLY="$Q" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
java $ADD_OPENS -Xmx"$MEM" -Xms"$MEM" -XX:ReservedCodeCacheSize=512m \
  "-XX:+Use$GC" -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  ${SPARK_GRAFT_JAVA_OPTS:-} \
  -cp "$CP" graft.Bench 2> "$ERRF" \
  | grep -E '"metric"'
echo "stderr -> $ERRF" >&2
