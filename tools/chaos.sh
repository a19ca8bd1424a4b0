#!/usr/bin/env bash
# Executor-loss chaos capture (SCALING.md §8): kill -9 one executor JVM
# mid-query on the tools/cluster.sh cluster and assert the query
# completes with the calm run's exact result hash (graft.tools.ChaosKill).
#
# Usage: tools/chaos.sh <sfDir> <query> [killDelayMs] [execMem]
#   tools/cluster.sh start 2 8 10g
#   tools/chaos.sh scale/x300m d14_substring_runs 5000
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR=${1:?usage: chaos.sh <sfDir> <query> [killDelayMs] [execMem]}
QUERY=${2:?query name}
DELAY=${3:-2000}
EXEC_MEM=${4:-8g}

JAR=$(ls target/scala-2.13/*.jar | head -1)

ADD_OPENS=(java.base/java.lang java.base/java.lang.invoke
  java.base/java.lang.reflect java.base/java.io java.base/java.net
  java.base/java.nio java.base/java.util java.base/java.util.concurrent
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch
  java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar)
JOPTS=()
EXEC_OPENS=""
for p in "${ADD_OPENS[@]}"; do
  JOPTS+=(--add-opens "$p=ALL-UNNAMED")
  EXEC_OPENS="$EXEC_OPENS --add-opens=$p=ALL-UNNAMED"
done

# Force cross-executor shuffle reads over TCP (see clusterbench.sh): the
# chaos case must sever block availability when the executor dies, so the
# survivors' fetches fail over the wire and the stage genuinely resubmits
# — not quietly read the corpse's files off the shared local disk.
SPARK_GRAFT_CPUS=16 SPARK_GRAFT_EXECUTOR_MEM="$EXEC_MEM" \
SPARK_GRAFT_KILL_DELAY_MS="$DELAY" \
exec java -Xmx4g -XX:+UseG1GC "${JOPTS[@]}" \
  -Dspark.shuffle.readHostLocalDisk=false \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.driver.host=127.0.0.1 \
  -Dspark.executor.extraJavaOptions="$EXEC_OPENS" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.tools.ChaosKill \
  spark://127.0.0.1:7077 "$SF_DIR" "$QUERY" "$JAR"
