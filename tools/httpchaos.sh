#!/usr/bin/env bash
# Serving-path chaos capture (SCALING.md §8, round 13): run the LIVE
# HTTP serving loop (streaming projection + HttpServe.startLive) on the
# tools/cluster.sh cluster, hammer the routes from concurrent clients,
# kill -9 one executor mid-replay, and assert every request answered
# (zero timeouts, zero 5xx) and post-recovery state hash-matches an
# independent batch replay (graft.tools.HttpChaos).
#
# Usage: tools/httpchaos.sh [nEvents] [nFiles] [killDelayMs] [execMem]
#   tools/cluster.sh start 2 8 10g
#   tools/httpchaos.sh 1000000 32
set -euo pipefail
cd "$(dirname "$0")/.."

N_EVENTS=${1:-1000000}
N_FILES=${2:-32}
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

# TCP shuffle reads, same reasoning as chaos.sh: the dead executor's
# blocks must genuinely disappear, not be read off the shared disk.
SPARK_GRAFT_CPUS=16 SPARK_GRAFT_EXECUTOR_MEM="$EXEC_MEM" \
SPARK_GRAFT_KILL_DELAY_MS="$DELAY" \
exec java -Xmx6g -XX:+UseG1GC "${JOPTS[@]}" \
  -Dspark.shuffle.readHostLocalDisk=false \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.driver.host=127.0.0.1 \
  -Dspark.executor.extraJavaOptions="$EXEC_OPENS" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.tools.HttpChaos \
  spark://127.0.0.1:7077 "$JAR" "$N_EVENTS" "$N_FILES"
