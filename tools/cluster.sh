#!/usr/bin/env bash
# Real multi-JVM Spark standalone cluster on this box (SCALING.md §8):
# one Master JVM + N Worker JVMs, each worker launching executor
# PROCESSES — shuffle blocks serialize over loopback TCP between
# executors (never the in-process short-circuit local[N] takes), and
# executors are killable for the chaos capture (graft.tools.ChaosKill).
#
# Usage:
#   tools/cluster.sh start [nWorkers] [coresPerWorker] [memPerWorker]
#   tools/cluster.sh stop
#   tools/cluster.sh status
#
# Defaults: 2 workers x 8 cores x 10g. Master URL: spark://127.0.0.1:7077
# Logs + pids under /tmp/graft-cluster. Drive it with the regular bench:
#
#   sbt -batch package
#   SPARK_GRAFT_MASTER=spark://127.0.0.1:7077 \
#   SPARK_GRAFT_JARS=target/scala-2.13/<graft>.jar \
#   SPARK_GRAFT_SF_DIR=scale/x300m SPARK_GRAFT_CPUS=16 \
#   SPARK_GRAFT_QUERIES=d14_substring_runs,... \
#     tools/pressure-style invocation or sbt "runMain graft.Bench"
set -euo pipefail

SPARK_JARS=/opt/spark/jars
DIR=/tmp/graft-cluster
MASTER_URL=spark://127.0.0.1:7077

ADD_OPENS=(java.base/java.lang java.base/java.lang.invoke
  java.base/java.lang.reflect java.base/java.io java.base/java.net
  java.base/java.nio java.base/java.util java.base/java.util.concurrent
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch
  java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar)
JOPTS=()
for p in "${ADD_OPENS[@]}"; do JOPTS+=(--add-opens "$p=ALL-UNNAMED"); done

start() {
  local n=${1:-2} cores=${2:-8} mem=${3:-10g}
  mkdir -p "$DIR"
  echo "[cluster] starting master at $MASTER_URL"
  SPARK_HOME=/opt/spark nohup java "${JOPTS[@]}" -Xmx1g \
    -cp "$SPARK_JARS/*" org.apache.spark.deploy.master.Master \
    --host 127.0.0.1 --port 7077 --webui-port 8091 \
    >"$DIR/master.log" 2>&1 &
  echo $! > "$DIR/master.pid"
  sleep 3
  for i in $(seq 1 "$n"); do
    echo "[cluster] starting worker $i ($cores cores, $mem)"
    SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 nohup java "${JOPTS[@]}" -Xmx1g \
      -cp "$SPARK_JARS/*" org.apache.spark.deploy.worker.Worker \
      --cores "$cores" --memory "$mem" --work-dir "$DIR/work$i" \
      --webui-port $((8091 + i)) "$MASTER_URL" \
      >"$DIR/worker$i.log" 2>&1 &
    echo $! > "$DIR/worker$i.pid"
  done
  sleep 3
  status
}

stop() {
  # kill any executor processes first, then workers, then master
  pkill -9 -f CoarseGrainedExecutorBackend 2>/dev/null || true
  for f in "$DIR"/worker*.pid "$DIR"/master.pid; do
    [ -f "$f" ] && { kill -9 "$(cat "$f")" 2>/dev/null || true; rm -f "$f"; }
  done
  echo "[cluster] stopped"
}

status() {
  for f in "$DIR"/master.pid "$DIR"/worker*.pid; do
    [ -f "$f" ] || continue
    local_pid=$(cat "$f")
    if kill -0 "$local_pid" 2>/dev/null; then
      echo "[cluster] $(basename "$f" .pid) up (pid $local_pid)"
    else
      echo "[cluster] $(basename "$f" .pid) DOWN"
    fi
  done
  pgrep -f CoarseGrainedExecutorBackend >/dev/null 2>&1 \
    && echo "[cluster] executors: $(pgrep -cf CoarseGrainedExecutorBackend)" \
    || echo "[cluster] executors: 0"
}

case "${1:-}" in
  start) shift; start "$@" ;;
  stop) stop ;;
  status) status ;;
  *) echo "usage: cluster.sh start|stop|status" >&2; exit 1 ;;
esac
