#!/usr/bin/env bash
# Sustained-stream throughput capture (SCALING.md §9): replay synthetic
# multi-million-event logs through the two production ingest edges
# (graft.tools.StreamThroughput) at three log sizes each, one JVM per
# capture.
#
# Record discipline (r12 verdict, What's-wrong #2): this script NEVER
# truncates its output. Every invocation APPENDS one labeled header line
# plus one JSON line per run (the SLOPES_r*.local.json convention), so
# every number a SCALING table cites exists in the committed artifact —
# the r12 form truncated per-run and the section's "best of 2" table
# cited numbers only the overwritten first pass had produced.
#
# Usage: tools/streamtp.sh [sfDir] [label] [mode]
#   label   free-text tag for the header lines (default: "pass")
#   mode    project | gate | both (default both)
# Cluster capture (SCALING §9 cluster row): start tools/cluster.sh, then
#   SPARK_GRAFT_MASTER=spark://127.0.0.1:7077 \
#   SPARK_GRAFT_JARS=$(ls target/scala-2.13/*.jar | head -1) \
#   SPARK_GRAFT_EXECUTOR_MEM=10g \
#     tools/streamtp.sh /root/testdata/sf0.1 cluster-tcp project
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR=${1:-/root/testdata/sf0.1}
LABEL=${2:-pass}
MODE=${3:-both}
OUT=STREAMTP.local.json

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

run() {
  # settle gap BEFORE every run (the slope.sh discipline): back-to-back
  # JVMs otherwise inherit the previous capture's load-average residue
  # and the cell's load1_start label reads contended on an idle box.
  MAXLOAD=${GRAFT_MAXLOAD:-3.0}
  SETTLED=0
  for _ in $(seq 1 60); do
    L=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$L" -v m="$MAXLOAD" 'BEGIN{exit !(l<m)}' && { SETTLED=1; break; }
    sleep 10
  done
  # Never fall through to a contended capture (the slope.sh discipline).
  if [ "$SETTLED" != "1" ]; then
    echo "[streamtp] settle budget exhausted (load1 >= $MAXLOAD) — REFUSING to launch" >&2
    exit 3
  fi
  echo "=== $(date -u +%FT%TZ) $LABEL $*" >> "$OUT"
  # GRAFT_TCP=1: cluster captures force cross-executor shuffle reads
  # onto loopback TCP (see clusterbench.sh) — core conf, launch-time -D.
  TCP_OPT=""
  [ "${GRAFT_TCP:-0}" = "1" ] && TCP_OPT="-Dspark.shuffle.readHostLocalDisk=false"
  java -Xmx24g -XX:+UseG1GC "${JOPTS[@]}" $TCP_OPT \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.driver.host=127.0.0.1 \
    -Dspark.executor.extraJavaOptions="$EXEC_OPENS" \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.tools.StreamThroughput "$@" 2>/dev/null | grep '"tool"' | tee -a "$OUT"
}

if [ "$MODE" = "project" ] || [ "$MODE" = "both" ]; then
  # project: the consumer->decode->LWW->state loop. Keys scale with the
  # log (state volume grows with traffic, the realistic shape); 16
  # micro-batches at every size so per-batch volume scales and fixed
  # per-batch machinery is the same count everywhere.
  run project  1000000  100000 16
  run project  3000000  300000 16
  run project 10000000 1000000 16
fi
if [ "$MODE" = "gate" ] || [ "$MODE" = "both" ]; then
  # gate: s21's stateless Bloom decontamination probe at the ingest edge.
  run gate  125000 "$SF_DIR" 16
  run gate  500000 "$SF_DIR" 16
  run gate 2000000 "$SF_DIR" 16
fi
