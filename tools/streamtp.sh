#!/usr/bin/env bash
# Sustained-stream throughput capture (SCALING.md §9): replay synthetic
# multi-million-event logs through the two production ingest edges
# (graft.tools.StreamThroughput) at three log sizes each, one JVM per
# capture. Appends one JSON line per run to STREAMTP.local.json.
#
# Usage: tools/streamtp.sh [sfDir]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR=${1:-/root/testdata/sf0.1}
OUT=STREAMTP.local.json

ADD_OPENS=(java.base/java.lang java.base/java.lang.invoke
  java.base/java.lang.reflect java.base/java.io java.base/java.net
  java.base/java.nio java.base/java.util java.base/java.util.concurrent
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch
  java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar)
JOPTS=()
for p in "${ADD_OPENS[@]}"; do JOPTS+=(--add-opens "$p=ALL-UNNAMED"); done

run() {
  java -Xmx24g -XX:+UseG1GC "${JOPTS[@]}" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.tools.StreamThroughput "$@" 2>/dev/null | grep '"tool"'
}

: > "$OUT"
# project: the consumer->decode->LWW->state loop. Keys scale with the log
# (state volume grows with traffic, the realistic shape); 16 micro-batches
# at every size so per-batch volume scales and fixed per-batch machinery
# is the same count everywhere.
run project  1000000  100000 16 | tee -a "$OUT"
run project  3000000  300000 16 | tee -a "$OUT"
run project 10000000 1000000 16 | tee -a "$OUT"
# gate: s21's stateless Bloom decontamination probe at the ingest edge.
run gate  125000 "$SF_DIR" 16 | tee -a "$OUT"
run gate  500000 "$SF_DIR" 16 | tee -a "$OUT"
run gate 2000000 "$SF_DIR" 16 | tee -a "$OUT"
