#!/usr/bin/env bash
# Scaling-slope capture (SCALING.md §3c/§3d): one query against one
# scaled fixture, one JVM, §3c confs (24 GB local[32],
# shuffle.partitions configurable, maxPartitionBytes=8m), APPENDED with
# a label to the round's SLOPES record. Enforces the calm-capture
# discipline the r12 verdict flagged: refuses to launch until load1 is
# below the threshold (settle gap), and the emitted JSON carries
# load1_start/load1_end for the artifact-side check.
#
# Usage: tools/slope.sh <sfDir> <query> <label> [sp] [reps] [confs] [out]
#   tools/slope.sh scale/x1000m t23_span_scrub "x1000m t23 sp=256"
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR=${1:?usage: slope.sh <sfDir> <query> <label> [sp] [reps] [confs] [out]}
QUERY=${2:?query}
LABEL=${3:?label}
SP=${4:-256}
REPS=${5:-2}
EXTRA_CONF=${6:-}
OUT=${7:-SLOPES_r14.local.json}

MAXLOAD=${GRAFT_MAXLOAD:-3.0}
SETTLED=0
for _ in $(seq 1 120); do
  L=$(cut -d' ' -f1 /proc/loadavg)
  awk -v l="$L" -v m="$MAXLOAD" 'BEGIN{exit !(l<m)}' && { SETTLED=1; break; }
  echo "[slope] load1=$L >= $MAXLOAD — settling..." >&2
  sleep 10
done
# Exhausting the settle budget (~20 min) must NOT fall through to a
# contended capture — the "refuses to launch" claim is load-bearing.
if [ "$SETTLED" != "1" ]; then
  echo "[slope] settle budget exhausted (load1 still >= $MAXLOAD) — REFUSING to launch" >&2
  exit 3
fi

ADD_OPENS=(java.base/java.lang java.base/java.lang.invoke
  java.base/java.lang.reflect java.base/java.io java.base/java.net
  java.base/java.nio java.base/java.util java.base/java.util.concurrent
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch
  java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar)
JOPTS=()
for p in "${ADD_OPENS[@]}"; do JOPTS+=(--add-opens "$p=ALL-UNNAMED"); done

CONF="spark.sql.shuffle.partitions=$SP,spark.sql.files.maxPartitionBytes=8m"
[ -n "$EXTRA_CONF" ] && CONF="$CONF,$EXTRA_CONF"

echo "=== $(date -u +%FT%TZ) $LABEL ===" >> "$OUT"
# stderr goes to a per-cell file under captures/, NOT /dev/null: a failed
# cell's error text must survive the run (an r14 x10000m cell failed
# transiently and the discard left nothing to diagnose).
ERRLOG="captures/slope_$(date -u +%Y%m%dT%H%M%SZ)_$(echo "$QUERY" | tr -c 'A-Za-z0-9' _).stderr"
mkdir -p captures
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_QUERIES="$QUERY" SPARK_GRAFT_CONF="$CONF" \
SPARK_GRAFT_REPS="$REPS" \
java -Xmx24g -XX:+UseG1GC "${JOPTS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench 2>"$ERRLOG" | grep '"metric"' | tee -a "$OUT"
