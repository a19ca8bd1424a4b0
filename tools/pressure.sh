#!/usr/bin/env bash
# Memory-pressure scaling capture (SCALING.md §7): run the tail-family
# queries against a scaled fixture under a DELIBERATELY constrained heap,
# with task-metrics capture on, so spill/multi-wave shuffle actually
# happen and are RECORDED (SPILL.local.json) instead of argued.
#
# Usage: tools/pressure.sh <sfDir> <heap> [confs] [cpus] [queries]
#   tools/pressure.sh scale/x300m 4g
#   tools/pressure.sh scale/x100  4g spark.sql.files.maxPartitionBytes=4m
#   tools/pressure.sh scale/x1000m 4g '' 16          # 256 MB/core point
#   tools/pressure.sh scale/x1000m 4g '' 16 t14_bm25_topk
#
# Knobs under test (pass as confs): at a fixed heap the two levers a real
# deployment sizes per cluster are spark.sql.shuffle.partitions (reduce
# state per task) and spark.sql.files.maxPartitionBytes (map fan-in per
# task — decisive for explode-heavy operators like d14's ~90× window
# fan-out). Defaults here are the §7 capture settings.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR=${1:?usage: pressure.sh <sfDir> <heap> [confs] [cpus] [queries]}
HEAP=${2:?heap, e.g. 4g}
CONF=${3:-}
CONF=${CONF:-spark.sql.shuffle.partitions=256,spark.sql.files.maxPartitionBytes=8m}
CPUS=${4:-32}

ADD_OPENS=(java.base/java.lang java.base/java.lang.invoke
  java.base/java.lang.reflect java.base/java.io java.base/java.net
  java.base/java.nio java.base/java.util java.base/java.util.concurrent
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch
  java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar)
JOPTS=()
for p in "${ADD_OPENS[@]}"; do JOPTS+=(--add-opens "$p=ALL-UNNAMED"); done

Q=d3_lsh_pairs,d7_dedup_clusters,d9_bloom_decontaminate,d12_semdedup
Q=$Q,d14_substring_runs,pipeline3_semantic,pipeline4_decontam
Q=$Q,s13_state_compaction,t14_bm25_topk,g1_pagerank
Q=${5:-$Q}

SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_METRICS=1 \
SPARK_GRAFT_QUERIES="$Q" SPARK_GRAFT_CONF="$CONF" \
exec java "-Xmx$HEAP" -XX:+UseG1GC "${JOPTS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
