#!/usr/bin/env bash
# Cluster-topology bench capture (SCALING.md §8): run graft.Bench against
# the tools/cluster.sh standalone cluster — multi-JVM executors, shuffle
# over loopback TCP — instead of local[N]. Requires `sbt package` and a
# running cluster.
#
# Usage: tools/clusterbench.sh <sfDir> [queries] [execMem] [spillOut] [confs]
#   tools/cluster.sh start 2 8 10g
#   tools/clusterbench.sh scale/x300m d14_substring_runs,t14_bm25_topk
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR=${1:?usage: clusterbench.sh <sfDir> [queries] [execMem] [spillOut] [confs]}
Q_DEFAULT=d3_lsh_pairs,d7_dedup_clusters,d9_bloom_decontaminate,d12_semdedup
Q_DEFAULT=$Q_DEFAULT,d14_substring_runs,pipeline3_semantic,pipeline4_decontam
Q_DEFAULT=$Q_DEFAULT,s13_state_compaction,t14_bm25_topk,g1_pagerank
Q=${2:-$Q_DEFAULT}
EXEC_MEM=${3:-8g}
SPILL_OUT=${4:-CLUSTER_SPILL.local.json}
CONF=${5:-spark.sql.shuffle.partitions=64,spark.sql.files.maxPartitionBytes=16m}

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

# GRAFT_TCP=1 forces every cross-executor shuffle read onto the wire:
# on one box Spark's host-local optimization (spark.shuffle.readHostLocalDisk,
# default true) reads the other executor's shuffle files straight off disk —
# great for co-located executors in production, but it would let this
# capture dodge the serialized-network-fetch path a multi-NODE cluster
# pays. Core conf, so it rides a -D (launch-time), not SPARK_GRAFT_CONF.
TCP_OPT=""
[ "${GRAFT_TCP:-0}" = "1" ] && TCP_OPT="-Dspark.shuffle.readHostLocalDisk=false"

SPARK_GRAFT_MASTER=spark://127.0.0.1:7077 \
SPARK_GRAFT_JARS="$JAR" \
SPARK_GRAFT_EXECUTOR_MEM="$EXEC_MEM" \
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS=16 SPARK_GRAFT_METRICS=1 \
SPARK_GRAFT_QUERIES="$Q" SPARK_GRAFT_CONF="$CONF" \
SPARK_GRAFT_SPILL_OUT="$SPILL_OUT" \
exec java -Xmx4g -XX:+UseG1GC "${JOPTS[@]}" $TCP_OPT \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.driver.host=127.0.0.1 \
  -Dspark.executor.extraJavaOptions="$EXEC_OPENS" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
