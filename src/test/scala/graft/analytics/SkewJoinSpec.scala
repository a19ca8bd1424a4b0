package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the second half of the skew story: a19 proves SALTING (manual,
  * for aggregations); this proves AQE's runtime skew-join split (for
  * joins) actually engages — a hot key whose partition dwarfs the
  * advisory size must come out of AQE re-planning as a skew-split
  * SortMergeJoin, not a straggler task. Thresholds are scaled down so a
  * local test exhibits the same re-plan a 100 TB hot key triggers.
  */
class SkewJoinSpec extends SparkSuite {

  test("AQE splits the skewed join partition at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying ~200x the median partition, plus a uniform tail
      val left = spark.range(200000).select(lit(0L).as("k"), col("id").as("v"))
        .unionAll(spark.range(2000)
          .select((col("id") % 100 + 1).as("k"), col("id").as("v")))
      val right = spark.range(0, 101).select(col("id").as("k"), col("id").as("w"))
        .unionAll(spark.range(0, 101).select(col("id").as("k"), (col("id") + 1).as("w")))

      val joined = left.join(right, "k")
      // drive the join's OWN QueryExecution (count() would plan a fresh
      // aggregate query and leave this one un-finalized under AQE)
      val n = joined.queryExecution.toRdd.count()
      assert(n === 2 * (200000L + 2000L))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot partition as skew-split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
