package graft.analytics

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Runtime bloom-filter join pruning: when one join side is selectively
  * filtered, Spark can build a bloom filter over its join keys at runtime
  * and push a `might_contain` probe into the other side's scan — at
  * 100 TB this skips row groups of the big side before the shuffle, the
  * same class of win as partition pruning but keyed on data, not layout.
  * The thresholds are size-gated (creation side small, application side
  * huge), so local fixtures need them widened to exercise the rewrite;
  * the pin is that the rewrite still exists and fires.
  */
class RuntimeFilterSpec extends SparkSuite {

  test("selective fact-fact join injects a bloom might_contain probe") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = sf("sf0.001")
      val sel = Tables(spark, dir, "orders")
        .where(col("o_totalprice") > 350000)
        .select(col("o_orderkey"))
      val big = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val joined = big.join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"runtime bloom filter did not fire:\n$opt")
      // and the rewrite must not change results
      val expected = big.join(broadcast(sel),
        col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      assert(joined.exceptAll(expected).isEmpty &&
        expected.exceptAll(joined).isEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
