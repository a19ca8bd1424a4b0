package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Pins the co-located join plan: two tables bucketed on the join key
  * must SortMergeJoin with ZERO Exchange — the shuffle was paid once at
  * write time, not per query. This is the capability that keeps the
  * dominant fact-fact join off the wire at 100 TB.
  */
class BucketingSpec extends SparkSuite {

  test("bucketed fact-fact join plans with zero Exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables(spark, sf("sf0.001"), "lineitem").select("l_orderkey", "l_quantity"),
        "b_lineitem", "l_orderkey", 8)
      Bucketing.writeBucketed(
        Tables(spark, sf("sf0.001"), "orders").select("o_orderkey", "o_orderpriority"),
        "b_orders", "o_orderkey", 8)

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      // and the join result is the join result
      val n = joined.count()
      val expected = Tables(spark, sf("sf0.001"), "lineitem")
        .join(Tables(spark, sf("sf0.001"), "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(n === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
