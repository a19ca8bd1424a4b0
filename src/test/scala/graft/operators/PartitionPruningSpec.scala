package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Pins directory-level partition pruning: a table written
  * partitionBy(col) must plan equality filters on that column as
  * PartitionFilters (directories never opened), not data filters — at
  * 100 TB this is the difference between scanning one day and scanning
  * the lake. Complements BucketingSpec (co-located joins) and the
  * PlanSpec PushedFilters pin (row-group pruning).
  */
class PartitionPruningSpec extends SparkSuite {

  test("equality filter on a partition column prunes at the directory level") {
    val tmp = Files.createTempDirectory("graft-part-").toFile.getAbsolutePath
    Tables(spark, sf("sf0.001"), "events")
      .write.partitionBy("event_type").parquet(s"$tmp/events_by_type")

    val q = spark.read.parquet(s"$tmp/events_by_type")
      .where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"))
    val plan = q.queryExecution.executedPlan.toString

    assert(plan.contains("PartitionFilters: ["), plan)
    assert("PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(plan).isDefined,
      s"event_type filter must prune partitions:\n$plan")
    // and the pruned read returns exactly the filtered rows
    val expected = Tables(spark, sf("sf0.001"), "events")
      .where(col("event_type") === "click").count()
    assert(q.count() === expected)
  }
}
