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

  test("IVF inverted-list layout: probe filters on a cid-partitioned corpus prune at the directory level") {
    // e5/e14/e17's scale claim made concrete: cluster the corpus BY the
    // coarse-quantizer assignment (partitionBy(cid) = the FAISS
    // inverted-list layout as a lake layout), and a probe query's
    // cid IN (...) filter becomes a PartitionFilter — at 100 TB the
    // scan reads nprobe/k of the corpus from disk, not all of it.
    val tmp = Files.createTempDirectory("graft-ivfpart-").toFile.getAbsolutePath
    val emb = Tables(spark, sf("sf0.001"), "embeddings")
    IvfIndex.assign(emb, IvfIndex.Pretrained)
      .write.partitionBy("cid").parquet(s"$tmp/emb_by_cid")

    val probes = Seq(1, 4, 7)
    val q = spark.read.parquet(s"$tmp/emb_by_cid")
      .where(col("cid").isin(probes: _*))
      .select(col("vec_id"))
    val plan = q.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(plan).isDefined,
      s"cid probe filter must prune partitions:\n$plan")
    val expected = IvfIndex.assign(emb, IvfIndex.Pretrained)
      .where(col("cid").isin(probes: _*)).count()
    assert(q.count() === expected)
  }
}
