package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Streaming exact dedup: at-least-once sources deliver duplicates; a
  * keyed dropDuplicates upstream of the fold removes them inside the
  * stream (state-backed). The LWW fold is already duplicate-proof — this
  * operator exists for pipelines that need dedup *without* a fold (e.g.
  * append-only training-data ingestion).
  */
class StreamingDedupSpec extends SparkSuite {

  test("dropDuplicates in a stream removes redelivered events") {
    val dir = Files.createTempDirectory("graft-dedup-").toString
    import spark.implicits._
    val events = (0L until 100L).map(i => (i, s"""{"n":$i}"""))
    // write the same batch twice — simulated redelivery
    (events ++ events).toDF("seq", "value")
      .repartition(2).write.json(s"$dir/in")

    val deduped = spark.readStream
      .schema(new org.apache.spark.sql.types.StructType()
        .add("seq", "long").add("value", "string"))
      .json(s"$dir/in")
      .dropDuplicates("seq")

    val q = deduped.writeStream
      .outputMode("append")
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation", s"$dir/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val out = spark.table("dedup_out")
    assert(out.count() == 100)
    assert(out.select("seq").distinct().count() == 100)
  }

  test("dedup state runs on the RocksDB state store (off-heap, spillable)") {
    // The default HDFS-backed store keeps state on the JVM heap — fine
    // for bounded keys, fatal when dedup state outgrows memory. RocksDB
    // keeps state off-heap with incremental checkpointing; at 100 TB
    // scale it is the only viable provider for unbounded-key dedup, so
    // the engine must run correctly (and checkpoint/restore) on it.
    val dir = Files.createTempDirectory("graft-rocks-").toString
    import spark.implicits._
    val events = (0L until 500L).map(i => (i, s"""{"n":$i}"""))
    (events ++ events).toDF("seq", "value")
      .repartition(4).write.json(s"$dir/in")

    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    ss.conf.set("spark.sql.shuffle.partitions", "4")

    val deduped = ss.readStream
      .schema(new org.apache.spark.sql.types.StructType()
        .add("seq", "long").add("value", "string"))
      .option("maxFilesPerTrigger", "2")
      .json(s"$dir/in")
      .dropDuplicates("seq")

    val q = deduped.writeStream
      .outputMode("append")
      .format("memory").queryName("rocks_out")
      .option("checkpointLocation", s"$dir/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.recentProgress.length >= 2, "must exercise cross-batch state")

    val out = ss.table("rocks_out")
    assert(out.count() == 500)
    assert(out.select("seq").distinct().count() == 500)
  }

  test("s21 streaming bloom gate equals batch d9 row for row") {
    val dir = sf("sf0.001")
    def rows(name: String) =
      graft.SparkEntry.queries(name)(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_bloom_hits")))
        .toSeq
    assert(rows("s21_stream_decontam") === rows("d9_bloom_decontaminate"),
      "the streamed gate must be batch-equivalent: same bitmap, same kernel")
  }
}
