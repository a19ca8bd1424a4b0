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
}
