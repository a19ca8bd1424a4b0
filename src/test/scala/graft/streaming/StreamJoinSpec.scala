package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Stream-stream windowed join: every purchase joined to the same user's
  * clicks in the preceding hour — both sides unbounded streams, state
  * bounded by watermarks. Inner-join results must equal the batch join
  * exactly (watermarks bound state retention, not inner-join
  * completeness, under AvailableNow).
  */
class StreamJoinSpec extends SparkSuite {

  private def eventStream(dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = org.apache.spark.sql.types.StructType(
      Tables(spark, dir, "events").schema.map {
        case f if f.name == "ts" =>
          f.copy(dataType = org.apache.spark.sql.types.LongType)
        case f => f
      })
    spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  test("stream-stream interval join equals the batch join") {
    val dir = sf("sf0.001")

    val clicks = eventStream(dir)
      .where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
      .withWatermark("c_ts", "2 hours")
    val purchases = eventStream(dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
      .withWatermark("p_ts", "2 hours")

    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))

    val chk = Files.createTempDirectory("graft-ssj-").toString
    val q = joined.writeStream
      .outputMode("append")
      .format("memory").queryName("ssj_out")
      .option("checkpointLocation", s"$chk/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("ssj_out")
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val e = Tables(spark, dir, "events")
    val bc = e.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id"))
    val bp = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    val batch = bp.join(bc,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(batch.nonEmpty)
    assert(got == batch)
  }

  test("join state carries matches across micro-batch boundaries") {
    val dir = sf("sf0.001")
    // Split the stream into two time-ordered files consumed one per
    // micro-batch: boundary-straddling (click, purchase) pairs only
    // match if the join BUFFERS the early side in state until the late
    // side arrives — the property a single-batch replay can't exercise.
    val tmp = Files.createTempDirectory("graft-ssj2-").toString
    val e = Tables(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val cut = e.selectExpr("percentile_approx(unix_micros(ts), 0.5, 10000)")
      .head().getLong(0)
    e.where(unix_micros(col("ts")) <= cut).coalesce(1)
      .write.mode("append").parquet(s"$tmp/in")
    e.where(unix_micros(col("ts")) > cut).coalesce(1)
      .write.mode("append").parquet(s"$tmp/in")

    def side(tpe: String, u: String, t: String, id: String): DataFrame =
      spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(s"$tmp/in")
        .where(col("event_type") === tpe)
        .select(col("user_id").as(u), col("ts").as(t), col("event_id").as(id))
        .withWatermark(t, "24 hours")

    val joined = side("purchase", "p_user", "p_ts", "p_id")
      .join(side("click", "c_user", "c_ts", "c_id"),
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))

    val q = joined.writeStream
      .outputMode("append")
      .format("memory").queryName("ssj2_out")
      .option("checkpointLocation", s"$tmp/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.recentProgress.length >= 2, "must run as >= 2 micro-batches")

    val got = spark.table("ssj2_out")
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .join(e.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id")),
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty)
    assert(got == batch)
  }
}
