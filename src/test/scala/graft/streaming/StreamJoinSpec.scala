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
    // Encoding-agnostic: batch-read schema + the shared normalization
    // expression (EncodingContractSpec pins the flavors).
    val rawSchema = Tables.raw(spark, dir, "events").schema
    spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", Tables.normalizeTsExpr("ts", rawSchema("ts").dataType))
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

  test("left-outer join emits null-padded rows only after the watermark closes the window") {
    val dir = sf("sf0.001")
    // Outer results are watermark-gated: an unmatched purchase can only
    // be emitted once the watermark proves no click can still arrive in
    // its window. A far-future sentinel event (filtered out of both join
    // sides) advances the watermark past every real window, so ALL outer
    // rows flush and the stream equals the batch left-outer join — the
    // semantics that make outer joins well-defined on unbounded streams.
    val tmp = Files.createTempDirectory("graft-ssj3-").toString
    val e = Tables(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    e.coalesce(1).write.mode("append").parquet(s"$tmp/in")
    // Sentinels must survive the per-side event_type filters —
    // withWatermark sits AFTER the filter, so a filtered-out row can
    // never advance the watermark. One purchase-typed and one
    // click-typed row (disjoint users, click later than purchase so
    // they can't join) push BOTH sides' watermarks past every real
    // window; negative ids keep them out of the assertion.
    def writeSentinel(days: Int): Unit =
      e.orderBy(desc("ts")).limit(1)
        .select(lit(-1L).as("event_id"),
          (col("ts") + expr(s"INTERVAL $days DAYS")).as("ts"),
          lit(-1L).as("user_id"), lit("purchase").as("event_type"))
        .unionAll(e.orderBy(desc("ts")).limit(1)
          .select(lit(-2L).as("event_id"),
            (col("ts") + expr(s"INTERVAL ${days + 1} DAYS")).as("ts"),
            lit(-2L).as("user_id"), lit("click").as("event_type")))
        .coalesce(1).write.mode("append").parquet(s"$tmp/in")
    writeSentinel(30)

    def side(tpe: String, u: String, t: String, id: String): DataFrame =
      spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(s"$tmp/in")
        .where(col("event_type") === tpe)
        .select(col("user_id").as(u), col("ts").as(t), col("event_id").as(id))
        .withWatermark(t, "1 hour")

    val joined = side("purchase", "p_user", "p_ts", "p_id")
      .join(side("click", "c_user", "c_ts", "c_id"),
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"),
        "left_outer")

    // File sink (not memory): it supports checkpoint recovery, which the
    // flush pass below needs.
    def runOnce(): Unit = {
      val q = joined.writeStream
        .outputMode("append")
        .format("parquet").option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    // The watermark advances at the END of the sentinel batch, and state
    // expiry only runs inside a data-bearing batch — so the last few
    // outer rows flush on the next restart that actually processes data.
    // A second, later sentinel gives the restart that batch (the
    // operational pattern for draining final outer results from a
    // stopped stream).
    writeSentinel(60)
    runOnce()

    val got = spark.read.parquet(s"$tmp/out")
      .where(col("p_id") >= 0)
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val batch = e.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .join(e.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id")),
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"),
        "left_outer")
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(batch.exists(_._2 == -1L), "fixture must contain unmatched purchases")
    assert(got == batch)
  }
}
