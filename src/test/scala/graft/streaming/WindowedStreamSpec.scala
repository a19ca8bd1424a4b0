package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** The event-time window operators (a12/a13) running in TRUE streaming
  * mode — readStream over the events parquet with a watermark — must
  * produce the same groups as the batch formulation. This is the claim
  * behind registering streaming-native ops as batch-oracle queries.
  */
class WindowedStreamSpec extends SparkSuite {

  test("streaming tumbling-window agg equals the batch result") {
    val dir = sf("sf0.001")
    // Encoding-agnostic: take the schema a batch read actually produces
    // and normalize with the same shared expression as graft.Tables
    // (EncodingContractSpec pins the flavors).
    val rawSchema = Tables.raw(spark, dir, "events").schema

    val streamed = spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet") // file source wants a dir
      .parquet(dir)
      .withColumn("ts", Tables.normalizeTsExpr("ts", rawSchema("ts").dataType))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    val qname = "win_out"
    val chk = Files.createTempDirectory("graft-win-").toString
    val q = streamed.writeStream
      .outputMode("append")
      .format("memory").queryName(qname)
      .option("checkpointLocation", s"$chk/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // append mode emits only windows the watermark has closed; with
    // AvailableNow the final watermark closes all but the last window(s).
    val got = spark.table(qname)
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val batch = Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(got.nonEmpty)
    assert(got.subsetOf(batch))
    // append mode holds back windows not yet closed by the watermark
    // (final watermark = max event time - 1h ⇒ up to the last 2 hourly
    // windows may be open); everything older must match exactly.
    val lastHour = batch.map(_._1).max
    val cutoff = new java.sql.Timestamp(lastHour.getTime - 2 * 3600 * 1000)
    assert(batch.filter(_._1.before(cutoff)) == got.filter(_._1.before(cutoff)))
  }
}
