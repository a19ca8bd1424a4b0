package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Source abstraction for the projection pipeline (SURVEY §2.1 S3,
  * §7.4 "offline Kafka connector uncertainty"): every source yields the
  * same raw frame `(seq LONG, value STRING)` — seq is the total-order log
  * position (Kafka offset / file-embedded sequence), value the JSON event.
  * Everything downstream ([[graft.streaming.StreamingProjection]]) is
  * source-agnostic.
  */
trait EventSource {
  def stream(spark: SparkSession): DataFrame
}

/** JSON-lines directory source — the offline CI path. Files carry an
  * explicit `seq` column; ordering across files is irrelevant because the
  * LWW fold keys on seq.
  */
final case class FileEventSource(
    dir: String,
    maxFilesPerTrigger: Int = 1) extends EventSource {

  val schema: StructType =
    new StructType().add("seq", LongType).add("value", StringType)

  override def stream(spark: SparkSession): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)
}

/** Kafka source — the production path, mirroring the reference consumer
  * (group `nexus-data-plane`, earliest offsets, single topic
  * `nexus.signals`; cmd/server/main.go:55-73). The partition-local Kafka
  * offset is the `seq`: with the reference's single-partition topic this
  * is the same total order; with multiple partitions it preserves the
  * per-key order Kafka guarantees for key=id producers (signals.py:29-33).
  *
  * NOTE: requires the spark-sql-kafka connector on the classpath (not
  * present in this offline container — constructing the reader without it
  * fails at `load()` with DATA_SOURCE_NOT_FOUND, which is why the file
  * source is the CI path).
  */
final case class KafkaEventSource(
    bootstrapServers: String,
    topic: String = "nexus.signals",
    startingOffsets: String = "earliest") extends EventSource {

  override def stream(spark: SparkSession): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("offset").as("seq"),
        col("value").cast("string").as("value"))
}
