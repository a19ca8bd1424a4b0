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
  * `nexus.signals`; cmd/server/main.go:55-73).
  *
  * ==Ordering contract (multi-partition)==
  * `seq` is the compound `(partition << OffsetBits) | offset`. Offsets
  * from different partitions interleave arbitrarily in wall-clock terms,
  * so `seq` is NOT a global total order — and none exists in Kafka. The
  * contract the LWW fold actually needs is weaker and IS guaranteed:
  * the reference producer keys every message by signal id
  * (signals.py:29-33), so all events of one key land in one partition in
  * publish order, where `offset` (and hence the compound `seq`) is
  * strictly increasing. Per-key max-by-seq therefore selects the true
  * latest event at any partition count; with the reference's
  * single-partition topic (docker-compose.yml:43) the compound reduces
  * to the plain offset. Events of DIFFERENT keys carry no relative
  * ordering — same as the reference. `OrderingContractSpec` replays a
  * two-partition interleaved log against the fold.
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
      .select(KafkaEventSource.compoundSeq(col("partition"), col("offset")).as("seq"),
        col("value").cast("string").as("value"))
}

object KafkaEventSource {
  /** Offsets keep the low bits: 2^42 offsets per partition (a century at
    * ~1k events/s/partition) and 2^21 partitions before overflow.
    */
  val OffsetBits = 42

  /** `(partition << OffsetBits) | offset` — strictly increasing in
    * `offset` within a partition, which is the only comparison the
    * per-key LWW fold performs (see class doc).
    */
  def compoundSeq(partition: org.apache.spark.sql.Column,
      offset: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    shiftleft(partition.cast("long"), OffsetBits) + offset
}
