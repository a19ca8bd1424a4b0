package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.domain.TimeCodec
import graft.operators.DerivedSignalLog

/** End-to-end streaming replay, oracle-checked: the derived signal log is
  * serialized to JSON-lines event files (delete events naturally shrink to
  * `{"action","id"}` because to_json drops nulls — matching the
  * reference's 2-field delete payload), replayed through the incremental
  * foreachBatch projection in multiple micro-batches, and the final state
  * table must equal the one-shot batch fold — and therefore the same
  * DuckDB oracle as `p4_tombstone_delete`.
  */
object StreamingPack extends QueryPack {

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_stream_replay" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft-stream-").toFile.getAbsolutePath
      val log = DerivedSignalLog.log(s, dir)
      val eventCols = log.columns.filterNot(_ == "seq").map(col)
      log.select(col("seq"),
          to_json(struct(eventCols.toIndexedSeq: _*),
            Map("timestampFormat" -> TsFmt).asJava).as("value"))
        .repartition(2) // 2 files -> 2 micro-batches: exercises the
        .write.json(s"$tmp/events") // incremental merge without padding the bench

      // Per-workload tuning, the multi-tenant idiom: a child session
      // (shared SparkContext, independent SQLConf) runs the streaming
      // fold at micro-batch-sized shuffle width. A micro-batch carries
      // ~half the log; 32-wide stages are pure scheduling overhead for
      // it (AQE cannot coalesce in streaming). The batch analytics keep
      // the parent session's width.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val proj = new StreamingProjection(ss, s"$tmp/state")
      val q = proj.runFileStream(s"$tmp/events", s"$tmp/chk", maxFilesPerTrigger = 1)
      q.awaitTermination()

      proj.view
        .select(col("id"), col("seq"), col("action"), col("title"),
          col("content"), col("priority"), col("author"),
          TimeCodec.parseRfc3339(col("created_at")).as("created_at"),
          TimeCodec.parseRfc3339(col("updated_at")).as("updated_at"))
        .orderBy("id")
    }),

    // s2: the event-time window aggregation a12 declares, executed through
    // TRUE Structured Streaming — readStream over the events parquet,
    // streaming groupBy(window(...)), complete-mode memory sink. Complete
    // mode emits the full aggregation state, so the result is
    // deterministic and shares a12's exact batch oracle — the strongest
    // form of the batch/streaming unification claim. (Production uses
    // watermark + append for bounded state — WindowedStreamSpec covers
    // that contract, including what the watermark holds back.)
    "s2_stream_window" -> ((s, dir) => {
      val ss = tunedChild(s)
      val chk = Files.createTempDirectory("graft-s2-").toFile.getAbsolutePath
      val q = eventsStream(ss, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
            .cast("double").as("total"))
        .writeStream
        .outputMode("complete")
        .format("memory").queryName("graft_s2_win")
        .option("checkpointLocation", s"$chk/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table("graft_s2_win")
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("total"))
        .orderBy("window_start", "event_type")
    }),

    // s3: stream-stream inner join — click→purchase attribution within a
    // 30-minute window, both sides TRUE streaming frames. Watermarks on
    // both sides plus the time-range predicate are what BOUND the join
    // state: Spark retains only rows inside the watermark horizon, so
    // state is O(events per 90 min of event time), not O(stream) — the
    // property that makes an unbounded stream-stream join runnable at
    // all. Inner-join matches emit as they are found (append mode), so
    // one AvailableNow replay yields exactly the batch join — one truth,
    // checked against the batch oracle.
    "s3_stream_join" -> ((s, dir) => {
      val ss = tunedChild(s)
      val chk = Files.createTempDirectory("graft-s3-").toFile.getAbsolutePath
      val clicks = eventsStream(ss, dir)
        .where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
        .withWatermark("click_ts", "1 hour")
      val purchases = eventsStream(ss, dir)
        .where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
      val q = clicks.join(purchases,
          col("user_id") === col("p_user") &&
            col("purchase_ts") >= col("click_ts") &&
            col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        .select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")
        .writeStream
        .outputMode("append")
        .format("memory").queryName("graft_s3_join")
        .option("checkpointLocation", s"$chk/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table("graft_s3_join").orderBy("click_id", "purchase_id")
    })
  )

  /** Child session tuned for micro-batch-sized shuffles (see s1 note). */
  private def tunedChild(s: SparkSession): SparkSession = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ss
  }

  /** The events table as a streaming frame: nanos read as longs (the
    * streaming reader has the same TIMESTAMP(NANOS) limitation as batch),
    * truncated to micros exactly like graft.Tables.
    */
  private def eventsStream(ss: SparkSession, dir: String): DataFrame = {
    val rawSchema = org.apache.spark.sql.types.StructType(
      graft.Tables(ss, dir, "events").schema.map {
        case f if f.name == "ts" =>
          f.copy(dataType = org.apache.spark.sql.types.LongType)
        case f => f
      })
    ss.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  // Streaming replay must converge to exactly the batch fold: same oracle
  // as the batch projection.
  override def oracles: Map[String, String] = Map(
    "s1_stream_replay" -> (DerivedSignalLog.SQL_CTE +
      """SELECT id, seq, action, title, content, priority, author, created_at, updated_at
        |FROM signals ORDER BY id""".stripMargin),

    // Identical to a12's oracle: streaming and batch declare the same
    // aggregation, so they share one truth.
    "s2_stream_window" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // The batch formulation of the same join — micros-truncated
    // timestamps BEFORE the range comparison, matching the Spark side.
    "s3_stream_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
        |  a.ts AS click_ts, b.ts AS purchase_ts
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
        | AND a.event_type = 'click' AND b.event_type = 'purchase'
        |ORDER BY click_id, purchase_id""".stripMargin
  )

  private implicit class MapOps(m: Map[String, String]) {
    def asJava: java.util.Map[String, String] = {
      val jm = new java.util.HashMap[String, String]()
      m.foreach { case (k, v) => jm.put(k, v) }
      jm
    }
  }
}
