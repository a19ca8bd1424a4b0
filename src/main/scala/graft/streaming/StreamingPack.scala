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
    })
  )

  // Streaming replay must converge to exactly the batch fold: same oracle
  // as the batch projection.
  override def oracles: Map[String, String] = Map(
    "s1_stream_replay" -> (DerivedSignalLog.SQL_CTE +
      """SELECT id, seq, action, title, content, priority, author, created_at, updated_at
        |FROM signals ORDER BY id""".stripMargin)
  )

  private implicit class MapOps(m: Map[String, String]) {
    def asJava: java.util.Map[String, String] = {
      val jm = new java.util.HashMap[String, String]()
      m.foreach { case (k, v) => jm.put(k, v) }
      jm
    }
  }
}
