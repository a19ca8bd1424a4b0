package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.TestGroupState

import graft.SparkSuite
import graft.streaming.LiveProjection.{KeyedEvent, LiveRow}

/** The low-latency flatMapGroupsWithState projection must implement the
  * same LWW-by-seq fold as the batch/foreachBatch paths: state keeps the
  * highest seq ever seen (across batches and out-of-order delivery),
  * tombstones surface as deleted rows, and a multi-batch streamed run
  * converges to the batch fold.
  */
class LiveProjectionSpec extends SparkSuite {

  private def ev(seq: Long, id: String, action: String = "updated",
      title: String = "t"): KeyedEvent =
    KeyedEvent(seq, action, id, Some(title), None, Some("High"),
      Some("u"), None, None)

  test("foldKey keeps the max-seq event across batches and emits tombstones") {
    val state = TestGroupState.create[KeyedEvent](
      optionalState = org.apache.spark.api.java.Optional.empty[KeyedEvent](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[java.lang.Long]().asInstanceOf[org.apache.spark.api.java.Optional[Long]],
      hasTimedOut = false)

    // batch 1: out-of-order within the batch — max seq wins
    val out1 = LiveProjection.foldKey("a",
      Iterator(ev(2, "a", title = "new"), ev(1, "a", title = "old")), state).toSeq
    assert(out1.map(r => (r.seq, r.title)) === Seq(2L -> Some("new")))
    assert(state.get.seq === 2L)

    // batch 2: stale replay — state must not regress, emission re-asserts
    val out2 = LiveProjection.foldKey("a", Iterator(ev(1, "a")), state).toSeq
    assert(out2.map(_.seq) === Seq(2L))
    assert(state.get.seq === 2L)

    // batch 3: delete tombstone advances state and flags the row
    val out3 = LiveProjection.foldKey("a",
      Iterator(ev(3, "a", action = "deleted")), state).toSeq
    assert(out3.map(r => (r.seq, r.deleted)) === Seq(3L -> true))

    // no events for the key -> no emission, state untouched
    assert(LiveProjection.foldKey("a", Iterator.empty, state).isEmpty)
    assert(state.get.seq === 3L)
  }

  test("streamed multi-batch run converges to the batch LWW fold") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[KeyedEvent]
    val q = LiveProjection(spark, ms.toDF)
      .writeStream.outputMode("update")
      .format("memory").queryName("graft_live_out")
      .start()
    try {
      ms.addData(ev(1, "a"), ev(2, "a", title = "a2"), ev(5, "b"))
      q.processAllAvailable()
      ms.addData(ev(3, "a", title = "a3"), ev(4, "b", title = "stale"),
        ev(6, "c", action = "deleted"))
      q.processAllAvailable()

      // final state per key = the max-seq emission of the stream
      val finalRows = spark.table("graft_live_out")
        .groupBy(col("id"))
        .agg(max_by(struct(col("seq"), col("title"), col("deleted")), col("seq")).as("r"))
        .select(col("id"), col("r.seq"), col("r.title"), col("r.deleted"))
        .as[(String, Long, Option[String], Boolean)]
        .collect().map { case (k, sq2, t, d) => k -> ((sq2, t, d)) }.toMap

      assert(finalRows("a") === ((3L, Some("a3"), false)))
      assert(finalRows("b") === ((5L, Some("t"), false)))   // stale 4 lost to 5
      assert(finalRows("c") === ((6L, Some("t"), true)))    // tombstone visible
    } finally q.stop()
  }
}
