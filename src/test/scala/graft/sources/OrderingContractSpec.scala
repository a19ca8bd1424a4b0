package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.projection.SignalProjection

/** The multi-partition ordering contract (EventSource Scaladoc): the
  * compound `(partition << OffsetBits) | offset` seq makes per-key LWW
  * correct at any partition count PROVIDED each key's events live in one
  * partition (which the reference's key=id producer guarantees). These
  * specs replay a two-partition log whose offsets interleave adversely in
  * arrival order and assert the fold still picks each key's true latest.
  */
class OrderingContractSpec extends SparkSuite {
  import scala.jdk.CollectionConverters._

  private def event(id: String, rev: Int, action: String = "updated"): String =
    s"""{"action": "$action", "id": "$id", "title": "rev-$rev",
       | "content": "c", "priority": "Low", "author": "a",
       | "created_at": "2026-01-01T00:00:00Z",
       | "updated_at": "2026-01-01T00:00:00Z"}""".stripMargin.replace("\n", "")

  /** A raw frame as KafkaEventSource would emit it: compound seq + JSON. */
  private def rawDf(records: Seq[(Int, Long, String)]): DataFrame = {
    val rows = records.map { case (partition, offset, value) =>
      org.apache.spark.sql.Row(
        (partition.toLong << KafkaEventSource.OffsetBits) | offset, value)
    }
    spark.createDataFrame(rows.asJava,
      new org.apache.spark.sql.types.StructType()
        .add("seq", "long").add("value", "string"))
  }

  test("compoundSeq column matches the spec formula and orders per-partition") {
    import spark.implicits._
    val df = Seq((0, 5L), (1, 3L), (1, 4L), (0, 6L)).toDF("partition", "offset")
      .select(KafkaEventSource.compoundSeq(col("partition"), col("offset")).as("seq"),
        col("partition"), col("offset"))
      .collect()
    df.foreach { r =>
      assert(r.getLong(0) ==
        ((r.getInt(1).toLong << KafkaEventSource.OffsetBits) | r.getLong(2)))
    }
    // Within a partition, seq strictly follows offset.
    val p1 = df.filter(_.getInt(1) == 1).sortBy(_.getLong(2)).map(_.getLong(0))
    assert(p1.sameElements(p1.sorted))
  }

  test("two-partition interleaved replay: per-key LWW picks each key's last event") {
    // Keys a,b on partition 0; keys c,d on partition 1. Arrival order
    // interleaves partitions adversely (p1's early offsets arrive after
    // p0's late ones and vice versa); row order below is the arrival
    // order, which the fold must ignore entirely.
    val log = Seq(
      (1, 0L, event("c", 1, action = "created")),
      (0, 2L, event("a", 3)),
      (0, 0L, event("a", 1, action = "created")),
      (1, 2L, event("d", 2)),
      (0, 1L, event("a", 2)),
      (1, 1L, event("d", 1, action = "created")),
      (0, 3L, event("b", 1, action = "created")),
      (1, 3L, event("c", 2)),
      (0, 4L, event("b", 2)))
    val out = SignalProjection.project(SignalProjection.decode(rawDf(log)))
      .select("id", "title").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "rev-3", "b" -> "rev-2", "c" -> "rev-2", "d" -> "rev-2"))
  }

  test("delete tombstone wins within its partition regardless of arrival order") {
    val log = Seq(
      (1, 7L, """{"action": "deleted", "id": "x"}"""),
      (1, 5L, event("x", 1, action = "created")),
      (1, 6L, event("x", 2)),
      (0, 9L, event("y", 1, action = "created")))
    val out = SignalProjection.project(SignalProjection.decode(rawDf(log)))
      .select("id").collect().map(_.getString(0)).toSet
    assert(out == Set("y"))
  }

  test("high partition ids and offsets do not collide or overflow") {
    // partition 2^20, offset near 2^42 - 1: still distinct, still ordered.
    val p = 1 << 20
    val nearMax = (1L << KafkaEventSource.OffsetBits) - 2
    val log = Seq(
      (p, nearMax, event("z", 1, action = "created")),
      (p, nearMax + 1, event("z", 2)))
    val out = SignalProjection.project(SignalProjection.decode(rawDf(log)))
      .select("title").collect().map(_.getString(0)).toSeq
    assert(out == Seq("rev-2"))
  }
}
