package graft.projection

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.domain.{PriorityCodec, TimeCodec}

/** Reference-parity semantics over the FIXTURES.md payloads — every
  * behavioral assertion from the reference's own suites
  * (domain/signal_test.go, projection/signal_test.go, handler tests).
  */
class ProjectionSpec extends SparkSuite {
  import scala.jdk.CollectionConverters._

  private def rawDf(events: (Long, String)*): DataFrame = {
    val rows = events.map { case (s, v) => org.apache.spark.sql.Row(s, v) }
    spark.createDataFrame(rows.asJava,
      new org.apache.spark.sql.types.StructType()
        .add("seq", "long").add("value", "string"))
  }

  private val created =
    """{"action": "created", "id": "abc-123", "title": "Server Alert",
      | "content": "CPU at 95%", "priority": "High", "author": "otavio",
      | "created_at": "2026-02-23T15:00:00-03:00",
      | "updated_at": "2026-02-23T15:00:00-03:00"}""".stripMargin.replace("\n", "")

  private val updated =
    """{"action": "updated", "id": "abc-123", "title": "Server Alert v2",
      | "content": "CPU at 99%", "priority": "Medium", "author": "otavio",
      | "created_at": "2026-02-23T15:00:00-03:00",
      | "updated_at": "2026-02-23T16:00:00-03:00"}""".stripMargin.replace("\n", "")

  private val deleted = """{"action": "deleted", "id": "abc-123"}"""

  // --- P1 decode (domain/signal_test.go:9-82) ---

  test("decode parses the canonical created event") {
    val out = SignalProjection.decode(rawDf(0L -> created)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("action") == "created")
    assert(r.getAs[String]("id") == "abc-123")
    assert(r.getAs[String]("priority") == "High")
    assert(r.getAs[String]("author") == "otavio")
  }

  test("decode keeps the minimal 2-field delete event, other fields null") {
    val r = SignalProjection.decode(rawDf(0L -> deleted)).collect().head
    assert(r.getAs[String]("action") == "deleted")
    assert(r.getAs[String]("title") == null)
    assert(r.getAs[String]("created_at") == null)
  }

  test("decode skips malformed and empty payloads without failing") {
    val out = SignalProjection.decode(rawDf(
      0L -> "{not valid json}", 1L -> "", 2L -> created)).collect()
    assert(out.map(_.getAs[String]("action")).toSeq == Seq("created"))
  }

  test("dead-letter split partitions every input row into good xor dead") {
    val raw = rawDf(0L -> "{not valid json}", 1L -> "", 2L -> created,
      3L -> """{"no_action_or_id": 1}""")
    val (good, dead) = SignalProjection.decodeWithDeadLetter(raw)
    assert(good.select("seq").collect().map(_.getLong(0)).toSet === Set(2L))
    val deadRows = dead.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(deadRows.keySet === Set(0L, 1L, 3L))
    // raw payload is preserved verbatim for replay-after-fix
    assert(deadRows(0L) === "{not valid json}")
    // the split loses nothing and duplicates nothing
    assert(good.count() + dead.count() === raw.count())
  }

  test("decode ignores unknown extra fields") {
    val withExtra = created.dropRight(1) + """, "totally_unknown": 42}"""
    val r = SignalProjection.decode(rawDf(0L -> withExtra)).collect().head
    assert(r.getAs[String]("title") == "Server Alert")
  }

  // --- P3/P5 LWW fold (projection/signal_test.go:38-151) ---

  test("LWW is by log order, not by updated_at") {
    // the 'updated' event carries a LATER timestamp but an EARLIER seq;
    // log order must win (SURVEY §7.4 hard part #1)
    val view = SignalProjection.fromRaw(rawDf(5L -> updated, 9L -> created))
    val r = view.collect().head
    assert(r.getAs[String]("title") == "Server Alert")
    assert(r.getAs[Long]("seq") == 9L)
  }

  test("re-applying the same event is idempotent") {
    val once = SignalProjection.fromRaw(rawDf(0L -> created)).collect()
    val twice = SignalProjection.fromRaw(rawDf(0L -> created, 0L -> created)).collect()
    assert(once.toSeq == twice.toSeq)
  }

  // --- P4 tombstones (projection/signal_test.go:116-130, 259-277) ---

  test("deleted ids disappear from the view") {
    val view = SignalProjection.fromRaw(rawDf(0L -> created, 1L -> deleted))
    assert(view.count() == 0)
  }

  test("delete for an unseen id is a silent no-op") {
    val view = SignalProjection.fromRaw(rawDf(
      0L -> deleted,
      1L -> created.replace("abc-123", "other-1")))
    val rows = view.collect()
    assert(rows.map(_.getAs[String]("id")).toSeq == Seq("other-1"))
  }

  test("create after delete resurrects the key (last writer wins)") {
    val view = SignalProjection.fromRaw(rawDf(
      0L -> created, 1L -> deleted, 2L -> created))
    assert(view.count() == 1)
  }

  // --- Q1/Q2/Q3 read API (projection/signal_test.go:153-257) ---

  private def seeded: DataFrame = SignalProjection.fromRaw(rawDf(
    0L -> created.replace("abc-123", "s1"),
    1L -> created.replace("abc-123", "s2")
      .replace("2026-02-23T15:00:00-03:00", "2026-02-22T10:00:00-03:00")
      .replace("\"High\"", "\"Low\"")))
    .withColumn("created_at", TimeCodec.parseRfc3339(col("created_at")))

  test("listByCreatedAt returns newest first") {
    val ids = new SignalStore(seeded).listByCreatedAt()
      .collect().map(_.getAs[String]("id")).toSeq
    assert(ids == Seq("s1", "s2"))
  }

  test("listByCreatedAt on a STRING view orders chronologically across mixed offsets, unparsable oldest") {
    // the live streaming view serves the all-string read model; r16
    // review finding: lexicographic RFC3339 order ranks +02:00 noon
    // above 11:00Z though it is an hour earlier, and the reference's
    // 0-fallback makes unparsable timestamps the OLDEST, not arbitrary
    val view = SignalProjection.fromRaw(rawDf(
      0L -> created.replace("abc-123", "utc11")
        .replace("2026-02-23T15:00:00-03:00", "2026-02-23T11:00:00Z"),
      1L -> created.replace("abc-123", "plus2noon")
        .replace("2026-02-23T15:00:00-03:00", "2026-02-23T12:00:00+02:00"),
      2L -> created.replace("abc-123", "garbled")
        .replace("2026-02-23T15:00:00-03:00", "not-a-timestamp")))
    assert(view.schema("created_at").dataType ==
      org.apache.spark.sql.types.StringType)
    val ids = new SignalStore(view).listByCreatedAt()
      .collect().map(_.getAs[String]("id")).toSeq
    // 12:00+02:00 = 10:00Z < 11:00Z; garbled = epoch 0 = oldest
    assert(ids == Seq("utc11", "plus2noon", "garbled"), ids.toString)
  }

  test("listByPriority returns only matching rows; no match is empty") {
    val store = new SignalStore(seeded)
    assert(store.listByPriority("Low").collect()
      .map(_.getAs[String]("id")).toSeq == Seq("s2"))
    assert(store.listByPriority("Critical").count() == 0)
  }

  test("findById: present and absent") {
    val store = new SignalStore(seeded)
    assert(store.findById("s1").isDefined)
    assert(store.findById("nope").isEmpty)
    assert(store.health)
  }

  test("health is false when the view is unservable") {
    // the failing expression must sit in a filter — a poisoned projected
    // column would just be pruned away by Catalyst under count()
    val broken = seeded.where(expr("raise_error('backing store down') IS NULL"))
    assert(!new SignalStore(broken).health)
  }

  // --- P6/P7 codecs ---

  test("priority codec: labels map to 1/2/3, unknown to 0") {
    import spark.implicits._
    val out = Seq("Low", "Medium", "High", "bogus").toDF("p")
      .select(PriorityCodec.score(col("p")).as("s")).as[Int].collect().toSeq
    assert(out == Seq(1, 2, 3, 0))
  }

  test("timestamp codec: RFC3339 offsets parse; invalid falls back to 0") {
    import spark.implicits._
    val out = Seq("2026-02-23T15:00:00-03:00", "not-a-time").toDF("t")
      .select(TimeCodec.unixSecondsOrZero(col("t")).as("e")).as[Long].collect().toSeq
    // 2026-02-23T18:00:00Z
    assert(out == Seq(1771869600L, 0L))
  }
}
