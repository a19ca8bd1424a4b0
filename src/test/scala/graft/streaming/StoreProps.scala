package graft.streaming

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite
import graft.projection.SignalProjection

/** The core streaming invariant as a property: for a random event log cut
  * into ARBITRARY micro-batches, sequentially merging each batch into the
  * bucketed state store yields exactly the one-shot batch fold — i.e.
  * batch boundaries are unobservable.
  */
class StoreProps extends SparkSuite {

  private case class Ev(seq: Long, id: String, action: String)

  private val genLog: Gen[List[Ev]] = for {
    evs <- Gen.listOfN(24, for {
      id <- Gen.oneOf("a", "b", "c", "d", "e")
      action <- Gen.oneOf("created", "updated", "deleted")
    } yield Ev(0L, id, action))
  } yield evs.zipWithIndex.map { case (e, i) => e.copy(seq = i.toLong) }

  private val genCuts: Gen[List[Int]] =
    Gen.listOfN(3, Gen.choose(0, 24)).map(_.distinct.sorted)

  private def raw(evs: Seq[Ev]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      evs.map { e =>
        org.apache.spark.sql.Row(e.seq,
          s"""{"action":"${e.action}","id":"${e.id}"}""")
      }.asJava,
      new org.apache.spark.sql.types.StructType()
        .add("seq", "long").add("value", "string"))
  }

  test("arbitrary micro-batch cuts converge to the batch fold") {
    (1L to 5L).foreach { seed =>
      val log = genLog(Gen.Parameters.default, Seed(seed)).get
      val cuts = genCuts(Gen.Parameters.default, Seed(seed * 31)).get
      val bounds = (0 +: cuts :+ log.length).distinct.sorted
      val batches = bounds.zip(bounds.tail).map { case (a, b) => log.slice(a, b) }
        .filter(_.nonEmpty)

      val dir = Files.createTempDirectory("graft-prop-").toString
      val store = new BucketedStateStore(spark, dir, numBuckets = 4)
      batches.zipWithIndex.foreach { case (b, i) =>
        store.merge(
          SignalProjection.latestByKey(SignalProjection.decode(raw(b))), i.toLong)
      }
      val streamed = store.read().get
        .where(org.apache.spark.sql.functions.col("action") =!= "deleted")
        .collect().map(r => (r.getAs[String]("id"), r.getAs[Long]("seq"))).toSet
      val batch = SignalProjection.fromRaw(raw(log))
        .collect().map(r => (r.getAs[String]("id"), r.getAs[Long]("seq"))).toSet
      assert(streamed == batch, s"seed=$seed cuts=$bounds")
    }
  }

  test("readAt composes with retention and compaction: aged snapshots fail loudly, newer ones serve") {
    // Three merges age generation 0 out of retention (top-2 kept per
    // bucket), then compact() rewrites all state at the derived successor
    // gen — after which every pre-retention snapshot must THROW the
    // unservable-snapshot error (a silent skip would return a cross-epoch
    // mix), while still-retained and post-compaction reads serve.
    import org.apache.spark.sql.functions.col
    val b0 = Seq(Ev(0, "a", "created"), Ev(1, "b", "created"),
      Ev(2, "c", "created"), Ev(3, "d", "created"), Ev(4, "e", "created"))
    val b1 = Seq(Ev(5, "a", "updated"), Ev(6, "b", "updated"),
      Ev(7, "c", "updated"), Ev(8, "d", "updated"), Ev(9, "e", "deleted"))
    val b2 = Seq(Ev(10, "a", "updated"), Ev(11, "b", "updated"),
      Ev(12, "c", "updated"), Ev(13, "d", "updated"))

    val dir = Files.createTempDirectory("graft-prop-").toString
    val store = new BucketedStateStore(spark, dir, numBuckets = 4)
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      store.merge(
        SignalProjection.latestByKey(SignalProjection.decode(raw(b))), i.toLong)
    }
    // gen 0 aged out of some bucket (a-d all touched thrice; ≤4 buckets
    // means at least one holds such a key) — snapshot 0 is unservable
    val e0 = intercept[IllegalStateException](store.readAt(0L))
    assert(e0.getMessage.contains("no longer servable"), e0.getMessage)

    // compact below a horizon that covers e's tombstone (seq 9)
    val cg = store.compact(horizonSeq = 100L)
    assert(cg == 3L)

    // gen 2 is still within retention: serves the PRE-compaction state —
    // e's tombstone included (delete-visibility of the snapshot)
    val at2 = store.readAt(2L).get
    assert(at2.where(col("action") === "deleted").collect()
      .map(_.getAs[String]("id")).toSeq == Seq("e"))

    // gens 0 and 1 are gone (compaction's rewrite pushed 1 out of the
    // top-2 for the thrice-touched buckets): both fail loudly
    intercept[IllegalStateException](store.readAt(1L))
    intercept[IllegalStateException](store.readAt(0L))

    // the compacted snapshot and the open-ended read both serve, without
    // the dropped tombstone
    Seq(store.readAt(cg).get, store.readAt(Long.MaxValue).get, store.read().get)
      .foreach { df =>
        assert(df.collect().map(_.getAs[String]("id")).sorted.toSeq
          == Seq("a", "b", "c", "d"))
      }
  }
}
