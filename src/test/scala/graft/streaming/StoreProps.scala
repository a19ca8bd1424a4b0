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
}
