package graft.projection

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** Property tests (SURVEY §5 rebuild plan): for random event logs
  * (ScalaCheck generators, fixed seeds for reproducibility),
  *   1. the projected state per key equals the last event by log order
  *      (computed by an independent in-memory fold);
  *   2. applying the log twice ≡ applying it once (idempotency);
  *   3. shuffling the log's row order does not change the result
  *      (the fold keys on seq, not on physical order).
  */
class ProjectionProps extends SparkSuite {

  private case class Ev(seq: Long, id: String, action: String, title: String)

  private val genEv: Gen[Ev] = for {
    id <- Gen.oneOf("a", "b", "c", "d")
    action <- Gen.oneOf("created", "updated", "deleted")
    title <- Gen.alphaStr.map(_.take(8))
  } yield Ev(0L, id, action, title)

  private val genLog: Gen[List[Ev]] = for {
    evs <- Gen.listOfN(30, genEv)
  } yield evs.zipWithIndex.map { case (e, i) => e.copy(seq = i.toLong) }

  private def toRaw(evs: Seq[Ev]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      evs.map { e =>
        val json =
          s"""{"action":"${e.action}","id":"${e.id}","title":"${e.title}"}"""
        org.apache.spark.sql.Row(e.seq, json)
      }.asJava,
      new org.apache.spark.sql.types.StructType()
        .add("seq", "long").add("value", "string"))
  }

  /** Independent reference fold: last event per key, drop deleted. */
  private def referenceFold(evs: Seq[Ev]): Map[String, (Long, String)] =
    evs.groupBy(_.id)
      .view.mapValues(_.maxBy(_.seq))
      .collect { case (id, e) if e.action != "deleted" => id -> (e.seq, e.title) }
      .toMap

  private def sparkFold(evs: Seq[Ev]): Map[String, (Long, String)] =
    SignalProjection.fromRaw(toRaw(evs)).collect()
      .map(r => r.getAs[String]("id") ->
        (r.getAs[Long]("seq"), r.getAs[String]("title")))
      .toMap

  private def sample(seed: Long): List[Ev] =
    genLog(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator exhausted for seed $seed"))

  test("projection equals the in-memory last-writer fold for random logs") {
    (1L to 8L).foreach { seed =>
      val log = sample(seed)
      assert(sparkFold(log) == referenceFold(log), s"seed=$seed log=$log")
    }
  }

  test("double application is idempotent for random logs") {
    (11L to 14L).foreach { seed =>
      val log = sample(seed)
      assert(sparkFold(log ++ log) == sparkFold(log), s"seed=$seed")
    }
  }

  test("row order does not matter, only seq") {
    (21L to 24L).foreach { seed =>
      val log = sample(seed)
      assert(sparkFold(log.reverse) == sparkFold(log), s"seed=$seed")
    }
  }
}
