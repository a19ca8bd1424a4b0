package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Partial-aggregation laws of the bottom-K-by-hash sampler (a43) — the
  * same algebra KmvProps proves for the distinct sketch: any split of the
  * input into partial buffers, merged in any order, must equal the
  * sequential fold, INCLUDING on hash ties (collisions / redelivery),
  * which resolve to the minimum payload so merge commutes on every
  * input — not just collision-free ones.
  */
class HashSampleProps extends AnyFunSuite {

  private val K = 6
  private implicit val bufEnc: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.Encoders.kryo[Seq[(Long, Long)]]
  private implicit val outEnc: org.apache.spark.sql.Encoder[Seq[Long]] =
    org.apache.spark.sql.Encoders.kryo[Seq[Long]]
  private def agg = new HashSampleAggregator(K)

  // tiny hash domain forces collisions; payloads vary per hash
  private def genInput: Gen[List[(Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 99L)))

  private def cases(n: Int): Seq[List[(Long, Long)]] =
    Gen.listOfN(n, genInput)(Gen.Parameters.default, Seed(21L)).get

  /** Reference: K smallest distinct hashes, min payload per hash. */
  private def reference(xs: List[(Long, Long)]): Seq[(Long, Long)] =
    xs.groupBy(_._1).map { case (h, ps) => (h, ps.map(_._2).min) }
      .toSeq.sortBy(_._1).take(K)

  test("sequential reduce equals the K-smallest-distinct-hash definition") {
    cases(300).foreach { xs =>
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      assert(buf === reference(xs), s"input $xs")
    }
  }

  test("any split + merge order equals the sequential fold (partial-agg law)") {
    val splitGen = Gen.choose(0, 100)
    cases(200).zip(Gen.listOfN(200, splitGen)(
      Gen.Parameters.default, Seed(22L)).get).foreach { case (xs, cut) =>
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else cut % (xs.size + 1))
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(bl, br) === reference(xs))
      assert(agg.merge(br, bl) === reference(xs), "merge must commute")
    }
  }

  test("finish preserves hash order; redelivery is a no-op") {
    cases(100).foreach { xs =>
      val once = xs.foldLeft(agg.zero)(agg.reduce)
      val twice = (xs ++ xs).foldLeft(agg.zero)(agg.reduce)
      assert(once === twice, "re-applying the same rows must not change the sample")
      assert(agg.finish(once) === once.map(_._2))
    }
  }
}
