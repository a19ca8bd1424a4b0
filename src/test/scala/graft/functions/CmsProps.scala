package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Partial-aggregation laws of the count-min grid (a44's sketch, s18's
  * streaming state): any split of the input into partial grids, merged in
  * any order, must equal the sequential fold — the algebra that makes the
  * sketch correct at any partitioning and any batch/stream delivery
  * split (KmvProps / HashSampleProps / TopKProps prove the same laws for
  * the other three bounded aggregates). Plus the CMS contract itself:
  * point estimates NEVER underestimate.
  */
class CmsProps extends AnyFunSuite {

  // narrow grid (3×8) forces heavy collisions — the laws must hold on
  // colliding inputs, not just sparse ones
  private val D = 3
  private val W = 8
  private implicit val enc: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.Encoders.kryo[Array[Long]]
  private def agg = new CountMinAggregator(D, W)

  private def genInput: Gen[List[Long]] = Gen.listOf(Gen.choose(0L, 40L))
  private def cases(n: Int): Seq[List[Long]] =
    Gen.listOfN(n, genInput)(Gen.Parameters.default, Seed(22L)).get

  private def fold(xs: List[Long]): Array[Long] =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("every split point: merge of partial grids equals the sequential fold") {
    cases(150).foreach { xs =>
      val whole = fold(xs)
      (0 to xs.length).foreach { k =>
        val merged = agg.merge(fold(xs.take(k)), fold(xs.drop(k)))
        assert(merged.sameElements(whole), s"split at $k of $xs")
      }
    }
  }

  test("merge is commutative and associative (delivery order never matters)") {
    cases(100).grouped(3).foreach {
      case Seq(a, b, c) =>
        val (ga, gb, gc) = (fold(a), fold(b), fold(c))
        assert(agg.merge(ga.clone, gb).sameElements(agg.merge(gb.clone, ga)))
        assert(agg.merge(agg.merge(ga.clone, gb), gc)
          .sameElements(agg.merge(ga.clone, agg.merge(gb.clone, gc))))
      case _ => // trailing partial group
    }
  }

  test("point estimates never underestimate the true count") {
    cases(150).foreach { xs =>
      val grid = fold(xs)
      xs.distinct.foreach { h =>
        val est = (0 until D)
          .map(j => grid(j * W + CountMinAggregator.position(h, j, W))).min
        val exact = xs.count(_ == h)
        assert(est >= exact, s"CMS underestimated $h: $est < $exact in $xs")
      }
    }
  }
}
