package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Partial-aggregation laws for the bounded top-K heap (a21/e9): any
  * split of the input into partial buffers, merged in any order, must
  * equal the sequential fold — and both must equal the plain
  * sort-then-take definition. The aggregator's contract requires `tie`
  * to be a total tiebreaker (as in both production uses: o_orderkey,
  * vec_id), so generated ties are unique.
  */
class TopKProps extends AnyFunSuite {

  private case class E(ord: Long, tie: Long)

  private val K = 5
  private val enc = org.apache.spark.sql.Encoders.kryo[Seq[E]]
  private def topk = new TopKAggregator[E](K, _.ord, _.tie)(enc, enc)

  /** ord collides often (domain 0..9); tie made unique by index. */
  private def cases(n: Int): Seq[List[E]] =
    Gen.listOfN(n, Gen.listOf(Gen.choose(0L, 9L)))(
      Gen.Parameters.default, Seed(23L)).get
      .map(_.zipWithIndex.map { case (o, i) => E(o, i.toLong) })

  private def reference(xs: List[E]): Seq[E] =
    xs.sortBy(e => (-e.ord, e.tie)).take(K)

  test("sequential reduce + finish equals sort-then-take") {
    cases(300).foreach { xs =>
      val got = topk.finish(xs.foldLeft(topk.zero)(topk.reduce))
      assert(got === reference(xs), s"input $xs")
    }
  }

  test("any split + merge order equals the sequential fold (partial-agg law)") {
    val cuts = Gen.listOfN(200, Gen.choose(0, 100))(
      Gen.Parameters.default, Seed(24L)).get
    cases(200).zip(cuts).foreach { case (xs, cut) =>
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else cut % (xs.size + 1))
      val bl = l.foldLeft(topk.zero)(topk.reduce)
      val br = r.foldLeft(topk.zero)(topk.reduce)
      assert(topk.finish(topk.merge(bl, br)) === reference(xs))
      assert(topk.finish(topk.merge(br, bl)) === reference(xs),
        "merge must commute")
    }
  }
}
