package graft.analytics

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Laws behind a34's scale-safe deciles. The sf fixtures only exercise one
  * (n, k) shape per language; these cover the input space:
  *
  *  1. the closed-form bucket a34 derives from a global rank must equal
  *     SQL-standard NTILE (first n mod k buckets one row larger) for
  *     every rank, exhaustively over n and k — including n < k, where
  *     the else-branch divisor q is 0 and must never be reached;
  *  2. banded two-level ranking (per-band position + running offsets of
  *     band counts) must reproduce the rank in the globally sorted
  *     order for any multiset — the property that lets a34 avoid a
  *     language-sized window task.
  */
class NtileProps extends AnyFunSuite {

  /** The closed form used in a34_quality_deciles (1-based rank). */
  private def closedForm(rank: Long, n: Long, k: Long): Long = {
    val q = n / k
    val r = n % k
    if (rank <= r * (q + 1)) (rank - 1) / (q + 1) + 1
    else r + (rank - 1 - r * (q + 1)) / q + 1
  }

  /** Constructive SQL-standard NTILE: deal bucket sizes, first n mod k
    * buckets get one extra row, then read off each rank's bucket.
    */
  private def constructive(n: Int, k: Int): Seq[Int] = {
    val q = n / k
    val r = n % k
    (1 to k).flatMap(b => Seq.fill(if (b <= r) q + 1 else q)(b))
  }

  test("closed form equals constructive NTILE for all ranks, n <= 240, k in 1..12") {
    for (k <- 1 to 12; n <- 1 to 240) {
      val expected = constructive(n, k)
      assert(expected.length === n)
      for (rank <- 1 to n)
        assert(closedForm(rank, n, k) === expected(rank - 1),
          s"n=$n k=$k rank=$rank")
    }
  }

  test("n < k never divides by zero: every rank lands in the big-bucket branch") {
    for (n <- 1 to 9; rank <- 1 to n)
      assert(closedForm(rank, n, 10) === rank, s"n=$n rank=$rank")
  }

  private def cases(n: Int): Seq[List[(Int, Int)]] =
    Gen.listOfN(n,
      Gen.listOf(Gen.zip(Gen.choose(0, 600), Gen.choose(0, 10000))))(
      Gen.Parameters.default, Seed(34L)).get

  test("banded two-level rank equals the global sorted-order rank (any multiset)") {
    // Mirror of the query: band = value DIV 16, order (value DESC, id),
    // global rank = running offset of higher bands + within-band position.
    cases(200).foreach { rows =>
      val distinctRows = rows.distinct // (value, id) is a total order key
      val ord = Ordering.by[(Int, Int), (Int, Int)] { case (v, id) => (-v, id) }
      val globalRank = distinctRows.sorted(ord).zipWithIndex
        .map { case (row, i) => row -> (i + 1L) }.toMap
      val byBand = distinctRows.groupBy { case (v, _) => v / 16 }
      val offsets = byBand.view.mapValues(_.size).toSeq.sortBy(-_._1)
        .scanLeft((Int.MaxValue, 0L)) { case ((_, acc), (b, c)) => (b, acc + c) }
      val offBefore = offsets.sliding(2).collect {
        case Seq((_, cum), (b, _)) => b -> cum
      }.toMap // cumulative count of strictly-higher bands
      byBand.foreach { case (band, members) =>
        members.sorted(ord).zipWithIndex.foreach { case (row, i) =>
          val banded = offBefore.getOrElse(band, 0L) + i + 1
          assert(banded === globalRank(row), s"row=$row band=$band")
        }
      }
    }
  }
}
