package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-min frequency sketch as a typed aggregate — a44's d×w counter
  * grid in mergeable form, which is what makes it streamable (s18) and
  * partition-safe: every task reduces its rows into one fixed d·w-long
  * grid before the shuffle (map-side combine), and merging grids is
  * cell-wise integer addition — associative and commutative, so the
  * result is identical at any partitioning, any delivery order, and any
  * batch/stream split. Point estimates (min over a key's d cells) are
  * overestimates by construction: collisions only ever add.
  *
  * State is the flattened row-major grid (cell (j, pos) at j·w + pos),
  * bounded at d·w longs per group forever — the CMS guarantee. Cell
  * positions use the same Kirsch-Mitzenmacher double hashing as a44's
  * Column arithmetic and d9's Bloom probes, so the streamed grid equals
  * the batch grid EXACTLY and replays in the DuckDB oracle.
  */
class CountMinAggregator(d: Int, w: Int)(implicit gridEnc: Encoder[Array[Long]])
  extends Aggregator[Long, Array[Long], Array[Long]] {

  require(d >= 1 && w >= 2, s"degenerate CMS geometry d=$d w=$w")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    var j = 0
    while (j < d) {
      b(j * w + CountMinAggregator.position(h, j, w)) += 1L
      j += 1
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = gridEnc
  override def outputEncoder: Encoder[Array[Long]] = gridEnc
}

object CountMinAggregator {
  /** a44/s18 grid geometry — see ExtrasPack's a44 scaladoc for sizing. */
  val Depth = 3
  val Width = 512

  /** Kirsch-Mitzenmacher double-hashed cell position for depth row j —
    * the SAME integer arithmetic as a44's Column formulation and the SQL
    * oracle (hashes are nonnegative md5 prefixes, so % is mod).
    */
  // floorMod, not %: identical for the nonnegative md5-prefix hashes the
  // oracle replays, but a negative hash from a future caller (xxhash64)
  // must land in a valid cell, not crash reduce with a negative index —
  // the same hardening BloomHits.count carries for the same reason.
  def position(h: Long, j: Int, w: Int): Int =
    ((Math.floorMod(h, w.toLong) +
      (1L + Math.floorMod(h, (w - 1).toLong)) * j) % w).toInt
}
