package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-K-by-hash uniform sample as a typed aggregate — the QUANTILE
  * sketch of the family (KMV counts distinct, this one samples payloads):
  * state is the K (hash, payload) pairs with the smallest DISTINCT
  * hashes per group. Hashing a unique row key makes the selection a
  * uniform random sample that is nonetheless a pure FUNCTION of the row
  * set — bounded, associative, commutative (map-side combine reduces
  * every partition to ≤K pairs before the shuffle), insensitive to
  * delivery order and redelivery, and exactly replayable by an oracle
  * (`row_number() OVER (ORDER BY hash) <= K`), which t-digest/GK sketches
  * are not. Quantiles of the sample estimate quantiles of the group with
  * the standard ~1/√K error; K is the accuracy↔state knob.
  *
  * Hash ties (a 60-bit collision, or redelivery of the same key) keep the
  * MINIMUM payload so merge stays commutative for every input, not just
  * collision-free ones — HashSampleProps proves the partial-agg laws.
  */
class HashSampleAggregator(k: Int)(
    implicit bufEnc: Encoder[Seq[(Long, Long)]], outEnc: Encoder[Seq[Long]])
  extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[Long]] {

  require(k >= 1)

  /** Buffer invariant: sorted by hash ascending, distinct hashes, ≤ k. */
  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(
      buf: Seq[(Long, Long)], p: (Long, Long)): Seq[(Long, Long)] = {
    // steady-state fast path: a full buffer rejects any hash STRICTLY
    // above its max in O(1) (it cannot be present — the buffer is the
    // bottom-k) before paying the O(k) membership scan
    if (buf.size >= k && p._1 > buf.last._1) buf
    else {
      val i = buf.indexWhere(_._1 == p._1)
      // (no second boundary test here: the fast path already rejected
      // p._1 > last, and a full buffer with i < 0 implies p._1 < last —
      // equality would have been found by the membership scan)
      if (i >= 0) { if (p._2 < buf(i)._2) buf.updated(i, p) else buf }
      else (buf :+ p).sortBy(_._1).take(k)
    }
  }

  override def merge(
      x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (x ++ y).groupBy(_._1).iterator
      .map { case (h, ps) => (h, ps.iterator.map(_._2).min) }
      .toSeq.sortBy(_._1).take(k)

  /** Sample payloads in hash (i.e. uniform) order. */
  override def finish(r: Seq[(Long, Long)]): Seq[Long] = r.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] = bufEnc
  override def outputEncoder: Encoder[Seq[Long]] = outEnc
}

object HashSampleAggregator {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** The quantile pick over a sample column of cent-quantized payloads:
    * sorted sample, nearest-rank index floor(q·(n−1))+1, /100 display.
    * ONE definition shared by the batch (a43) and streaming (s16) forms —
    * their equivalence contract is that they replay the same oracle, so
    * the pick rule must not be able to drift between them.
    */
  def centQuantile(sample: Column, q: Double): Column = {
    val xs = array_sort(sample)
    element_at(xs, (floor(lit(q) * (size(xs) - 1)) + 1).cast("int"))
      .cast("double") / 100
  }
}
