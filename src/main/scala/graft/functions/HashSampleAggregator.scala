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
    val i = buf.indexWhere(_._1 == p._1)
    if (i >= 0) { if (p._2 < buf(i)._2) buf.updated(i, p) else buf }
    else if (buf.size >= k && p._1 >= buf.last._1) buf
    else (buf :+ p).sortBy(_._1).take(k)
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
