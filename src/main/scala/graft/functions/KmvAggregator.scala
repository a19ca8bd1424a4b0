package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values (KMV) distinct-count sketch as a typed aggregate.
  *
  * State is the K smallest DISTINCT hash values seen per group — bounded,
  * associative, commutative: partitions reduce to ≤K longs before the
  * shuffle (map-side combine), merges are a dedup-union-take-K, so the
  * shuffle carries K·groups values at any corpus size. The estimator is
  * the classic (K-1)/u_K where u_K is the K-th smallest hash normalized
  * to (0, 1]; with fewer than K distinct hashes the count is exact.
  *
  * Unlike HLL (a20, whose register layout is engine-specific and thus
  * rows-only-checkable), KMV is a deterministic function of the hash set:
  * the DuckDB oracle replays it exactly and the driver hash-checks it —
  * a sketch with cross-engine-verifiable output. Hashes are 60-bit md5
  * prefixes (the repo's cross-engine hash), normalized by 2^60.
  */
class KmvAggregator(k: Int)(implicit bufEnc: Encoder[Seq[Long]])
  extends Aggregator[Long, Seq[Long], Double] {

  require(k >= 2)

  /** Buffer invariant: sorted ascending, distinct, size ≤ k. */
  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.size >= k && h >= buf.last) buf
    else if (buf.contains(h)) buf
    else ((buf :+ h).sorted).take(k)

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    (x ++ y).distinct.sorted.take(k)

  override def finish(r: Seq[Long]): Double =
    if (r.size < k) r.size.toDouble
    else (k - 1).toDouble / (r.last.toDouble / KmvAggregator.Norm)

  override def bufferEncoder: Encoder[Seq[Long]] = bufEnc
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvAggregator {
  /** 2^60 — the hash domain bound of [[md5Prefix60]], exactly
    * representable as a double (power of two).
    */
  val Norm: Double = 1152921504606846976.0
}

/** The same bounded KMV state, finishing to the sketch itself (the sorted
  * K smallest distinct hashes) instead of a count — so sketches of
  * different groups can be COMBINED downstream: theta-style intersection /
  * union estimates are pure array expressions over two sketches
  * (a30_sketch_overlap). Same mergeability and K·groups shuffle bound.
  */
class KmvSketchAggregator(k: Int)(implicit bufEnc: Encoder[Seq[Long]])
  extends Aggregator[Long, Seq[Long], Seq[Long]] {
  private val kmv = new KmvAggregator(k)
  override def zero: Seq[Long] = kmv.zero
  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = kmv.reduce(buf, h)
  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = kmv.merge(x, y)
  override def finish(r: Seq[Long]): Seq[Long] = r
  override def bufferEncoder: Encoder[Seq[Long]] = bufEnc
  override def outputEncoder: Encoder[Seq[Long]] = bufEnc
}
