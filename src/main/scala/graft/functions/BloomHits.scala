package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Number of a document's gram hashes that pass a Bloom filter — the
  * probe kernel of the d9 Bloom decontamination path.
  *
  * The filter is a literal `ARRAY<LONG>` bitmap of m = 64·|bits| bits
  * (bit p lives at `bits[p >>> 6] & (1L << (p & 63))`); a gram hash h
  * probes k positions by Kirsch-Mitzenmacher double hashing —
  * pos_i = (h mod m + i·(1 + h mod (m−1))) mod m — and HITS iff all k
  * probed bits are set. Plain 64-bit integer arithmetic end to end, so
  * the DuckDB oracle replays positions and membership exactly and the
  * (false positives included) output is hash-checked like an exact
  * operator.
  *
  * Why an expression and not `forall(transform(...), array_contains(...))`:
  * HOF lambdas evaluate interpreted outside whole-stage codegen (the
  * t12/t13 contention tax, [[CountIn]]), and `array_contains` against a
  * 1024-long bitmap array would be a linear scan per probe — this is a
  * compiled O(|grams|·k) pass with O(1) bit tests.
  */
case class BloomHits(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (h, b, k) => TypeCheckResult.TypeCheckFailure(
        "bloom_hits expects (ARRAY<LONG>, literal ARRAY<LONG>, literal " +
          s"INT), got ${h.catalogString} / ${b.catalogString} / ${k.catalogString}")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(hashes: Any, bits: Any, k: Any): Any =
    BloomHits.count(hashes.asInstanceOf[ArrayData],
      bits.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (h, b, k) => s"graft.functions.BloomHits.count($h, $b, $k)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "bloom_hits"
}

object BloomHits {
  /** Count of hashes whose k double-hashed probe bits are all set.
    * The bitmap is indexed IN PLACE via `ArrayData.getLong` — O(1) on
    * the unsafe array the literal arrives as. (`toLongArray()` here was
    * a per-ROW copy of the whole bitmap: invisible at m=2^16, but 128 KB
    * per document at the m=2^20 an x30-scaled eval set needs — measured
    * 3× the whole query's cost in the SCALING.md capture.)
    */
  def count(hashes: ArrayData, bits: ArrayData, k: Int): Int = {
    val m = bits.numElements().toLong * 64L
    val n = hashes.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      // floorMod keeps the kernel total over the full Long domain: the
      // d9 path only feeds non-negative md5-prefix hashes (where
      // floorMod ≡ %, so the DuckDB oracle's plain % replays it
      // exactly), but a negative hash from a future caller must probe a
      // valid bit, not index out of the bitmap.
      val h1 = java.lang.Math.floorMod(h, m)
      val h2 = 1L + java.lang.Math.floorMod(h, m - 1L)
      var hit = true
      var j = 0
      while (j < k && hit) {
        val pos = (h1 + j * h2) % m
        hit = (bits.getLong((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) != 0L
        j += 1
      }
      if (hit) c += 1
      i += 1
    }
    c
  }

  /** Build the bitmap (m/64 longs) from set bit positions. */
  def bitmap(m: Int, positions: Iterable[Long]): Array[Long] = {
    require(m % 64 == 0 && m > 0, s"m=$m must be a positive multiple of 64")
    val words = new Array[Long](m / 64)
    positions.foreach { p =>
      require(p >= 0 && p < m, s"bit position $p outside [0, $m)")
      words(p.toInt >>> 6) |= 1L << (p & 63L).toInt
    }
    words
  }
}
