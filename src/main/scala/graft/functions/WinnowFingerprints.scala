package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer et al., SIGMOD'03) as a
  * native Catalyst expression: for one document, hash every
  * [[WinnowFingerprints.GramLen]]-char gram with a Karp–Rabin rolling
  * hash (base [[WinnowFingerprints.Base]] mod [[WinnowFingerprints.Mod]]),
  * take the minimum over every [[WinnowFingerprints.WindowLen]]-gram
  * window (partial tail windows included), and return the sorted distinct
  * minima as `ARRAY<BIGINT>`.
  *
  * Why an expression and not HOFs: Spark's higher-order functions
  * (`transform`/`aggregate`) evaluate their lambda INTERPRETED, outside
  * whole-stage codegen — measured ~21 µs per gram for the 8×(substr+ascii)
  * lambda, 31 s for 1.4 M grams at sf0.1. This single compiled pass is
  * O(chars) per document with zero per-gram allocation, runs inside the
  * scan's codegen stage, and needs no shuffle at all: the winnow is
  * per-document, so the operator is embarrassingly parallel at any scale.
  *
  * The rolling recurrence produces exactly the polynomial
  * `sum_j cp(text[i+j]) * Base^(GramLen-1-j) mod Mod`, which the DuckDB
  * oracle (TextPack) evaluates term by term — cross-engine equality is by
  * construction, unlike md5 prefixes which cost a full digest per gram.
  */
case class WinnowFingerprints(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects STRING input, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    WinnowFingerprints.javaWinnow(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFingerprints.javaWinnow($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
}

object WinnowFingerprints {
  /** Gram length in characters. */
  val GramLen = 8
  /** Winnowing window: minima are taken over this many consecutive grams. */
  val WindowLen = 4
  /** Rolling-hash base and modulus (prime). Terms stay far below 2^63 even
    * for astral-plane code points, so the arithmetic never overflows.
    */
  val Base = 131L
  val Mod = 1000000007L

  /** Base^(GramLen-1-j) mod Mod for j = 0..GramLen-1 — the per-position
    * weights. Exposed so the DuckDB oracle embeds the identical constants.
    */
  val Pows: Seq[Long] =
    Iterator.iterate(1L)(p => p * Base % Mod).take(GramLen).toSeq.reverse

  private val TopPow = Pows.head // Base^(GramLen-1) mod Mod

  /** The compiled winnow kernel, shared by interpreted eval and the
    * generated code (Scala emits a static forwarder, so generated Java can
    * call it directly).
    */
  def javaWinnow(text: UTF8String): ArrayData = {
    val cps = text.toString.codePoints.toArray
    val ng = cps.length - GramLen + 1
    if (ng <= 0) return new GenericArrayData(Array.emptyLongArray)

    // Rolling gram hashes: Horner for h(0), then O(1) per slide.
    val h = new Array[Long](ng)
    var acc = 0L
    var i = 0
    while (i < GramLen) { acc = (acc * Base + cps(i)) % Mod; i += 1 }
    h(0) = acc
    i = 1
    while (i < ng) {
      acc = ((acc - cps(i - 1) * TopPow % Mod + Mod) % Mod * Base +
        cps(i + GramLen - 1)) % Mod
      h(i) = acc
      i += 1
    }

    // Min of each window [t, t+WindowLen), truncated at the tail — mirrors
    // SQL `ROWS BETWEEN CURRENT ROW AND WindowLen-1 FOLLOWING`.
    val mins = new Array[Long](ng)
    var t = 0
    while (t < ng) {
      var m = h(t)
      var k = t + 1
      val end = math.min(t + WindowLen, ng)
      while (k < end) { if (h(k) < m) m = h(k); k += 1 }
      mins(t) = m
      t += 1
    }

    // Sorted distinct fingerprints.
    java.util.Arrays.sort(mins)
    var cnt = 0
    var j = 0
    while (j < ng) {
      if (j == 0 || mins(j) != mins(j - 1)) { mins(cnt) = mins(j); cnt += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, cnt))
  }
}
