package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused SQ8 quantize→decode→cosine kernel: scores a raw `ARRAY<FLOAT>`
  * vector against a query vector AS IF the corpus vector had been stored
  * as 8-bit scalar-quantized codes between the per-dimension `(lo, hi)`
  * corpus bounds and decoded back — one compiled loop, no intermediate
  * decoded array.
  *
  * Per dimension: `code = round((x-lo)·255/(hi-lo))`,
  * `de = lo + code·(hi-lo)/255`, then the usual sequential
  * dot/norm accumulation of `cosine(de, q)`. `Math.round` is exact
  * round-half-up on the binary value for the non-negative codes this
  * produces, which is also what Spark's `round(x)` (shortest-decimal
  * HALF_UP) and DuckDB's `round(x)` (half-away-from-zero) compute for
  * non-negative arguments — so the e8 oracle replays it exactly.
  *
  * This replaces e8's `transform(sequence(...), i -> ...)` +
  * `cosine_similarity_hof` formulation: HOF lambdas evaluate OUTSIDE
  * whole-stage codegen (~1-2µs per element — the round-2 finding that
  * motivated [[ShingleHashes]]/[[WinnowFingerprints]]), which forfeits
  * exactly the cheap-scan property that makes SQ8 worth having at 100 TB.
  * Here the whole quantize→decode→score pipeline is one codegen'd pass
  * inside the scan stage.
  *
  * Returns null if any input is null or either effective norm is zero,
  * matching [[CosineSimilarity]].
  */
case class Sq8Cosine(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def floatArr(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    def doubleArr(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (floatArr(first.dataType) && doubleArr(second.dataType) &&
        doubleArr(third.dataType) && floatArr(fourth.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sq8_cosine expects (ARRAY<FLOAT> vec, ARRAY<DOUBLE> los, " +
        "ARRAY<DOUBLE> his, ARRAY<FLOAT> query), got " +
        children.map(_.dataType.catalogString).mkString(" / "))
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any, lo: Any, hi: Any, q: Any): Any = {
    val r = Sq8Cosine.kernel(
      v.asInstanceOf[ArrayData].toFloatArray(),
      lo.asInstanceOf[ArrayData].toDoubleArray(),
      hi.asInstanceOf[ArrayData].toDoubleArray(),
      q.asInstanceOf[ArrayData].toFloatArray())
    if (java.lang.Double.isNaN(r)) null else java.lang.Double.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, lo, hi, q) => {
      val r = ctx.freshName("r")
      s"""
         |double $r = graft.functions.Sq8Cosine.kernel(
         |  $v.toFloatArray(), $lo.toDoubleArray(),
         |  $hi.toDoubleArray(), $q.toFloatArray());
         |if (Double.isNaN($r)) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)

  override def prettyName: String = "sq8_cosine"
}

object Sq8Cosine {

  /** Decode-and-score loop. Returns NaN for the null cases (zero norm),
    * letting generated code branch on one primitive instead of boxing.
    * Scala emits a static forwarder, so generated Java calls this
    * directly.
    */
  def kernel(v: Array[Float], lo: Array[Double], hi: Array[Double],
      q: Array[Float]): Double = {
    val n = math.min(math.min(v.length, q.length), math.min(lo.length, hi.length))
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val l = lo(i); val h = hi(i)
      // h == l (constant dimension): every corpus value decodes to l.
      // Guarding keeps the kernel total — no Inf/NaN intermediates whose
      // settling behavior an oracle replay isn't guaranteed to mirror.
      val de =
        if (h > l) l + Math.round((v(i).toDouble - l) * 255.0 / (h - l)) * (h - l) / 255.0
        else l
      val qi = q(i).toDouble
      dot += de * qi; na += de * de; nb += qi * qi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) Double.NaN
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
