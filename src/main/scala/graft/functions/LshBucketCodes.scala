package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Multi-table random-hyperplane LSH bucket codes in one compiled pass:
  * dot the vector against every hyperplane, pack the sign bits into one
  * bucket code per table (`planesPerTable` bits each). Returns
  * `ARRAY<BIGINT>` of length `numPlanes / planesPerTable`.
  *
  * Replaces per-plane `cosine_similarity(embedding, plane) > 0` columns:
  * sign(cosine) == sign(dot) (norms are positive), so buckets are
  * identical, but the fused kernel reads the vector once for all planes
  * and skips 2×planes norm computations per row. The dot accumulates
  * left-to-right in doubles — bit-identical to DuckDB's
  * `list_dot_product`, which the d6 oracle uses to replay the bucketing.
  */
case class LshBucketCodes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _), IntegerType)
          if third.foldable =>
        // perTable is foldable, so the degenerate values fail at ANALYSIS
        // time, not per row at runtime: 0 would divide by zero, ≥ 64
        // would silently wrap the bit shift (Java long shifts are mod
        // 64) and alias unrelated hyperplanes into one bucket bit, and a
        // non-divisor would silently DROP the trailing planes — a recall
        // loss with no error anywhere.
        third.eval() match {
          case w: java.lang.Integer if w >= 1 && w <= 63 =>
            TypeCheckResult.TypeCheckSuccess
          case w => TypeCheckResult.TypeCheckFailure(
            s"lsh_bucket_codes: planesPerTable must be in [1, 63], got $w")
        }
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "lsh_bucket_codes expects (ARRAY<FLOAT>, ARRAY<ARRAY<FLOAT>>, literal INT), got " +
          s"${a.catalogString} / ${b.catalogString} / ${c.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any, p: Any, w: Any): Any =
    LshBucketCodes.codes(v.asInstanceOf[ArrayData], p.asInstanceOf[ArrayData],
      w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, p, w) => s"graft.functions.LshBucketCodes.codes($v, $p, $w)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "lsh_bucket_codes"
}

object LshBucketCodes {
  def codes(vec: ArrayData, planes: ArrayData, perTable: Int): ArrayData = {
    val n = vec.numElements()
    val p = planes.numElements()
    val dots = new Array[Double](p)
    var i = 0
    while (i < p) {
      val pl = planes.getArray(i)
      val m = math.min(n, pl.numElements())
      var d = 0.0
      var j = 0
      while (j < m) {
        d += vec.getFloat(j).toDouble * pl.getFloat(j).toDouble
        j += 1
      }
      dots(i) = d
      i += 1
    }
    // analysis-time check bounds perTable to [1, 63]; require the plane
    // count divides evenly so no trailing plane is ever silently unused
    require(p % perTable == 0,
      s"lsh_bucket_codes: $p planes not divisible by planesPerTable=$perTable " +
        "— trailing planes would be silently dropped")
    val nt = p / perTable
    val out = new Array[Long](nt)
    var t = 0
    while (t < nt) {
      var code = 0L
      var j = 0
      while (j < perTable) {
        if (dots(t * perTable + j) > 0) code |= (1L << j)
        j += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }
}
