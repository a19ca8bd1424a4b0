package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Index of the nearest centroid (squared-euclidean) for a vector: the
  * k-means / IVF assignment step as a single codegen'd projection.
  *
  * `left` is the `ARRAY<FLOAT>` vector column; `right` is the (small,
  * usually literal/broadcast) `ARRAY<ARRAY<FLOAT>>` centroid table. Returns
  * the 0-based index of the closest centroid; ties resolve to the lowest
  * index, so results are deterministic.
  *
  * Why this exists: the naive DataFrame formulation is
  * `crossJoin(broadcast(centroids)) + groupBy(vec_id).agg(min_by(...))` —
  * that multiplies every row ×k and then SHUFFLES THE WHOLE CORPUS
  * (embeddings included) once per k-means iteration, a scale-killer at
  * 100 TB. An HOF argmin avoids the shuffle but runs interpreted (~µs per
  * lambda element). This expression is a compiled k×dim loop per row with
  * zero allocation, zero shuffle, zero row multiplication — assignment
  * becomes a map-side projection that AQE/codegen fuse into the scan.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "nearest_centroid expects (ARRAY<FLOAT>, ARRAY<ARRAY<FLOAT>>), got " +
        s"${l.catalogString} / ${r.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any, cs: Any): Any =
    NearestCentroid.nearest(v.asInstanceOf[ArrayData], cs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, cs) => s"graft.functions.NearestCentroid.nearest($v, $cs)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {
  /** Compiled argmin kernel shared by interpreted eval and codegen. Reads
    * both arrays element-wise through the ArrayData accessors — no
    * per-row materialization.
    */
  def nearest(vec: ArrayData, centroids: ArrayData): Int = {
    val n = vec.numElements()
    val k = centroids.numElements()
    // an empty centroid table must fail HERE, not return the
    // valid-looking index 0 that every downstream lookup then trusts —
    // the failure (empty training sample, bad filter) would otherwise
    // surface as wrong assignments far from its cause
    require(k > 0, "nearest_centroid: empty centroid table")
    var best = 0
    var bestD = Double.PositiveInfinity
    var i = 0
    while (i < k) {
      val c = centroids.getArray(i)
      val m = math.min(n, c.numElements())
      var d = 0.0
      var j = 0
      while (j < m) {
        val t = vec.getFloat(j).toDouble - c.getFloat(j).toDouble
        d += t * t
        j += 1
      }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }
}
