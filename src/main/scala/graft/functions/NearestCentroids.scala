package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** The `p` nearest centroid indices (squared-euclidean) for a vector,
  * closest first — the MULTI-PROBE assignment step ([[NearestCentroid]]
  * generalized), as a single codegen'd projection returning
  * `ARRAY<INT>`.
  *
  * Ordering is (distance, index) ascending — ties resolve to the lower
  * index at every rank, so the probe list is deterministic and the
  * DuckDB oracle can replay it with first-position-of-min over a
  * masked distance list. Same scale rationale as [[NearestCentroid]]:
  * the relational top-p (explode ×k + window rank) multiplies the
  * corpus ×k and shuffles it; this is a compiled k×dim + k×p loop per
  * row, zero shuffle, fused into the scan.
  */
case class NearestCentroids(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _), IntegerType)
          if third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "nearest_centroids expects (ARRAY<FLOAT>, ARRAY<ARRAY<FLOAT>>, literal INT), got " +
          s"${a.catalogString} / ${b.catalogString} / ${c.catalogString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any, cs: Any, p: Any): Any =
    NearestCentroids.nearestP(v.asInstanceOf[ArrayData],
      cs.asInstanceOf[ArrayData], p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, cs, p) => s"graft.functions.NearestCentroids.nearestP($v, $cs, $p)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "nearest_centroids"
}

object NearestCentroids {
  /** Top-p by (distance, index): a p-slot insertion pass — p is the
    * probe budget (2-8), so the inner shift beats any heap.
    */
  def nearestP(vec: ArrayData, centroids: ArrayData, p: Int): ArrayData = {
    val n = vec.numElements()
    val k = centroids.numElements()
    require(k > 0, "nearest_centroids: empty centroid table")
    require(p > 0, s"nearest_centroids: probe count must be > 0, got $p")
    val m = math.min(p, k)
    val bestD = Array.fill(m)(Double.PositiveInfinity)
    val bestI = new Array[Int](m)
    var i = 0
    while (i < k) {
      val c = centroids.getArray(i)
      val dims = math.min(n, c.numElements())
      var d = 0.0
      var j = 0
      while (j < dims) {
        val t = vec.getFloat(j).toDouble - c.getFloat(j).toDouble
        d += t * t
        j += 1
      }
      // strict < keeps the earliest (lowest-index) centroid at every
      // rank under distance ties — the deterministic contract
      var slot = m
      while (slot > 0 && d < bestD(slot - 1)) slot -= 1
      if (slot < m) {
        var s = m - 1
        while (s > slot) { bestD(s) = bestD(s - 1); bestI(s) = bestI(s - 1); s -= 1 }
        bestD(slot) = d
        bestI(slot) = i
      }
      i += 1
    }
    new GenericArrayData(bestI.map(Int.box))
  }
}
