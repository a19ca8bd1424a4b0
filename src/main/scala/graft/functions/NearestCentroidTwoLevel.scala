package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Two-level (coarse-then-member) centroid assignment as ONE compiled
  * kernel: nearest group over the g group centroids, then nearest member
  * WITHIN that group, returning the member's GLOBAL centroid id. Both
  * argmin levels use [[NearestCentroid.nearest]]'s (distance, lowest
  * index) rule; member lists ascend, so the composed tiebreak is
  * lowest-global-cid — bit-identical to the `when`-chain formulation it
  * replaces (`IvfIndex.assignTwoLevelCol` pre-round-11), whose oracle
  * replays both levels.
  *
  * Why an expression and not the when-chain: the chain was g `when`
  * branches, each repeating the group-argmin subexpression and carrying
  * its own member-centroid literal — an expression TREE that grows with
  * g. The AssignCrossover measurement caught it super-linear in n·g
  * (14.3 s at n=1M/g=45 → 281 s at n=4M/g=89: ~2.4× the cost model —
  * past codegen's method/CSE limits the chain re-evaluates the group
  * argmin per branch, interpreted). This node is CONSTANT-size generated
  * code at any g: two `nearest` calls and one id lookup per row, with
  * the (g + k)×dim floats living in three literal ArrayData objects,
  * exactly like flat [[NearestCentroid]]'s k×dim literal.
  *
  * Children: (vector ARRAY<FLOAT>, groupCents ARRAY<ARRAY<FLOAT>>,
  * memberCents ARRAY<ARRAY<ARRAY<FLOAT>>>, memberIds ARRAY<ARRAY<INT>>)
  * — memberCents(i)/memberIds(i) are group i's member centroids and
  * their global ids, positionally aligned.
  */
case class NearestCentroidTwoLevel(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(ArrayType(FloatType, _), _),
            ArrayType(ArrayType(ArrayType(FloatType, _), _), _),
            ArrayType(ArrayType(IntegerType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        "nearest_centroid_two_level expects (ARRAY<FLOAT>, ARRAY<ARRAY<FLOAT>>, " +
          "ARRAY<ARRAY<ARRAY<FLOAT>>>, ARRAY<ARRAY<INT>>), got " +
          s"${a.catalogString} / ${b.catalogString} / ${c.catalogString} / ${d.catalogString}")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any, gc: Any, mc: Any, mi: Any): Any =
    NearestCentroidTwoLevel.nearest2(
      v.asInstanceOf[ArrayData], gc.asInstanceOf[ArrayData],
      mc.asInstanceOf[ArrayData], mi.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, gc, mc, mi) =>
      s"graft.functions.NearestCentroidTwoLevel.nearest2($v, $gc, $mc, $mi)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)

  override def prettyName: String = "nearest_centroid_two_level"
}

object NearestCentroidTwoLevel {
  /** Group argmin, member argmin within the group, global-id lookup —
    * ~(g + k/g)·dim flops per row, shared by interpreted eval and
    * codegen.
    */
  def nearest2(vec: ArrayData, groupCents: ArrayData,
      memberCents: ArrayData, memberIds: ArrayData): Int = {
    val gi = NearestCentroid.nearest(vec, groupCents)
    val mi = NearestCentroid.nearest(vec, memberCents.getArray(gi))
    memberIds.getArray(gi).getInt(mi)
  }
}
