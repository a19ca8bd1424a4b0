package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Bag-count of the tokens of an `ARRAY<STRING>` column that appear in a
  * small literal word list — the marker/stopword counting kernel behind
  * the language-ID and quality-score features (t2/t3/t13, the curation
  * pipelines, and the s9 streaming ingest path).
  *
  * Replaces `size(filter(ws, w => w.isin(words)))`: Spark evaluates HOF
  * lambdas INTERPRETED, outside whole-stage codegen, and the driver's r7
  * bench showed exactly those two queries inflating 7-9× under CPU
  * contention while every codegen'd query stayed put — the same
  * interpreted-lambda tax this repo already paid off in
  * [[ShingleHashes]] / [[WinnowFingerprints]]. This is a compiled
  * O(tokens × |words|) pass (the word lists are 4-7 entries, so a linear
  * probe beats any set build), duplicate tokens counted once each —
  * identical bag semantics to the `filter`+`isin` formulation and to the
  * DuckDB oracle's `len(list_filter(ws, w -> w IN (...)))`.
  */
case class CountIn(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_: StringType, _), ArrayType(_: StringType, _)) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"count_in expects (ARRAY<STRING>, literal ARRAY<STRING>), got ${l.catalogString} / ${r.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(arr: Any, words: Any): Any =
    CountIn.count(arr.asInstanceOf[ArrayData], words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, w) => s"graft.functions.CountIn.count($a, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "count_in"
}

object CountIn {
  /** Number of elements of `arr` equal to any element of `words` (bag
    * count; null elements never match — `isin` semantics).
    */
  def count(arr: ArrayData, words: ArrayData): Int = {
    val n = arr.numElements()
    val m = words.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var j = 0
        while (j < m) {
          if (!words.isNullAt(j) && words.getUTF8String(j).equals(t)) {
            c += 1
            j = m
          } else j += 1
        }
      }
      i += 1
    }
    c
  }
}
