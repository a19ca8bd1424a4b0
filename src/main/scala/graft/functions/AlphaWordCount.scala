package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of the space-separated words of a document that contain at
  * least one ASCII letter — the "80 % of words must contain an
  * alphabetic character" Gopher rule (Rae et al. '21, A1.1), compiled
  * (t26's kernel).
  *
  * Semantics are exactly `size(filter(split(text, " ", -1), w => w
  * rlike "[A-Za-z]"))` — empty segments are words with no letters —
  * but in ONE codegen'd O(bytes) pass over the raw string: no array
  * materialization, no interpreted HOF lambda (the same
  * interpreted-lambda tax [[CountIn]] paid off for t2/t3). ASCII
  * letters are single UTF-8 bytes, so the byte scan needs no decoding;
  * the DuckDB oracle replays `len(list_filter(ws, w ->
  * regexp_matches(w, '[A-Za-z]')))` — RE2's `[A-Za-z]` is the same
  * ASCII class.
  */
case class AlphaWordCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"alpha_word_count expects STRING, got ${t.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(text: Any): Any =
    AlphaWordCount.count(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.AlphaWordCount.count($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "alpha_word_count"
}

object AlphaWordCount {
  def count(text: UTF8String): Int = {
    val bytes = text.getBytes
    var n = 0
    var hasAlpha = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' ') { // UTF-8: 0x20 only ever encodes the space itself
        if (hasAlpha) n += 1
        hasAlpha = false
      } else if (!hasAlpha &&
          ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z'))) {
        hasAlpha = true
      }
      i += 1
    }
    if (hasAlpha) n + 1 else n
  }
}
