package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One compiled pass rebuilding a document with its hot w-gram spans
  * excised (t23's rewrite stage): given the original text and the start
  * positions of the spans to scrub, mark positions `[start, start+w)`
  * covered, count them, and re-join the surviving words (original order,
  * single-space separators, empty tokens preserved — exactly
  * `split(text, " ")` semantics).
  *
  * Returns `STRUCT<n_words BIGINT, n_scrubbed BIGINT, clean_text STRING>`.
  * A fully scrubbed document yields `clean_text = ''` (the listagg +
  * coalesce('') behavior this replaces).
  *
  * This is t23's scale fix (SCALING §3c, round 12): the round-11
  * formulation materialized THREE corpus-sized shuffles after the df
  * count — explode every covered position ×w, distinct 780M (doc, pos)
  * pairs, left-join the posexploded words, then a corpus-wide ordered
  * listagg (SortAggregate) — and its external sorts were what spilled
  * 256 GB at x1000m. With the scrub compiled, the only post-df shuffle
  * is `collect_list(start)` keyed by doc (ints, bounded by words per
  * document), and the text is rewritten where it already lives. Output
  * is IDENTICAL — the DuckDB oracle is unchanged.
  */
case class ScrubSpans(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (_: StringType, ArrayType(IntegerType, _), IntegerType) if third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"scrub_spans expects (STRING, ARRAY<INT>, literal INT), got " +
          s"${a.catalogString} / ${b.catalogString} / ${c.catalogString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_scrubbed", LongType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))

  override def nullSafeEval(text: Any, starts: Any, w: Any): Any =
    ScrubSpans.scrub(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, st, w) => s"graft.functions.ScrubSpans.scrub($t, $st, $w)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "scrub_spans"
}

object ScrubSpans {

  /** The scrub pass. `starts` may contain duplicates and any order (it
    * is a collect_list); positions are clamped to the word count so a
    * malformed start cannot escape the document.
    */
  def scrub(text: UTF8String, starts: ArrayData, w: Int): InternalRow = {
    val words = text.toString.split(" ", -1)
    val n = words.length
    val covered = new Array[Boolean](n)
    val m = starts.numElements()
    var i = 0
    while (i < m) {
      val st = starts.getInt(i)
      var k = math.max(0, st)
      val end = math.min(st + w, n) // span end is anchored at st, not the clamp
      while (k < end) { covered(k) = true; k += 1 }
      i += 1
    }
    var scrubbed = 0L
    val sb = new java.lang.StringBuilder
    var firstOut = true
    i = 0
    while (i < n) {
      if (covered(i)) scrubbed += 1L
      else {
        if (!firstOut) sb.append(' ')
        sb.append(words(i))
        firstOut = false
      }
      i += 1
    }
    InternalRow(n.toLong, scrubbed, UTF8String.fromString(sb.toString))
  }
}
