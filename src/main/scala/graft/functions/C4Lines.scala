package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The C4 line-level cleaning pass (Raffel et al. '20 §2.2 — the
  * heuristics that produced the Colossal Clean Crawled Corpus), compiled
  * into ONE scan of the page (t28's kernel). A line is KEPT iff all of:
  *
  *   - it ends with a terminal punctuation mark: '.', '!', '?' or '"'
  *   - it has ≥ 5 space-split words (empty segments count as words,
  *     exactly `split(line, " ", -1)` / DuckDB `string_split` semantics)
  *   - its lowercase does not contain "javascript"
  *
  * Page-level signals the caller gates on (C4 drops the page outright):
  * `n_sent` — occurrences of '.', '!' or '?' in the KEPT text (the
  * stated sentence-end proxy for the released C4 code's "fewer than 5
  * sentences" page drop; the caller's threshold is
  * `TextPack.C4MinSentences`);
  * `has_lorem` — lowercase page contains "lorem ipsum"; `has_brace` —
  * page contains '{'. (C4's bad-words page filter is t25's gate.)
  *
  * Returns `STRUCT<n_lines BIGINT, n_kept BIGINT, n_sent BIGINT,
  * has_lorem INT, has_brace INT, clean_text STRING>` where `clean_text`
  * is the kept lines re-joined with '\n' ('' when none survive). Case
  * folding for the two substring probes is ASCII ('A'-'Z'); the corpus
  * is ASCII and the oracle's `lower()` agrees there.
  *
  * One O(chars) pass, no array materialization beyond the line bounds,
  * no shuffle/join/state — scan-bandwidth like t25/t26/t27, so the gate
  * composes into the streaming ingest edge unchanged.
  */
case class C4Lines(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"c4_lines expects STRING, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("n_sent", LongType, nullable = false),
    StructField("has_lorem", IntegerType, nullable = false),
    StructField("has_brace", IntegerType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))

  override def nullSafeEval(text: Any): Any =
    C4Lines.clean(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.C4Lines.clean($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "c4_lines"
}

object C4Lines {

  private val Terminal = Set('.', '!', '?', '"')

  def clean(text: UTF8String): InternalRow = {
    val s = text.toString
    val lines = s.split("\n", -1)
    var kept = 0L
    var nSent = 0L
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < lines.length) {
      val ln = lines(i)
      if (keepLine(ln)) {
        kept += 1
        if (sb.length > 0) sb.append('\n')
        sb.append(ln)
        var j = 0
        while (j < ln.length) {
          val c = ln.charAt(j)
          if (c == '.' || c == '!' || c == '?') nSent += 1
          j += 1
        }
      }
      i += 1
    }
    InternalRow(lines.length.toLong, kept, nSent,
      if (containsAsciiFolded(s, "lorem ipsum")) 1 else 0,
      if (s.indexOf('{') >= 0) 1 else 0,
      UTF8String.fromString(sb.toString))
  }

  private def keepLine(ln: String): Boolean = {
    if (ln.isEmpty || !Terminal.contains(ln.charAt(ln.length - 1))) return false
    // ≥ 5 words: 4 separators are enough to prove it — stop early
    var spaces = 0
    var j = 0
    while (j < ln.length && spaces < 4) {
      if (ln.charAt(j) == ' ') spaces += 1
      j += 1
    }
    if (spaces < 4) return false
    !containsAsciiFolded(ln, "javascript")
  }

  /** ASCII-case-insensitive substring probe (needle is lowercase). */
  private def containsAsciiFolded(hay: String, needle: String): Boolean = {
    val n = needle.length
    var i = 0
    while (i + n <= hay.length) {
      var j = 0
      var ok = true
      while (ok && j < n) {
        var c = hay.charAt(i + j)
        if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
        if (c != needle.charAt(j)) ok = false
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }
}
