package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Total BPE token count of a document under a learned merge table — the
  * t18 application kernel compiled into one expression.
  *
  * Exactly the column-expression semantics it replaces (which the DuckDB
  * oracle replays): per space-separated word, every code point is wrapped
  * in single spaces (" c1  c2 … "), the merges are applied in learned
  * priority order as plain leftmost-non-overlapping replaces of
  * " l  r " → " lr ", and the word's token count is its "  "-separated
  * segment count; counts sum over the document's words. The HOF
  * formulation (`aggregate(transform(ws, bpeTokens))` over a per-word
  * `split`/`concat_ws`/`replace` chain) evaluates its lambdas
  * INTERPRETED, outside whole-stage codegen — the same tax t12/t13 paid
  * until round 8 ([[CountIn]]); this is the compiled O(chars · merges)
  * pass. Children 2/3 are the foldable left/right symbol arrays of the
  * merge table, in learned order.
  */
case class BpeTokenCount(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (_: StringType, ArrayType(_: StringType, _), ArrayType(_: StringType, _))
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (t, l, r) => TypeCheckResult.TypeCheckFailure(
        "bpe_token_count expects (STRING, literal ARRAY<STRING>, literal " +
          s"ARRAY<STRING>), got ${t.catalogString} / ${l.catalogString} / ${r.catalogString}")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(text: Any, lefts: Any, rights: Any): Any =
    BpeTokenCount.count(text.asInstanceOf[UTF8String],
      lefts.asInstanceOf[ArrayData], rights.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, l, r) => s"graft.functions.BpeTokenCount.count($t, $l, $r)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "bpe_token_count"
}

object BpeTokenCount {
  /** Sum of per-word BPE token counts; words are the maximal non-space
    * runs of `text` (split-then-drop-empties semantics).
    */
  /** Small bounded pattern memo, identity-keyed: the merge table reaches
    * this kernel as a LITERAL (checkInputDataTypes requires foldable),
    * and codegen hands back the same ArrayData reference every row — so
    * the 2m string materializations happen once per table, not once per
    * ROW (at a 30k-merge production vocabulary the per-row rebuild was
    * 60k materializations + 120k concatenations before any counting).
    * Bounded at 4 entries (copy-on-write MRU), NOT a single slot: two
    * queries with different merge literals (t11's fixed merges vs
    * t17/t20's trained ones) running concurrently on one executor would
    * thrash a single slot on alternating rows, reintroducing the per-row
    * rebuild the memo exists to remove. Correctness never depends on a
    * hit; a fifth concurrent table just evicts the LRU entry. The list
    * lives in an AtomicReference and every promotion/insert is a
    * compareAndSet loop — a plain @volatile read-modify-write could drop
    * a concurrent insert, reintroducing the per-row rebuild under exactly
    * the concurrent multi-table load the memo exists for.
    */
  private final val MemoCap = 4
  private val cachedEntries = new java.util.concurrent.atomic.AtomicReference[
    List[(ArrayData, ArrayData, Array[String], Array[String])]](Nil)

  private def patterns(
      lefts: ArrayData, rights: ArrayData): (Array[String], Array[String]) = {
    val cs = cachedEntries.get()
    val hit = cs.find(c => (c._1 eq lefts) && (c._2 eq rights))
    if (hit.isDefined) {
      // promote to head so eviction is genuinely least-RECENT: without
      // this the list ages by insertion order (FIFO), and the documented
      // 5-table round-robin evicts exactly the next-needed entry every
      // time. CAS-loop so a concurrent promotion/insert is never lost;
      // if another thread evicts our entry meanwhile the promotion is
      // moot (the arrays in `hit` stay valid regardless) and we stop.
      var cur = cs
      var done = cur.head eq hit.get
      while (!done) {
        if (!cur.exists(_ eq hit.get)) done = true
        else if (cachedEntries.compareAndSet(
            cur, hit.get :: cur.filterNot(_ eq hit.get))) done = true
        else cur = cachedEntries.get()
      }
      (hit.get._3, hit.get._4)
    } else {
      val m = lefts.numElements()
      val pats = new Array[String](m)
      val reps = new Array[String](m)
      var i = 0
      while (i < m) {
        val l = lefts.getUTF8String(i).toString
        val r = rights.getUTF8String(i).toString
        pats(i) = " " + l + "  " + r + " "
        reps(i) = " " + l + r + " "
        i += 1
      }
      val entry = (lefts, rights, pats, reps)
      var cur = cs
      while (!cachedEntries.compareAndSet(cur,
          (entry :: cur.filterNot(
            c => (c._1 eq lefts) && (c._2 eq rights))).take(MemoCap))) {
        cur = cachedEntries.get()
      }
      (pats, reps)
    }
  }

  def count(text: UTF8String, lefts: ArrayData, rights: ArrayData): Int = {
    val (pats, reps) = patterns(lefts, rights)
    val s = text.toString
    val n = s.length
    var total = 0
    var pos = 0
    while (pos < n) {
      while (pos < n && s.charAt(pos) == ' ') pos += 1
      if (pos < n) {
        val start = pos
        while (pos < n && s.charAt(pos) != ' ') pos += 1
        total += wordTokens(s.substring(start, pos), pats, reps)
      }
    }
    total
  }

  /** One word: wrap code points in single spaces, apply the merge chain
    * (literal leftmost-non-overlapping replaces — String.replace and
    * Spark's `replace` share these semantics), count "  "-separated
    * segments.
    */
  private def wordTokens(w: String, pats: Array[String], reps: Array[String]): Int = {
    val sb = new java.lang.StringBuilder(w.length * 3 + 2)
    sb.append(' ')
    var i = 0
    var first = true
    while (i < w.length) {
      val cp = w.codePointAt(i)
      if (!first) sb.append("  ")
      sb.appendCodePoint(cp)
      first = false
      i += Character.charCount(cp)
    }
    sb.append(' ')
    var merged = sb.toString
    var j = 0
    while (j < pats.length) {
      merged = merged.replace(pats(j), reps(j))
      j += 1
    }
    var cnt = 1
    var k = merged.indexOf("  ")
    while (k >= 0) {
      cnt += 1
      k = merged.indexOf("  ", k + 2)
    }
    cnt
  }
}
