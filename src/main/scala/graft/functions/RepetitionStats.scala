package graft.functions

import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All fifteen per-document counters behind the Gopher repetition rule
  * set (Rae et al. '21 Table A1, block A1.2 — the MassiveText
  * "repetitious documents" filters), in ONE compiled pass (t27's
  * kernel). Returns `ARRAY<BIGINT>` of length 15:
  *
  *   0  n_lines          lines = split(text, "\n", -1) (empties kept)
  *   1  dup_lines        Σ (c−1) over distinct lines occurring c > 1
  *   2  dup_line_chars   Σ (c−1)·cplen(line) over the same lines
  *   3  n_paras          paragraphs = split(text, "\n\n", -1)
  *   4  dup_paras        Σ (c−1) as above, over paragraphs
  *   5  dup_para_chars   Σ (c−1)·cplen(para)
  *   6  top2_chars       max over word-2-grams of count·cplen(gram)
  *   7  top3_chars       … 3-grams
  *   8  top4_chars       … 4-grams
  *   9… dup{5..10}_chars Σ count·cplen(gram) over n-grams with count > 1
  *
  * Stated definitions (the published rules leave these open; both
  * engines replay EXACTLY these):
  *  - "duplicate" lines/paragraphs count occurrences BEYOND the first
  *    (a doc of k identical lines has k−1 duplicates), matching the
  *    common open implementations; duplicate N-GRAM characters count
  *    ALL occurrences of a repeated gram ("characters contained within
  *    duplicate n-grams") with no overlap de-count — overlapping
  *    repeats are counted once per gram occurrence, which only ever
  *    OVERSTATES the fraction, i.e. the gate errs strict.
  *  - "most frequent n-gram" character mass is `max(count·len)` over
  *    the doc's grams — order-free, so no tiebreak rule can reach the
  *    output (under a count tie the longer gram wins: it covers more
  *    characters, again the conservative direction).
  *  - grams are keyed by the shared [[ShingleHashes]] Horner-mod-prime
  *    hash (the oracle replays it via `polyHashSql`); a same-doc
  *    collision would merge two grams for BOTH engines identically.
  *    Per-hash gram length is `min` over its occurrences (order-free;
  *    lengths only differ under a collision).
  *  - character counts are CODE POINTS (Spark `length` / DuckDB
  *    `length` semantics), denominators are taken by the consumer from
  *    `length(text)`.
  *
  * Cost: the n = 2..10 hashes extend each other per start position
  * (gram hash at n resumes the fold of n−1 over `' ' + next word`), so
  * the whole family is one O(9·chars) scan with per-doc hash maps —
  * no explode, no shuffle, scan-bandwidth at any corpus size, the same
  * shape that lets t25/t26 run unchanged at the streaming ingest edge.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects STRING, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(text: Any): Any =
    RepetitionStats.stats(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.RepetitionStats.stats($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  import WinnowFingerprints.{Base, Mod}

  /** Gram sizes with a "most frequent" (top) rule. */
  val TopNs: Seq[Int] = Seq(2, 3, 4)
  /** Gram sizes with a "duplicate mass" rule. */
  val DupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)

  private val MaxN = DupNs.max

  def stats(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new Array[Long](15)

    // Lines and paragraphs: exact string keys (no hashing — the oracle
    // groups the same strings). split(regex, -1) keeps trailing empties,
    // matching DuckDB's string_split.
    groupStats(s.split("\n", -1), out, 0)
    groupStats(s.split("\n\n", -1), out, 3)

    // Word n-grams, n = 2..10, one extending fold per start position.
    val words = s.split(" ", -1)
    val w = words.length
    val cpl = new Array[Long](w) // code-point length per word
    var i = 0
    while (i < w) { cpl(i) = words(i).codePointCount(0, words(i).length); i += 1 }
    val maps = Array.fill(MaxN - 1)(new JHashMap[Long, Array[Long]]())
    i = 0
    while (i < w) {
      var acc = foldWord(0L, words(i))
      var len = cpl(i)
      var n = 2
      while (n <= MaxN && i + n - 1 < w) {
        acc = foldWord((acc * Base + ' ') % Mod, words(i + n - 1))
        len += 1 + cpl(i + n - 1)
        val m = maps(n - 2)
        val e = m.get(acc)
        if (e == null) m.put(acc, Array(1L, len))
        else { e(0) += 1; if (len < e(1)) e(1) = len }
        n += 1
      }
      i += 1
    }
    for (n <- TopNs) {
      var top = 0L
      val it = maps(n - 2).values().iterator()
      while (it.hasNext) {
        val e = it.next()
        val mass = e(0) * e(1)
        if (mass > top) top = mass
      }
      out(6 + n - 2) = top
    }
    for (n <- DupNs) {
      var dup = 0L
      val it = maps(n - 2).values().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e(0) > 1) dup += e(0) * e(1)
      }
      out(9 + n - 5) = dup
    }
    new GenericArrayData(out)
  }

  /** total / Σ(c−1) / Σ(c−1)·cplen over a segment array, into
    * out(at)/out(at+1)/out(at+2).
    */
  private def groupStats(segs: Array[String], out: Array[Long], at: Int): Unit = {
    val m = new JHashMap[String, Array[Long]]()
    var i = 0
    while (i < segs.length) {
      val c = m.get(segs(i))
      if (c == null) m.put(segs(i), Array(1L)) else c(0) += 1
      i += 1
    }
    out(at) = segs.length
    var dups = 0L
    var dupChars = 0L
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c > 1) {
        dups += c - 1
        dupChars += (c - 1) * e.getKey.codePointCount(0, e.getKey.length)
      }
    }
    out(at + 1) = dups
    out(at + 2) = dupChars
  }

  private def foldWord(from: Long, word: String): Long = {
    var acc = from
    var j = 0
    while (j < word.length) {
      val cp = word.codePointAt(j)
      acc = (acc * Base + cp) % Mod
      j += Character.charCount(cp)
    }
    acc
  }
}
