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
  *   9… dup{5..10}_chars code points COVERED by occurrences of repeated
  *                       n-grams beyond each gram's first occurrence,
  *                       overlaps counted once (per n)
  *
  * Stated definitions (the published rules leave these open; both
  * engines replay EXACTLY these):
  *  - "duplicate" lines/paragraphs count occurrences BEYOND the first
  *    (a doc of k identical lines has k−1 duplicates), matching the
  *    common open implementations.
  *  - duplicate N-GRAM character mass is the Gopher convention the
  *    open implementations use (r14 ADVICE — the earlier all-
  *    occurrences Σ count·len form could exceed 100 % of the document
  *    and applied the published thresholds far stricter than Table A1
  *    intends): for each n, take every occurrence of a gram that
  *    appears more than once, EXCLUDE each gram's first occurrence
  *    (smallest start position), and count the code points covered by
  *    the remaining occurrences' spans ONCE — a covered-interval
  *    union, never exceeding the document length.
  *  - "most frequent n-gram" character mass is `max(count·len)` over
  *    the doc's grams — order-free, so no tiebreak rule can reach the
  *    output (under a count tie the longer gram wins: it covers more
  *    characters, again the conservative direction).
  *  - grams are keyed by the shared [[ShingleHashes]] Horner-mod-prime
  *    hash (the oracle replays it via `polyHashSql`); a same-doc
  *    collision would merge two grams for BOTH engines identically
  *    (counts, first occurrence, and spans all key off the hash).
  *    Per-hash gram length for the TOP rules is `min` over its
  *    occurrences (order-free; lengths only differ under a collision);
  *    the dup rules use each occurrence's own span.
  *  - character counts are CODE POINTS (Spark `length` / DuckDB
  *    `length` semantics), denominators are taken by the consumer from
  *    `length(text)`.
  *
  * Cost: the n = 2..10 hashes extend each other per start position
  * (gram hash at n resumes the fold of n−1 over `' ' + next word`), so
  * the whole family is one O(9·chars) scan with per-doc hash maps;
  * when some n has a repeated gram, a SECOND identical fold pass walks
  * the occurrences in order and merges covered spans (intervals at
  * fixed n are sorted by construction, so the union is a running
  * high-water mark — still O(9·chars), no allocation). No explode, no
  * shuffle: scan-bandwidth at any corpus size, the same shape that
  * lets t25/t26 run unchanged at the streaming ingest edge.
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

  /** Per-thread reusable workspace. The first cut of this kernel built
    * nine boxed-key `java.util.HashMap`s and a split-words array PER ROW
    * (~3k short-lived objects per ~200-word doc → ~700 young GCs and a
    * 1.5× run-to-run band on the 15 M-doc cell); the gram tables are now
    * generation-stamped open-addressing arrays that live for the thread,
    * so the steady-state pass allocates nothing per row. Expression eval
    * is single-threaded per task, so a ThreadLocal is sound; memory is
    * bounded by the largest document each thread has seen.
    */
  private final class Scratch {
    var starts = new Array[Int](256)     // word start offsets
    var cpl = new Array[Long](256)       // code points per word
    // 9 gram tables (n = 2..10): open addressing, load factor <= 1/2,
    // slot occupied iff stamp(slot) == gen (no clearing between rows)
    var keys = Array.fill(MaxN - 1)(new Array[Long](2048))
    var cnt = Array.fill(MaxN - 1)(new Array[Int](2048))
    var lens = Array.fill(MaxN - 1)(new Array[Long](2048))
    var fpos = Array.fill(MaxN - 1)(new Array[Int](2048)) // first-occurrence word idx
    var stamp = Array.fill(MaxN - 1)(new Array[Int](2048))
    var used = Array.fill(MaxN - 1)(new Array[Int](1024)) // occupied slots
    val usedCnt = new Array[Int](MaxN - 1)
    var gen = 0

    def ensure(nWords: Int): Unit = {
      if (starts.length < nWords) {
        starts = new Array[Int](Integer.highestOneBit(nWords - 1) << 1)
        cpl = new Array[Long](starts.length)
      }
      // each table holds <= nWords entries; keep capacity >= 2x entries
      var t = 0
      while (t < MaxN - 1) {
        if (keys(t).length < nWords * 2) {
          var c = keys(t).length
          while (c < nWords * 2) c <<= 1
          keys(t) = new Array[Long](c)
          cnt(t) = new Array[Int](c)
          lens(t) = new Array[Long](c)
          fpos(t) = new Array[Int](c)
          stamp(t) = new Array[Int](c) // fresh zeros: never equal to gen >= 1
        }
        if (used(t).length < nWords) used(t) = new Array[Int](nWords * 2)
        t += 1
      }
    }

    /** Release the workspace grown past a pathological document (r14
      * ADVICE: one multi-million-word row used to pin ~dozens of bytes
      * per word × 9 tables on every executor thread that touched it,
      * forever). Fresh zero stamps are never equal to gen >= 1, so the
      * reallocated tables are correctly "all empty" without a reset.
      */
    def shrinkIfOversized(): Unit = {
      if (keys(0).length > ShrinkCapacity) {
        starts = new Array[Int](256)
        cpl = new Array[Long](256)
        keys = Array.fill(MaxN - 1)(new Array[Long](2048))
        cnt = Array.fill(MaxN - 1)(new Array[Int](2048))
        lens = Array.fill(MaxN - 1)(new Array[Long](2048))
        fpos = Array.fill(MaxN - 1)(new Array[Int](2048))
        stamp = Array.fill(MaxN - 1)(new Array[Int](2048))
        used = Array.fill(MaxN - 1)(new Array[Int](1024))
      }
    }
  }

  /** Table-capacity high-water mark (per gram table, slots): ~64 k words
    * of document keeps the workspace; anything larger is released after
    * the row so a single pathological document cannot pin the memory.
    */
  private val ShrinkCapacity = 1 << 17

  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  def stats(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new Array[Long](15)

    // Lines and paragraphs: exact string keys (no hashing — the oracle
    // groups the same strings). split(regex, -1) keeps trailing empties,
    // matching DuckDB's string_split.
    groupStats(s.split("\n", -1), out, 0)
    groupStats(s.split("\n\n", -1), out, 3)

    // Word boundaries without materializing word strings: words are the
    // single-space-split segments (empties preserved), word i spans
    // [starts(i), wordEnd(i)).
    val sc = scratch.get()
    var w = 1
    var p = 0
    while (p < s.length) { if (s.charAt(p) == ' ') w += 1; p += 1 }
    sc.ensure(w)
    val starts = sc.starts
    val cpl = sc.cpl
    starts(0) = 0
    var wi = 1
    p = 0
    while (p < s.length) {
      if (s.charAt(p) == ' ') { starts(wi) = p + 1; wi += 1 }
      p += 1
    }
    def wordEnd(i: Int): Int = if (i + 1 < w) starts(i + 1) - 1 else s.length
    var i = 0
    while (i < w) { cpl(i) = s.codePointCount(starts(i), wordEnd(i)); i += 1 }

    // Word n-grams, n = 2..10, one extending fold per start position.
    if (sc.gen == Int.MaxValue) { // stamp-wrap guard (2^31 rows/thread)
      var t0 = 0
      while (t0 < MaxN - 1) {
        java.util.Arrays.fill(sc.stamp(t0), 0); t0 += 1
      }
      sc.gen = 0
    }
    sc.gen += 1
    val gen = sc.gen
    java.util.Arrays.fill(sc.usedCnt, 0)
    def foldRange(from: Long, wIdx: Int): Long = {
      var acc = from
      var j = starts(wIdx)
      val end = wordEnd(wIdx)
      while (j < end) {
        val cp = s.codePointAt(j)
        acc = (acc * Base + cp) % Mod
        j += Character.charCount(cp)
      }
      acc
    }
    i = 0
    while (i < w) {
      var acc = foldRange(0L, i)
      var len = cpl(i)
      var n = 2
      while (n <= MaxN && i + n - 1 < w) {
        acc = foldRange((acc * Base + ' ') % Mod, i + n - 1)
        len += 1 + cpl(i + n - 1)
        val t = n - 2
        val ks = sc.keys(t); val cs = sc.cnt(t); val ls = sc.lens(t)
        val st = sc.stamp(t)
        val mask = ks.length - 1
        var slot = ((acc * -7046029254386353131L) >>> 40).toInt & mask
        while (st(slot) == gen && ks(slot) != acc) slot = (slot + 1) & mask
        if (st(slot) != gen) {
          st(slot) = gen; ks(slot) = acc; cs(slot) = 1; ls(slot) = len
          sc.fpos(t)(slot) = i
          sc.used(t)(sc.usedCnt(t)) = slot; sc.usedCnt(t) += 1
        } else {
          cs(slot) += 1
          if (len < ls(slot)) ls(slot) = len
        }
        n += 1
      }
      i += 1
    }
    var anyDup = false
    var t = 0
    while (t < MaxN - 1) {
      val cs = sc.cnt(t); val ls = sc.lens(t); val us = sc.used(t)
      val m = sc.usedCnt(t)
      if (t <= 2) { // n = 2..4: max(count · len)
        var top = 0L
        var k = 0
        while (k < m) {
          val mass = cs(us(k)).toLong * ls(us(k))
          if (mass > top) top = mass
          k += 1
        }
        out(6 + t) = top
      } else { // n = 5..10: any repeated gram at this n?
        var k = 0
        while (!anyDup && k < m) {
          if (cs(us(k)) > 1) anyDup = true
          k += 1
        }
      }
      t += 1
    }
    // Second pass, only when some n >= 5 has a repeated gram: walk the
    // occurrences in start order (the same extending fold), and for each
    // non-first occurrence of a repeated gram merge its span into a per-n
    // covered-interval union. Spans at fixed n are sorted by construction
    // (start(i) and end(i+n-1) both increase with i), so the union is a
    // running high-water char offset; covered mass is counted in CODE
    // POINTS over the merged segments.
    if (anyDup) {
      val prevEnd = new Array[Int](MaxN + 1) // per n, char offset high-water
      i = 0
      while (i < w) {
        var acc = foldRange(0L, i)
        var n = 2
        while (n <= MaxN && i + n - 1 < w) {
          acc = foldRange((acc * Base + ' ') % Mod, i + n - 1)
          if (n >= 5) {
            val t2 = n - 2
            val ks = sc.keys(t2); val cs = sc.cnt(t2); val st = sc.stamp(t2)
            val mask = ks.length - 1
            var slot = ((acc * -7046029254386353131L) >>> 40).toInt & mask
            while (st(slot) == gen && ks(slot) != acc) slot = (slot + 1) & mask
            if (cs(slot) > 1 && sc.fpos(t2)(slot) != i) {
              val a = starts(i)
              val b = wordEnd(i + n - 1)
              val from = if (a > prevEnd(n)) a else prevEnd(n)
              if (b > from) {
                out(9 + n - 5) += s.codePointCount(from, b)
                prevEnd(n) = b
              }
            }
          }
          n += 1
        }
        i += 1
      }
    }
    sc.shrinkIfOversized()
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

}
