package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions.col

/** Adversarial pins for the r15 covered-span duplicate-n-gram mass
  * (slots 9..14 of [[RepetitionStats]]): the stated definition — for
  * each n, the CODE POINTS covered by occurrences of grams appearing
  * more than once, excluding each gram's first occurrence, overlaps
  * counted once — replayed independently on hostile inputs the ASCII
  * planted-row spec can't reach: surrogate pairs, self-overlapping
  * repeats of a single word, sub-n documents, and the workspace
  * high-water release.
  */
class RepetitionCoveredSpanSpec extends SparkSuite {
  import spark.implicits._

  /** Independent replay in code points: split on single spaces, walk
    * occurrences in order, union spans of non-first occurrences of
    * repeated grams (keyed by the gram STRING — collision-free on these
    * fixtures, deliberately independent of the kernel's hashing).
    */
  private def coveredSpan(text: String, n: Int): Long = {
    val ws = text.split(" ", -1)
    if (ws.length < n) return 0L
    // code-point start offset of each word (words re-join with 1 space)
    val starts = ws.scanLeft(0L)((acc, w) =>
      acc + w.codePointCount(0, w.length) + 1)
    val grams = ws.sliding(n).map(_.mkString(" ")).toArray
    val firstAt = scala.collection.mutable.Map[String, Int]()
    grams.zipWithIndex.foreach { case (g, i) =>
      if (!firstAt.contains(g)) firstAt(g) = i }
    val counts = grams.groupBy(identity).view.mapValues(_.length).toMap
    var covered = 0L
    var prevEnd = 0L
    grams.zipWithIndex.foreach { case (g, i) =>
      if (counts(g) > 1 && firstAt(g) != i) {
        val a = math.max(starts(i), prevEnd)
        val b = starts(i) + g.codePointCount(0, g.length)
        if (b > a) { covered += b - a; prevEnd = b }
      }
    }
    covered
  }

  private def kernel(text: String): Seq[Long] = {
    val r = Seq(text).toDF("text")
      .select(graft.functions.repetition_stats(col("text")).as("r"))
      .collect().head.getSeq[Long](0)
    r
  }

  private def checkAllNs(text: String, clue: String): Unit = {
    val out = kernel(text)
    (5 to 10).foreach { n =>
      assert(out(9 + n - 5) == coveredSpan(text, n), s"$clue dup$n")
    }
  }

  test("surrogate pairs: covered mass is CODE POINTS, spans land on the right boundaries") {
    // each word carries an astral code point (2 Java chars, 1 code
    // point) — a char-counted implementation would overstate every span
    val phrase = (1 to 6).map(i => s"a😀$i").mkString(" ") // 😀
    val text = s"$phrase filler🚀 one two three $phrase"
    checkAllNs(text, "surrogate")
    // and the denominator convention: len(text) is code points — the
    // covered mass must be comparable to it, never to char length
    val out = kernel(text)
    val cp = text.codePointCount(0, text.length)
    (5 to 10).foreach { n => assert(out(9 + n - 5) <= cp, s"dup$n > len") }
  }

  test("single repeated word: maximal self-overlap unions to one span") {
    // "x x ... x" (12 words): every n-gram is identical, occurrences
    // overlap at stride 1 — all-occurrence counting would multi-count
    // nearly the whole doc per occurrence; the union is one span from
    // the second occurrence's start to the end
    val text = Seq.fill(12)("x").mkString(" ")
    checkAllNs(text, "self-overlap")
    val out = kernel(text)
    // exact hand value for n=5: occurrences at 0..7, first excluded,
    // union covers [start(1), end(11)) = 23 - 2 = 21 code points
    assert(out(9) == 21L, s"hand value n=5: ${out(9)}")
  }

  test("adjacent but non-overlapping repeats merge only where they touch") {
    val block = "p q r s t"
    val text = s"$block $block u v $block"
    checkAllNs(text, "blocks")
  }

  test("sub-n documents and empties produce zero mass") {
    Seq("", "one", "one two three four",
      Seq.fill(4)("x").mkString(" ")).foreach { t =>
      val out = kernel(t)
      (5 to 10).foreach { n => assert(out(9 + n - 5) == 0L, s"'$t' dup$n") }
    }
  }

  /** The replay keyed by the kernel's OWN Horner-mod-prime hash —
    * needed on the 70 k-gram document, where a couple of same-doc hash
    * collisions are expected (birthday at Mod ≈ 2³¹) and the stated
    * contract is that a collision merges two grams for both engines
    * identically (the DuckDB oracle replays this same hash); the
    * string-keyed replay above is only collision-free on small
    * fixtures.
    */
  private def coveredSpanHashed(text: String, n: Int): Long = {
    import WinnowFingerprints.{Base, Mod}
    val ws = text.split(" ", -1)
    if (ws.length < n) return 0L
    val starts = ws.scanLeft(0L)((acc, w) =>
      acc + w.codePointCount(0, w.length) + 1)
    def hashOf(g: String): Long = {
      var acc = 0L
      var j = 0
      while (j < g.length) {
        val cp = g.codePointAt(j)
        acc = (acc * Base + cp) % Mod
        j += Character.charCount(cp)
      }
      acc
    }
    val grams = ws.sliding(n).map(_.mkString(" ")).toArray
    val keys = grams.map(hashOf)
    val firstAt = scala.collection.mutable.Map[Long, Int]()
    keys.zipWithIndex.foreach { case (k, i) =>
      if (!firstAt.contains(k)) firstAt(k) = i }
    val counts = keys.groupBy(identity).view.mapValues(_.length).toMap
    var covered = 0L
    var prevEnd = 0L
    keys.zipWithIndex.foreach { case (k, i) =>
      if (counts(k) > 1 && firstAt(k) != i) {
        val a = math.max(starts(i), prevEnd)
        val b = starts(i) + grams(i).codePointCount(0, grams(i).length)
        if (b > a) { covered += b - a; prevEnd = b }
      }
    }
    covered
  }

  test("workspace high-water release: a pathological doc then a small one, both exact") {
    // > 64k words grows the gram tables past ShrinkCapacity; the next
    // row must still compute exactly on the reallocated workspace
    val big = (0 until 70000).map(i => s"w${i % 60000}").mkString(" ")
    val small = {
      val phrase = (1 to 10).map(i => s"p$i").mkString(" ")
      s"$phrase start filler one two three $phrase"
    }
    val rows = Seq(big, small).toDF("text")
      .coalesce(1) // same task -> same thread-local workspace, in order
      .select(graft.functions.repetition_stats(col("text")).as("r"))
      .collect().map(_.getSeq[Long](0))
    (5 to 10).foreach { n =>
      assert(rows(0)(9 + n - 5) == coveredSpanHashed(big, n), s"big dup$n")
      assert(rows(1)(9 + n - 5) == coveredSpan(small, n), s"small dup$n")
    }
  }
}
