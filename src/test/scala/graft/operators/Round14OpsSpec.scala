package graft.operators

import graft.{SparkEntry, SparkSuite}

/** Semantic invariants for the round-14 operators. Value-level
  * cross-engine equality is the DuckDB crosscheck's job; these
  * driver-replay the definitions from raw fixture rows and pin the
  * properties a hash can't express.
  */
class Round14OpsSpec extends SparkSuite {
  private val dir = sf("sf0.001")

  test("x15: water-filling replays to fixpoint; conservation exact; the cascade bites") {
    val rows = SparkEntry.queries("x15_budget_rebalance")(spark, dir).collect()
    val docs = graft.Tables(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sources = docs.map(_._1).distinct.sorted
    assert(rows.length == sources.length)

    // Independent replay: run the STATED rules (clamp at 4×unique;
    // floor shares by rate; remainder to the lowest-named uncapped
    // source; iterate) with a true fixpoint loop — no fixed round
    // count — over BigInt, from the raw documents.
    val budget = BigInt(SamplingPack.TrainBudgetTokens)
    val rates = Seq(1000L, 500L, 250L, 750L)
    def rateOf(src: String): Long = {
      val g = src.stripPrefix("src").toInt / 5
      if (g < rates.length) rates(g) else rates.last
    }
    val uniqTokens = sources.map { s =>
      s -> docs.filter(_._1 == s).map(_._2).distinct
        .map(_.split(" ", -1).length.toLong).sum
    }.toMap
    val sumRates = BigInt(sources.map(rateOf).sum)
    val target = sources.map(s => s -> (budget * rateOf(s) / sumRates)).toMap
    val cap = sources.map(s => s -> BigInt(4L * uniqTokens(s))).toMap
    var alloc = target
    var capped = Set.empty[String]
    var pool = budget - target.values.sum
    var changed = true
    var guard = 0
    while (changed && guard < 100) {
      changed = false
      sources.foreach { s =>
        if (alloc(s) > cap(s)) { pool += alloc(s) - cap(s); alloc += s -> cap(s); changed = true }
        if (alloc(s) >= cap(s) && !capped(s)) { capped += s; changed = true }
      }
      val un = sources.filterNot(capped)
      val ur = BigInt(un.map(rateOf).sum)
      if (ur > 0 && pool > 0) {
        var dist = BigInt(0)
        un.foreach { s =>
          val add = pool * rateOf(s) / ur
          alloc += s -> (alloc(s) + add); dist += add
        }
        alloc += un.head -> (alloc(un.head) + (pool - dist))
        pool = BigInt(0)
        changed = true
      }
      guard += 1
    }
    assert(guard < 100, "independent replay did not converge")

    val unallocs = rows.map(_.getLong(10)).distinct
    assert(unallocs.length == 1, "unalloc_tokens must be one global value")
    // exact budget conservation: Σ final + unallocated == budget
    assert(BigInt(rows.map(_.getLong(6)).sum) + unallocs.head == budget)

    var realloc = 0
    var cascade = 0
    rows.foreach { r =>
      val s = r.getString(0)
      assert(BigInt(r.getLong(4)) == target(s), s"target $s (x14 parity)")
      assert(BigInt(r.getLong(5)) == cap(s), s"cap $s")
      assert(BigInt(r.getLong(6)) == alloc(s), s"final $s (independent replay)")
      // fixpoint: nothing above cap; capped flag ⇔ at cap
      assert(r.getLong(6) <= r.getLong(5), s"over cap $s")
      assert((r.getInt(7) == 1) == (r.getLong(6) == r.getLong(5)), s"capped flag $s")
      assert((r.getInt(8) == 1) == (r.getLong(6) > r.getLong(4)), s"realloc flag $s")
      // an uncapped source never LOST tokens
      if (r.getInt(7) == 0) assert(r.getLong(6) >= r.getLong(4), s"uncapped lost $s")
      assert(math.abs(r.getDouble(9) -
        r.getLong(6).toDouble / r.getLong(2).toDouble) < 1e-12)
      realloc += r.getInt(8)
      cascade += (if (r.getInt(7) == 1 && r.getInt(8) == 1) 1 else 0)
    }
    // the verdict's requirement: ≥ 1 reallocation actually occurs
    assert(realloc > 0, "fixture must exercise reallocation")
    // and the MULTI-round cascade: some source RECEIVED tokens and then
    // hit its own cap (src16/src19 on this fixture)
    assert(cascade > 0, "fixture must exercise the clamp-after-receive cascade")
    // both flag values present (the planning gate bites both ways)
    val nCapped = rows.count(_.getInt(7) == 1)
    assert(nCapped > 0 && nCapped < rows.length)
  }

  test("x16: realizes x15's plan — budget respected per source, shortfall < one doc, prefix rule replays") {
    val rows = SparkEntry.queries("x16_rebalanced_sample")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val plan = SparkEntry.queries("x15_budget_rebalance")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(6))).toMap // unique, final
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // independent dedup: keep the min doc_id per (source, text)
    val uniqueDocs = docs.groupBy(d => (d._2, d._3)).values
      .map(_.minBy(_._1)).toSeq
    assert(rows.map(_._1).toSet == uniqueDocs.map(_._1).toSet ||
      rows.length < uniqueDocs.length, "output must be (a subset of) the unique representatives")
    var partialSeen = 0
    plan.foreach { case (src, (unique, fin)) =>
      val mine = rows.filter(_._2 == src)
      val full = fin / unique
      val rem = fin % unique
      // n_repeats ∈ {full, full+1}; realized ≤ final; shortfall < one doc
      mine.foreach { m => assert(m._4 == full || m._4 == full + 1, s"$src n_repeats ${m._4}") }
      val realized = mine.map(m => m._3 * m._4).sum
      assert(realized <= fin, s"$src realized $realized > final $fin")
      val srcUnique = uniqueDocs.filter(_._2 == src)
      if (full >= 1) assert(mine.length == srcUnique.length, s"$src full epochs must keep every unique doc")
      val maxDoc = srcUnique.map(_._3.split(" ", -1).length.toLong).max
      assert(fin - realized < maxDoc, s"$src shortfall ${fin - realized} >= one doc ($maxDoc)")
      // the partial prefix replays the salted-hash order
      val md = java.security.MessageDigest.getInstance("MD5")
      def hh(id: Long): String = {
        md.reset()
        md.digest(s"real:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      val ordered = srcUnique.map(d => (d._1, d._3.split(" ", -1).length.toLong))
        .sortBy { case (id, _) => (hh(id), id) }
      var cum = 0L
      val prefix = ordered.takeWhile { case (_, nt) => cum += nt; cum <= rem }.map(_._1).toSet
      val gotPrefix = mine.filter(_._4 == full + 1).map(_._1).toSet
      assert(gotPrefix == prefix, s"$src partial-epoch prefix mismatch")
      if (prefix.nonEmpty && prefix.size < srcUnique.length) partialSeen += 1
    }
    // the fixture exercises a real partial epoch (not all-or-nothing)
    assert(partialSeen > 0, "no source exercised a genuine partial-epoch prefix")
    // and the cap holds end to end: nobody repeats past MaxUniqueEpochs
    assert(rows.forall(_._4 <= SamplingPack.MaxUniqueEpochs))
  }

  test("x17: both phases replay a BigInt two-phase water-fill; the carryover cap binds; the anneal tilt is measured quality") {
    val rows = SparkEntry.queries("x17_anneal_schedule")(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(2)),
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
          r.getInt(9), r.getInt(10), r.getLong(11), r.getLong(12)))).toMap
    val docs = graft.Tables(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sources = docs.map(_._1).distinct.sorted
    assert(rows.size == 2 * sources.length)

    // main phase: the x1 policy restated literally (the x15 test's
    // convention)
    def rateOf(tbl: Seq[Int])(src: String): Long = {
      val g = src.stripPrefix("src").toInt / 5
      (if (g < tbl.length) tbl(g) else tbl.last).toLong
    }
    // anneal phase: the STATED quality derivation replayed
    // independently — per-source t26 pass counts from the factored gate
    // frame (the r14 discipline), integer qscore, (qscore DESC, source)
    // rank, rank-quartile tiers, the tier table restated literally.
    val passBySrc = {
      val gr = TextPack.gopherRules(
          graft.Tables(spark, dir, "documents"), carry = Seq("source"))
        .select("source", "pass").collect()
        .map(r => (r.getString(0), r.getInt(1)))
      sources.map { s =>
        val mine = gr.filter(_._1 == s)
        s -> (mine.length.toLong, mine.map(_._2.toLong).sum)
      }.toMap
    }
    val qscore = passBySrc.map { case (s, (n, p)) => s -> p * 1000000L / n }
    val tierRates = Seq(1600L, 400L, 150L, 50L)
    val annealRate = sources.sortBy(s => (-qscore(s), s)).zipWithIndex
      .map { case (s, r) => s -> tierRates(r * 4 / sources.length) }.toMap
    val uniqTokens = sources.map { s =>
      s -> BigInt(docs.filter(_._1 == s).map(_._2).distinct
        .map(_.split(" ", -1).length.toLong).sum)
    }.toMap
    // independent replay: the STATED two-phase rules — phase caps are
    // the run cap minus what earlier phases allocated; each phase is
    // the x15 fixpoint (clamp; floor shares by rate over uncapped;
    // remainder to the lowest-named uncapped source)
    def fill(budget: BigInt, rate: Map[String, Long],
        cap: Map[String, BigInt]): (Map[String, BigInt], BigInt) = {
      val target = {
        val sr = BigInt(sources.map(rate).sum)
        sources.map(s => s -> budget * rate(s) / sr).toMap
      }
      var alloc = target
      var capped = Set.empty[String]
      var pool = budget - target.values.sum
      var guard = 0
      var changed = true
      while (changed && guard < 100) {
        changed = false
        sources.foreach { s =>
          if (alloc(s) > cap(s)) { pool += alloc(s) - cap(s); alloc += s -> cap(s); changed = true }
          if (alloc(s) >= cap(s) && !capped(s)) { capped += s; changed = true }
        }
        val un = sources.filterNot(capped)
        val ur = BigInt(un.map(rate).sum)
        if (ur > 0 && pool > 0) {
          var dist = BigInt(0)
          un.foreach { s =>
            val add = pool * rate(s) / ur
            alloc += s -> (alloc(s) + add); dist += add
          }
          alloc += un.head -> (alloc(un.head) + (pool - dist))
          pool = BigInt(0)
          changed = true
        }
        guard += 1
      }
      assert(guard < 100, "x17 replay did not converge")
      (alloc, pool)
    }
    val runCap = sources.map(s => s -> uniqTokens(s) * SamplingPack.MaxUniqueEpochs).toMap
    // the x1 Rates policy, restated literally (the x15 test's convention)
    val mainRates = Seq(1000, 500, 250, 750)
    val (mainAlloc, mainPool) = fill(BigInt(SamplingPack.MainBudgetTokens),
      sources.map(s => s -> rateOf(mainRates)(s)).toMap, runCap)
    val annealCap = sources.map(s => s -> (runCap(s) - mainAlloc(s))).toMap
    val (annAlloc, annPool) = fill(BigInt(SamplingPack.AnnealBudgetTokens),
      annealRate, annealCap)

    sources.foreach { s =>
      val m = rows(("main", s)); val a = rows(("anneal", s))
      assert(m._2 == rateOf(mainRates)(s), s"main rate $s (x1 policy)")
      assert(a._2 == annealRate(s), s"anneal rate $s (quality derivation)")
      assert(BigInt(m._5) == mainAlloc(s), s"main final $s")
      assert(BigInt(m._4) == runCap(s), s"main cap $s")
      assert(BigInt(a._4) == annealCap(s), s"anneal cap = carryover $s")
      assert(BigInt(a._5) == annAlloc(s), s"anneal final $s")
      // THE invariant the carryover exists for: cumulative ≤ run cap
      assert(BigInt(a._9) == mainAlloc(s) + annAlloc(s) &&
        BigInt(a._9) <= runCap(s), s"cum cap $s")
      assert(BigInt(m._8) == mainPool && BigInt(a._8) == annPool, s"pools $s")
    }
    // per-phase conservation: Σ final + unallocated = phase budget
    assert(sources.map(mainAlloc).sum + mainPool ==
      BigInt(SamplingPack.MainBudgetTokens))
    assert(sources.map(annAlloc).sum + annPool ==
      BigInt(SamplingPack.AnnealBudgetTokens))
    // the fixture exercises the carryover: some source enters the
    // anneal with NOTHING left, and some source receives then caps
    assert(sources.exists(s => annealCap(s) == 0), "no fully-consumed source")
    assert(sources.exists { s =>
      rows(("anneal", s))._6 == 1 && rows(("anneal", s))._7 == 1
    }, "no anneal clamp-after-receive cascade")
    // the tilt is MEASURED quality, not a named group: the best-ranked
    // source carries the top tier rate, the worst the bottom, and rates
    // never increase as measured quality falls
    val ranked = sources.sortBy(s => (-qscore(s), s))
    assert(annealRate(ranked.head) == tierRates.head, "top source must get the top tier")
    assert(annealRate(ranked.last) == tierRates.last, "bottom source must get the tail tier")
    ranked.sliding(2).foreach { pair =>
      val (hi, lo) = (pair(0), pair(1))
      assert(annealRate(hi) >= annealRate(lo), s"tier monotonicity $hi vs $lo")
    }
    // all four tiers present on this fixture (the mapping bites)
    assert(sources.map(annealRate).toSet == tierRates.toSet)
    // a QUALITY SHIFT MOVES THE ANNEAL SHARE (the r14 verdict's pin):
    // lift the measured-worst source's qscore above everyone, re-derive
    // rates through the production mapping, and its water-fill target
    // strictly rises
    val worst = ranked.last
    val shifted = sources.map(s =>
      s -> (if (s == worst) qscore.values.max + 1 else qscore(s)))
    val before = SamplingPack.annealRatesOf(sources.map(s => s -> qscore(s)))
    val after = SamplingPack.annealRatesOf(shifted)
    assert(after(worst) == tierRates.head && before(worst) == tierRates.last)
    def targetOf(rates: Map[String, Long], s: String): BigInt =
      BigInt(SamplingPack.AnnealBudgetTokens) * rates(s) / rates.values.sum
    assert(targetOf(after, worst) > targetOf(before, worst),
      "a quality shift must move the anneal target share")
  }

  test("t26 line rules: counts replay the split-lines definition and each rule bites on planted rows") {
    import spark.implicits._
    // The shared corpus is single-line prose, so the line-level rules
    // pass trivially there (the hash check pins the arithmetic); the
    // BITE is proven here on planted multiline rows, one per failure
    // mode plus the edge cases of the replace-and-measure trick.
    val w40 = Seq.fill(40)("the word list goes on").mkString(" ") // filler words
    val planted = Seq(
      // every line a bullet (mixed prefixes; first line exercises the
      // startswith path) → bullet fraction 100 % > 90 %
      1L -> (1 to 10).map(i => s"- bullet $i item").mkString("\n")
        .replaceFirst("- bullet 2", "* bullet 2")
        .replaceFirst("- bullet 3", "• bullet 3"),
      // 4 of 10 lines end with an ellipsis (both spellings; last line
      // exercises the endswith path; '....'  still ONE ellipsis line)
      2L -> ((1 to 6).map(i => s"plain line $i") ++
        Seq("trailing dots...", "unicode mark…", "four dots....", "final...")).mkString("\n"),
      // symbol-heavy: hashes > 10 % of words
      3L -> "# # # heading with many hash marks here",
      // ellipsis MARKS > 10 % of words (inline, not line-ends)
      4L -> "some... words... with... many... inline... marks here now",
      // multiline doc that passes every line rule (1 bullet of 12
      // lines, 1 ellipsis line, no symbols)
      5L -> (Seq("- one bullet", "middle line ends clean", "dotty but fine...") ++
        (1 to 9).map(i => s"line $i $w40")).mkString("\n"))
    val got = TextPack.gopherRules(planted.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // independent replay: split-lines definition, per planted row
    def nonOverlapCount(s: String, pat: String): Int = {
      var i = 0; var n = 0
      while ({ val j = s.indexOf(pat, i); j >= 0 && { n += 1; i = j + pat.length; true } }) ()
      n
    }
    val prefixes = Seq("- ", "* ", "• ")
    val marks = Seq("...", "…")
    planted.foreach { case (id, text) =>
      val r = got(id)
      val lines = text.split("\n", -1)
      assert(r.getInt(5) == lines.length, s"n_lines $id")
      assert(r.getInt(6) == lines.count(l => prefixes.exists(l.startsWith)),
        s"n_bullet_lines $id")
      assert(r.getInt(7) == lines.count(l => marks.exists(l.endsWith)),
        s"n_ellipsis_lines $id")
      assert(r.getInt(8) == text.count(_ == '#'), s"n_hash $id")
      assert(r.getInt(9) == marks.map(nonOverlapCount(text, _)).sum,
        s"n_ellipsis_marks $id")
    }
    // each rule bites exactly where planted
    assert(got(1L).getAs[Int]("ok_bullet") == 0)
    assert(got(2L).getAs[Int]("ok_ellipsis") == 0)
    assert(got(3L).getAs[Int]("ok_symbol") == 0)
    assert(got(4L).getAs[Int]("ok_symbol") == 0)
    Seq("ok_bullet", "ok_ellipsis", "ok_symbol").foreach { c =>
      assert(got(5L).getAs[Int](c) == 1, s"doc 5 $c")
    }
    // and doc 2's '....' line counted once, its unicode mark once
    assert(got(2L).getAs[Int]("n_ellipsis_lines") == 4)
  }

  test("t27: counters replay an independent string-grouped definition; each rule family bites on planted rows") {
    import spark.implicits._
    // The shared corpus is single-line prose with no repeated ≥5-grams,
    // so the line/paragraph and dup-gram rules pass trivially THERE (the
    // hash check pins the arithmetic; the sf0.01 fixture does exercise
    // the top-2/3/4 rules). Here: planted rows per failure mode, counters
    // replayed by grouping actual STRINGS — independent of the kernel's
    // poly-hash keying and extending-fold construction.
    val longLine = (1 to 60).map(i => s"unique word number $i").mkString(" ")
    val planted = Seq(
      // 5 copies of a short line among 6 long unique ones: dup-line
      // FRACTION 4/11 > 30 % bites, dup-line CHARS (4 chars) passes
      1L -> ((1 to 6).map(i => s"long unique line $i $longLine") ++ Seq.fill(5)("x"))
        .mkString("\n"),
      // 2 copies of one very long line among 9 short unique ones: 1/11
      // dup fraction passes, dup CHARS > 20 % bites
      2L -> (Seq(longLine, longLine) ++ (1 to 9).map(i => s"s $i")).mkString("\n"),
      // duplicated PARAGRAPHS (multi-line, separated by blank lines):
      // 3 copies of a two-line para among 4 unique paras → 2/7 ≈ 29 %
      // passes the fraction but the copies are long → para CHARS bite
      3L -> (Seq.fill(3)("para line one\npara line two") ++
        (1 to 4).map(i => s"u $i")).mkString("\n\n"),
      // one 2-gram claims most of the doc: top2 (and top3/top4) bite
      4L -> Seq.fill(30)("spam ham").mkString(" "),
      // a 10-word phrase repeated twice in an otherwise-unique doc:
      // every dup-n rule n = 5..10 bites (subgrams of the repeat), the
      // doc is short enough that 2·phrase > 15 % of chars
      5L -> {
        val phrase = (1 to 10).map(i => s"p$i").mkString(" ")
        s"$phrase start filler one two three $phrase"
      },
      // a long multiline doc passing EVERY rule — every word unique
      // (words split on SPACE only, so a line's last word glues to the
      // next line's first through the '\n': still unique here)
      6L -> (1 to 12).map(i => s"aa$i bb$i cc$i dd$i ee$i ff$i").mkString("\n"))
    val got = TextPack.repetitionRules(planted.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap

    def groupDup(segs: Seq[String]): (Long, Long, Long) = {
      val byKey = segs.groupBy(identity).view.mapValues(_.size.toLong)
      val dups = byKey.values.filter(_ > 1).map(_ - 1).sum
      val dupChars = byKey.collect {
        case (s, c) if c > 1 => (c - 1) * s.length }.sum
      (segs.length.toLong, dups, dupChars)
    }
    planted.foreach { case (id, text) =>
      val r = got(id)
      assert(r.getLong(1) == text.length.toLong, s"len $id")
      val (nl, dl, dlc) = groupDup(text.split("\n", -1).toSeq)
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((nl, dl, dlc)), s"lines $id")
      val (np, dp, dpc) = groupDup(text.split("\n\n", -1).toSeq)
      assert((r.getLong(5), r.getLong(6), r.getLong(7)) == ((np, dp, dpc)), s"paras $id")
      val ws = text.split(" ", -1)
      // char offset where word i starts (words glue back with 1 space)
      val wordStart = ws.scanLeft(0)((acc, w2) => acc + w2.length + 1)
      for (n <- 2 to 10) {
        val grams = ws.sliding(n).filter(_.length == n)
          .map(_.mkString(" ")).toSeq
        val byG = grams.groupBy(identity).view.mapValues(_.size.toLong)
        if (n <= 4) {
          val top = if (byG.isEmpty) 0L
            else byG.map { case (g, c) => c * g.length }.max
          assert(r.getAs[Long](s"top${n}_chars") == top, s"top$n $id")
        } else {
          // covered-span replay of the stated dup definition: every
          // occurrence of a repeated gram except the gram's FIRST
          // occurrence contributes its char span; spans are unioned
          // (overlaps counted once)
          val firstAt = scala.collection.mutable.Map[String, Int]()
          grams.zipWithIndex.foreach { case (g, i) =>
            if (!firstAt.contains(g)) firstAt(g) = i }
          val counts = byG.toMap
          var covered = 0L
          var prevEnd = 0
          grams.zipWithIndex.foreach { case (g, i) =>
            if (counts(g) > 1 && firstAt(g) != i) {
              val a = math.max(wordStart(i), prevEnd)
              val b = wordStart(i) + g.length
              if (b > a) { covered += b - a; prevEnd = b }
            }
          }
          assert(r.getAs[Long](s"dup${n}_chars") == covered, s"dup$n $id")
        }
      }
    }
    // each family bites exactly where planted
    assert(got(1L).getAs[Int]("ok_dup_lines") == 0, "doc1 line fraction")
    assert(got(1L).getAs[Int]("ok_dup_line_chars") == 1, "doc1 line chars must pass")
    assert(got(2L).getAs[Int]("ok_dup_lines") == 1, "doc2 line fraction must pass")
    assert(got(2L).getAs[Int]("ok_dup_line_chars") == 0, "doc2 line chars")
    assert(got(3L).getAs[Int]("ok_dup_paras") == 1, "doc3 para fraction must pass")
    assert(got(3L).getAs[Int]("ok_dup_para_chars") == 0, "doc3 para chars")
    Seq("ok_top2", "ok_top3", "ok_top4").foreach { c =>
      assert(got(4L).getAs[Int](c) == 0, s"doc4 $c") }
    (5 to 10).foreach { n =>
      assert(got(5L).getAs[Int](s"ok_dup$n") == 0, s"doc5 ok_dup$n") }
    val flagCols = got(6L).schema.fieldNames.filter(_.startsWith("ok_"))
    flagCols.foreach { c => assert(got(6L).getAs[Int](c) == 1, s"doc6 $c") }
    assert(got(6L).getAs[Int]("pass") == 1 && got(5L).getAs[Int]("pass") == 0)
  }

  test("t28: kernel replays an independent line-filter definition; every rule bites on planted pages") {
    import spark.implicits._
    // The crosscheck pins the constructed-page path at both SFs; here raw
    // PAGES are planted straight into the gate (no construction) — one
    // per drop rule, each replayed against an independent split/filter.
    val pages = Seq(
      // mixed line outcomes: keep ('.', '!', '"'), drop (no terminal
      // punct), drop (< 5 words despite punct), drop (javascript in
      // mixed case despite punct + words)
      1L -> Seq(
        "this line has five words.",
        "this line has no terminal punctuation at all",
        "too short.",
        "enable JavaScript to view this page.",
        "an exclamation with enough words here!",
        "a fifth sentence with plenty of words.",
        "the final sentence rounds things out.",
        "he said the words \"yes it works.\"").mkString("\n"),
      // lorem ipsum page marker (mixed case), otherwise clean
      2L -> "the first sentence is fine here.\nLoReM IpSuM dolor sit amet.\nthe third sentence is also fine.",
      // brace page marker
      3L -> "a clean looking sentence right here.\nvar x = function() { return 1; }\nanother clean sentence sits here.\nthird clean sentence also sits here.",
      // exactly 4 sentence marks survive → dropped by the ≥ 5 rule
      // (one below the boundary — pins the threshold from below)
      4L -> "first kept sentence with words.\nsecond kept sentence with words!\nthird kept sentence has words too.\nis this a kept question line?\nbut this line has no punctuation",
      // clean page: exactly 5 kept marks (two lines carry two marks
      // each — pins the threshold from above)
      5L -> "what a fine question to ask? indeed.\nand a second line with words too.\nis this enough marks now? yes it is.")
    val got = TextPack.c4Filters(pages.toDF("doc_id", "page"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val terminal = Set('.', '!', '?', '"')
    pages.foreach { case (id, page) =>
      val lines = page.split("\n", -1)
      val kept = lines.filter(l => l.nonEmpty && terminal(l.last) &&
        l.split(" ", -1).length >= 5 &&
        !l.toLowerCase.contains("javascript"))
      val clean = kept.mkString("\n")
      val r = got(id)
      assert(r.getLong(1) == lines.length.toLong, s"n_lines $id")
      assert(r.getLong(2) == kept.length.toLong, s"n_kept $id")
      assert(r.getLong(3) == clean.count(c => c == '.' || c == '!' || c == '?').toLong,
        s"n_sent $id")
      assert(r.getInt(4) == (if (page.toLowerCase.contains("lorem ipsum")) 1 else 0),
        s"has_lorem $id")
      assert(r.getInt(5) == (if (page.contains('{')) 1 else 0), s"has_brace $id")
      assert(r.getString(8) == clean, s"clean_text $id")
      assert(r.getLong(7) == clean.length.toLong, s"clean_len $id")
    }
    // gate bites per plant: 1 passes (5 kept marks), 2 lorem, 3 brace,
    // 4 too few sentences (exactly 4 — one under the ≥ 5 boundary),
    // 5 passes with exactly 5 (the '?'+'.' lines carry two each)
    assert(got(1L).getAs[Int]("kept") == 1)
    assert(got(1L).getAs[Long]("n_kept") == 5L)
    assert(got(2L).getAs[Int]("kept") == 0 && got(2L).getAs[Int]("has_lorem") == 1)
    assert(got(3L).getAs[Int]("kept") == 0 && got(3L).getAs[Int]("has_brace") == 1)
    assert(got(4L).getAs[Int]("kept") == 0 && got(4L).getAs[Long]("n_sent") == 4L)
    assert(got(5L).getAs[Int]("kept") == 1 && got(5L).getAs[Long]("n_sent") == 5L)
  }

  // t29's independent BigInt trainer replay moved to Round15OpsSpec when
  // round 15 widened the feature frame from 3 A1.1 margins to the full
  // 26-verdict canon (r14 verdict #1).
}
