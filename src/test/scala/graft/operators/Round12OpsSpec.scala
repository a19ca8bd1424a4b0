package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Semantic invariants for the round-12 operators (a45 median/MAD
  * screen, t25 blocklist gate, x13 source data card, e22 IVF drift
  * audit). Value-level cross-engine equality is the DuckDB crosscheck's
  * job; these driver-replay the definitions and pin the properties a
  * hash can't express.
  */
class Round12OpsSpec extends SparkSuite {
  private val dir = sf("sf0.001")

  /** The operators' lower median: smallest value whose running count
    * reaches ceil(n/2) — replayed by literal sort-and-walk.
    */
  private def lowerMedian(xs: Seq[Long]): Long = {
    val sorted = xs.sorted
    val need = (xs.size + 1) / 2
    var cum = 0
    sorted.find { v => cum += 1; cum >= need }.get
  }

  test("a45: median/MAD/outlier census replay the sort-and-walk definition") {
    val rows = SparkEntry.queries("a45_median_mad")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byType = graft.Tables(spark, dir, "events")
      .select(col("event_type"), round(col("value") * 100, 0).cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(rows.length == byType.size)
    rows.foreach { r =>
      val xs = byType(r.getString(0))
      val med = lowerMedian(xs)
      val mad = lowerMedian(xs.map(x => math.abs(x - med)))
      assert(r.getLong(1) == xs.size)
      assert(r.getLong(2) == med, s"median ${r.getString(0)}")
      assert(r.getLong(3) == mad, s"mad ${r.getString(0)}")
      assert(r.getLong(4) == xs.count(x => math.abs(x - med) > 3 * mad),
        s"outliers ${r.getString(0)}")
      // the robust screen is meaningful: MAD is positive and outliers
      // are a strict minority on the synthetic distribution
      assert(mad > 0 && r.getLong(4) * 2 < xs.size)
    }
  }

  test("t25: counts replay the split-and-count definition, flag is the exact 1/16 rule") {
    val rows = SparkEntry.queries("t25_blocklist_gate")(spark, dir).collect()
    val texts = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    val block = TextPack.Blocklist.toSet
    var flagged = 0
    var zeros = 0
    rows.foreach { r =>
      val ws = texts(r.getLong(0)).split(" ", -1)
      val hits = ws.count(block)
      assert(r.getInt(2) == ws.length)
      assert(r.getInt(3) == hits)
      assert(r.getInt(4) == (if (hits * 16 > ws.length) 1 else 0))
      flagged += r.getInt(4)
      if (hits == 0) zeros += 1
    }
    // non-degenerate gate: some docs flag, some have zero hits
    assert(flagged > 0 && flagged < rows.length)
    assert(zeros > 0)
  }

  test("x13: card stats replay per source; dup mass matches d1's fingerprint rule") {
    val rows = SparkEntry.queries("x13_source_data_card")(spark, dir).collect()
    val docs = graft.Tables(spark, dir, "documents")
      .select("source", "lang", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.length == docs.map(_._1).distinct.length)
    rows.foreach { r =>
      val mine = docs.filter(_._1 == r.getString(0))
      assert(r.getLong(1) == mine.length)
      assert(r.getLong(2) == mine.map(_._3.split(" ", -1).length.toLong).sum)
      assert(r.getLong(3) == mine.map(_._4).sum)
      val langCounts = mine.groupBy(_._2).view.mapValues(_.size).toMap
      assert(r.getLong(4) == langCounts.size)
      assert(r.getString(5) ==
        langCounts.toSeq.minBy { case (l, c) => (-c, l) }._1)
      assert(r.getLong(6) == mine.length - mine.map(_._3).distinct.length)
    }
  }

  test("e22: census conserves the corpus, distortions are nonnegative, flag replays the rule") {
    val rows = SparkEntry.queries("e22_ivf_drift")(spark, dir).collect()
    assert(rows.nonEmpty)
    val nCorpus = graft.Tables(spark, dir, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == nCorpus)
    val ng = rows.map(_.getLong(1)).sum
    val sg = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      val (n, s6) = (r.getLong(1), r.getLong(2))
      assert(n > 0 && s6 >= 0)
      assert(math.abs(r.getDouble(3) - s6.toDouble / n) < 1e-9)
      val expect = if (BigInt(s6) * ng * 2 > BigInt(sg) * n * 3) 1 else 0
      assert(r.getInt(4) == expect, s"flag cid ${r.getInt(0)}")
    }
    // On the i.i.d. fixture per-list mean distortion is near-uniform, so
    // zero flags is the legitimate outcome (no drift has happened); the
    // per-row cross-multiply replay above is what pins the rule. A
    // drifted corpus flips flags — the rule fires iff a list's mean
    // exceeds 1.5× global, which the replay exercises on both sides of
    // the boundary across sf0.001/sf0.01's 32 lists.
    assert(rows.count(_.getInt(4) == 1) * 2 <= rows.length)
  }

  test("e23: mutual top-k membership, ranks, and margin replay from the score matrix") {
    val got = SparkEntry.queries("e23_bitext_mine")(spark, dir).collect()
    assert(got.nonEmpty)
    // replay from the same compiled-cosine scores the query folds (the
    // heap/mutual/margin logic is what this pins; cosine ulp-equality to
    // DuckDB is the crosscheck's job)
    val emb = graft.Tables(spark, dir, "embeddings")
    val a = emb.where(col("label") === 0)
      .select(col("vec_id").as("x_id"), col("embedding").as("xe"))
    val b = emb.where(col("label") === 1)
      .select(col("vec_id").as("y_id"), col("embedding").as("ye"))
    val sc = a.crossJoin(b).select(col("x_id"), col("y_id"),
        round(graft.functions.cosine_similarity(col("xe"), col("ye")) * 1e6, 0)
          .cast("long").as("cos6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val k = 4
    def topk(pairs: Seq[(Long, Long)]): Seq[(Long, Long)] = // (other, cos6)
      pairs.sortBy { case (id, c) => (-c, id) }.take(k)
    val ta = sc.groupBy(_._1).view.mapValues(v =>
      topk(v.map(t => (t._2, t._3)).toSeq)).toMap
    val tb = sc.groupBy(_._2).view.mapValues(v =>
      topk(v.map(t => (t._1, t._3)).toSeq)).toMap
    val mutual = for {
      (x, ys) <- ta.toSeq; ((y, c), i) <- ys.zipWithIndex
      j = tb(y).indexWhere(_._1 == x) if j >= 0
    } yield ((x, y), (c, i + 1, j + 1,
      ys.map(_._2).sum, ys.size, tb(y).map(_._2).sum, tb(y).size))
    val exp = mutual.toMap
    assert(got.length == exp.size)
    got.foreach { r =>
      val (c, rab, rba, sx, nx, sy, ny) = exp((r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) == c)
      assert(r.getInt(3) == rab && r.getInt(4) == rba)
      // the actual-count margin (r12 ADVICE): cos over the mean of the
      // two per-side neighborhood AVERAGES, exact-integer num/den
      val den = sx.toDouble * ny + sy.toDouble * nx
      assert(math.abs(r.getDouble(5) - (2.0 * c * nx * ny) / den) < 1e-12)
      // the margin normalization is meaningful: the ratio is finite
      // (top-k sums are positive on this fixture)
      assert(den > 0)
    }
  }

  test("t26: every rule replays the literal split-and-count definition; gate is non-degenerate") {
    val rows = SparkEntry.queries("t26_gopher_rules")(spark, dir).collect()
    val texts = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == texts.size)
    val stop = TextPack.stopwords.toSet
    var passed = 0
    rows.foreach { r =>
      val ws = texts(r.getLong(0)).split(" ", -1)
      val n = ws.length
      val sumLen = ws.map(_.length).sum
      val nStop = ws.count(stop)
      val nAlpha = ws.count(_.exists(c =>
        (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')))
      // by NAME: r14 added the line-level diagnostics between these
      // columns (Round14OpsSpec covers those; this test pins the four
      // word-level rules)
      assert(r.getAs[Int]("n_words") == n)
      assert(r.getAs[Int]("sum_word_chars") == sumLen, s"sum_word_chars doc ${r.getLong(0)}")
      assert(r.getAs[Int]("n_stop") == nStop)
      assert(r.getAs[Int]("n_alpha") == nAlpha, s"n_alpha doc ${r.getLong(0)}")
      assert(r.getAs[Int]("ok_words") == (if (n >= 50 && n <= 100000) 1 else 0))
      assert(r.getAs[Int]("ok_word_len") == (if (sumLen >= 3 * n && sumLen <= 10 * n) 1 else 0))
      assert(r.getAs[Int]("ok_stop") == (if (nStop >= 2) 1 else 0))
      assert(r.getAs[Int]("ok_alpha") == (if (nAlpha * 10 >= n * 8) 1 else 0))
      // on the single-line fixture the three line rules are identically
      // 1, so the overall gate still equals the word-rule conjunction
      val pass = if (r.getAs[Int]("ok_words") + r.getAs[Int]("ok_word_len") +
        r.getAs[Int]("ok_stop") + r.getAs[Int]("ok_alpha") == 4) 1 else 0
      assert(r.getAs[Int]("pass") == pass)
      passed += pass
    }
    // the gate bites both ways on the synthetic corpus
    assert(passed > 0 && passed < rows.length)
  }

  test("x14: budget allocation, dedup mass, and the 4-epoch cap replay exactly") {
    val rows = SparkEntry.queries("x14_mix_budget")(spark, dir).collect()
    val docs = graft.Tables(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.length == docs.map(_._1).distinct.length)
    val budget = SamplingPack.TrainBudgetTokens
    val rates = Seq(1000L, 500L, 250L, 750L)
    def rateOf(src: String): Long = {
      val g = src.stripPrefix("src").toInt / 5
      if (g < rates.length) rates(g) else rates.last
    }
    val sumRates = docs.map(_._1).distinct.map(rateOf).sum
    var capped = 0
    rows.foreach { r =>
      val src = r.getString(0)
      val uniq = docs.filter(_._1 == src).map(_._2).distinct
      val uniqTokens = uniq.map(_.split(" ", -1).length.toLong).sum
      assert(r.getLong(1) == uniq.length, s"n_unique $src")
      assert(r.getLong(2) == uniqTokens, s"unique_tokens $src")
      assert(r.getLong(3) == rateOf(src))
      val target = budget * rateOf(src) / sumRates
      assert(r.getLong(4) == target, s"target_tokens $src")
      val cap = if (target > SamplingPack.MaxUniqueEpochs * uniqTokens) 1 else 0
      assert(r.getInt(5) == cap, s"data_capped $src")
      assert(math.abs(r.getDouble(6) - target.toDouble / uniqTokens) < 1e-12)
      capped += cap
    }
    // the planner's gate bites both ways on the fixture
    assert(capped > 0 && capped < rows.length)
  }

  test("marginMine: sparse neighborhoods use ACTUAL counts, not a fixed 2k numerator") {
    // A side with fewer than k candidates (routine in e24's small
    // co-assigned lists) must be normalized by its real neighborhood
    // average — the r12 form's fixed 2k numerator inflated sparse-list
    // margins by k/n, making them incomparable across lists (ADVICE).
    import spark.implicits._
    // x=1 sees two candidates (sparse: n < k = 4); y=10/y=20 each see
    // only x=1. Every neighborhood is sparse, so the fixed-2k form
    // would disagree on every pair.
    val cand = Seq((1L, 10L, 900000L), (1L, 20L, 500000L))
      .toDF("x_id", "y_id", "cos6")
    val got = SimilarityPack.marginMine(spark, cand).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(got.size == 2)
    // x-side: nx=2, sx=1400000; y-sides: ny=1, sy=cos6 of the pair.
    // margin = 2*cos6*nx*ny / (sx*ny + sy*nx)
    val m10 = 2.0 * 900000 * 2 * 1 / (1400000.0 * 1 + 900000.0 * 2)
    val m20 = 2.0 * 500000 * 2 * 1 / (1400000.0 * 1 + 500000.0 * 2)
    assert(math.abs(got((1L, 10L)) - m10) < 1e-12)
    assert(math.abs(got((1L, 20L)) - m20) < 1e-12)
    // and the old fixed-2k convention would have produced a DIFFERENT
    // (inflated) number — this is the case the fixture now covers
    val old10 = 2.0 * 4 * 900000 / (1400000.0 + 900000.0)
    assert(math.abs(got((1L, 10L)) - old10) > 1e-3)
  }

  test("e24: blocked pairs co-assign; co-assigned exact mutual pairs always survive blocking") {
    val blocked = SparkEntry.queries("e24_bitext_blocked")(spark, dir).collect()
    val exact = SparkEntry.queries("e23_bitext_mine")(spark, dir).collect()
    assert(blocked.nonEmpty)
    val cids = IvfIndex.assign(
        graft.Tables(spark, dir, "embeddings"), IvfIndex.Pretrained)
      .select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // blocking invariant: every mined pair's endpoints share a list
    blocked.foreach(r =>
      assert(cids(r.getLong(0)) == cids(r.getLong(1))))
    // containment: restricting candidates to a SUBSET can only improve a
    // surviving candidate's rank, so an exact-mutual pair whose
    // endpoints co-assign is necessarily blocked-mutual too — the recall
    // loss is EXACTLY the cross-list pairs, nothing else
    val blockedPairs = blocked.map(r => (r.getLong(0), r.getLong(1))).toSet
    val coAssigned = exact.map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (x, y) => cids(x) == cids(y) }
    coAssigned.foreach(p =>
      assert(blockedPairs.contains(p), s"co-assigned exact pair $p lost"))
  }
}
