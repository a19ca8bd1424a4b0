package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Semantic invariants for the round-11 corpus operators (t21 top-2-gram
  * share, t22 perplexity-decile gate, e18 range search, x10 token-budget
  * fill). Value-level cross-engine equality is the DuckDB crosscheck's
  * job; these pin the properties a hash can't express — bounds, budget
  * feasibility, equivalence of the two-level fill to its single-window
  * definition, and consistency with the established k-NN results.
  */
class CorpusOpsSpec extends SparkSuite {
  private val dir = sf("sf0.001")

  test("t21: shares are in (0, 1], top_cnt <= n_bigrams, covers all multi-word docs") {
    val rows = SparkEntry.queries("t21_top_ngram_share")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, top, share) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(top >= 1 && top <= n)
      assert(share > 0.0 && share <= 1.0)
      assert(math.abs(share - math.rint(top.toDouble / n * 1e6) / 1e6) < 1e-9)
    }
    val multiWord = graft.Tables(spark, dir, "documents")
      .where(size(split(col("text"), " ")) >= 2).count()
    assert(rows.length == multiWord)
  }

  test("t22: flags at least a decile, boundary-bin inclusive, exactly the low scores") {
    val flagged = SparkEntry.queries("t22_perplexity_gate")(spark, dir).collect()
    val all = TextPack.bigramLmScores(graft.Tables(spark, dir, "documents"))
      .select(col("doc_id"), expr("avgq div 1000000L").as("qkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = all.size
    assert(flagged.length >= (n + 9) / 10, s"${flagged.length} < ceil($n/10)")
    val thr = flagged.map(_.getLong(3)).max
    // the gate is a downward-closed cut: EVERY doc at or below thr is
    // flagged, and none above it
    val below = all.valuesIterator.count(_ <= thr)
    assert(flagged.length == below)
    assert(flagged.forall(r => all(r.getLong(0)) <= thr))
    // removing the boundary bin would undershoot the decile — thr is the
    // SMALLEST key reaching ceil(n/10), not an arbitrary cut
    val strictlyBelow = all.valuesIterator.count(_ < thr)
    assert(strictlyBelow < (n + 9) / 10)
  }

  test("e18: all results within radius, and contains every e1 top-20 hit at >= tau") {
    val range = SparkEntry.queries("e18_range_search")(spark, dir).collect()
    assert(range.nonEmpty)
    range.foreach(r => assert(r.getDouble(1) >= SimilarityPack.RangeTau))
    val rangeIds = range.map(_.getLong(0)).toSet
    assert(rangeIds.size == range.length) // no duplicate vectors
    val top20 = SparkEntry.queries("e1_knn_brute")(spark, dir).collect()
    top20.filter(_.getDouble(1) >= SimilarityPack.RangeTau)
      .foreach(r => assert(rangeIds.contains(r.getLong(0)),
        s"e1 neighbor ${r.getLong(0)} at ${r.getDouble(1)} missing from range"))
  }

  test("x10: two-level fill equals the single-window definition and respects the budget") {
    val kept = SparkEntry.queries("x10_token_budget_mix")(spark, dir).collect()
    assert(kept.nonEmpty)
    // per-source total never exceeds the budget
    kept.groupBy(_.getString(1)).foreach { case (src, rows) =>
      val tot = rows.map(_.getLong(2)).sum
      assert(tot <= SamplingPack.TokenBudget, s"$src: $tot")
      assert(rows.map(_.getLong(3)).max == tot) // cum_tokens is the running fill
    }
    // reference: the direct single-window greedy fill over (q desc, doc_id)
    val d = graft.Tables(spark, dir, "documents").select(
        col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("q"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expect = d.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      var cum = 0L
      // cum runs over ALL docs in fill order (the window's semantics);
      // since every doc has >= 1 token the sum is strictly monotone, so
      // `cum <= B` keeps exactly a prefix — the equivalence under test
      rows.sortBy(r => (-r._4, r._1)).map { r =>
        cum += r._3; (r._1, cum, r._3)
      }.takeWhile(_._2 <= SamplingPack.TokenBudget)
        .map { case (id, c, t) => id -> (c, t) }
    }
    val keptMap = kept.map(r => r.getLong(0) -> (r.getLong(3), r.getLong(2))).toMap
    assert(keptMap == expect.toMap)
  }

  test("t23: scrub removes exactly the hot-gram-covered positions (driver replay)") {
    val out = SparkEntry.queries("t23_span_scrub")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    assert(out.size == docs.length) // every doc present, even fully scrubbed
    // gram-string replay of the definition (the engine keys by poly-hash;
    // at P = 1e9+7 over ~16k grams a collision is the only way these can
    // differ, and the oracle's hash replay would catch THAT side)
    def grams(ws: Array[String]): Seq[String] =
      if (ws.length < 3) Seq.empty else ws.sliding(3).map(_.mkString(" ")).toSeq
    val df = docs.flatMap { case (id, ws) => grams(ws).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.length }
    docs.foreach { case (id, ws) =>
      val covered = grams(ws).zipWithIndex.collect {
        case (g, s) if df(g) > TextPack.ScrubMaxDf => Seq(s, s + 1, s + 2)
      }.flatten.toSet
      val clean = ws.zipWithIndex.collect {
        case (w, p) if !covered.contains(p) => w }.mkString(" ")
      val (nWords, nScrubbed, cleanText) = out(id)
      assert(nWords == ws.length, s"doc $id n_words")
      assert(nScrubbed == covered.size, s"doc $id n_scrubbed")
      assert(cleanText == clean, s"doc $id clean_text")
    }
    // the threshold actually bites on this corpus: some docs scrubbed,
    // and short docs (< 3 words, no grams) are never touched
    assert(out.values.exists(_._2 > 0))
    docs.filter(_._2.length < 3).foreach { case (id, ws) =>
      assert(out(id)._3 == ws.mkString(" ")) }
  }

  test("t23: shard mode and the forced shuffle-join hot path are bit-identical to one-pass") {
    // graft.scrub.dfShards partitions the GRAM KEY SPACE and loops —
    // the scratch-bounded form §3d's x10000m ceiling demands. Exactness
    // argument (pmod partitions, one gram per start) is in the
    // spanScrub scaladoc; this pins it on the fixture, including the
    // non-broadcast join branch (broadcastHotMax = 0).
    def run(): Seq[(Long, Long, Long, String)] =
      SparkEntry.queries("t23_span_scrub")(spark, dir).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val onePass = run()
    assert(onePass.exists(_._3 > 0)) // non-degenerate
    try {
      spark.conf.set("graft.scrub.dfShards", "3")
      assert(run() == onePass, "dfShards=3 diverged from the one-pass plan")
      spark.conf.set("graft.scrub.broadcastHotMax", "0")
      assert(run() == onePass, "forced shuffle-join hot path diverged")
      // durable-checkpoint mode (r14): reliable checkpoint() to a dir
      // must be output-identical too — and must actually WRITE there
      spark.conf.unset("graft.scrub.broadcastHotMax")
      val ck = java.nio.file.Files.createTempDirectory("graft-scrub-ck-")
      spark.conf.set("graft.scrub.checkpointDir", ck.toString)
      assert(run() == onePass, "checkpointDir mode diverged")
      val wrote = java.nio.file.Files.walk(ck).filter(p =>
        java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "reliable checkpoint wrote nothing to the durable dir")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(ck).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(p => java.nio.file.Files.delete(p))
    } finally {
      spark.conf.unset("graft.scrub.dfShards")
      spark.conf.unset("graft.scrub.broadcastHotMax")
      spark.conf.unset("graft.scrub.checkpointDir")
    }
  }

  test("t23: the viral-gram backstop is AQE's runtime broadcast of the hot side — measured") {
    // Round-13 finding (from trying to spec the OLD claim): AQE's
    // skew-JOIN split can never fire on t23's join-back — the rule only
    // matches SMJ whose children are Sort-over-ShuffleQueryStage
    // DIRECTLY, and the hot side has the df aggregate+filter between
    // its shuffle and the sort. The REAL backstop when one gram goes
    // viral across the crawl is one level simpler: after the df filter
    // the hot side is small (the boilerplate vocabulary), so AQE's
    // runtime SMJ→broadcast conversion replaces the g-shuffle join with
    // a broadcast — the position stream then never shuffles on g at
    // all, and a viral gram CANNOT create a hot join partition because
    // its occurrences stay spread across the scan partitions. This pins
    // exactly that on a planted mega-viral corpus, plus output identity
    // against the forced-shuffle plan.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-t23-viral-").toString
    val viral = "viral boiler plate"
    val docs = (0L until 3000L).map { i =>
      val filler = (0 until 4).map(j => s"u${i}w$j").mkString(" ")
      val text = (Seq.fill(48)(viral) :+ filler).mkString(" ")
      (i, text, "en", "synthetic", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(4).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // default confs (AQE on, broadcast threshold default): the hot side
    // must runtime-convert to broadcast despite the viral skew
    val q = TextPack.spanScrub(spark, tmp)
    val converted = q.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(converted.forall(_._3 >= 24), "viral span must be scrubbed everywhere")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"AQE must broadcast the df-filtered hot side at runtime:\n${plan.take(4000)}")
    // and the forced shuffle-join plan (broadcast disabled) must agree
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val forced = TextPack.spanScrub(spark, tmp).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      assert(forced == converted, "broadcast and shuffle-join plans diverged")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("d16: containment direction, bounds, and exact intersection (driver replay)") {
    val rows = SparkEntry.queries("d16_containment_dedup")(spark, dir).collect()
    assert(rows.nonEmpty)
    val sets = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
      .filter(_._2.length >= 3)
      .map { case (id, ws) => id -> ws.sliding(3).map(_.mkString(" ")).toSet }
      .toMap
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (na, nb, c) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      val (cont, cee) = (r.getLong(5), r.getLong(6))
      assert(Set(cont, cee) == Set(a, b))
      assert(na == sets(a).size && nb == sets(b).size)
      val i = sets(a).intersect(sets(b)).size
      assert(c == i.toDouble / math.min(na, nb), s"($a,$b) containment")
      assert(c >= 0.5 && c <= 1.0)
      // container is the larger set; equal sizes tie to the lesser id
      val contN = if (cont == a) na else nb
      val ceeN = if (cee == a) na else nb
      assert(contN >= ceeN)
      if (na == nb) assert(cont == a)
      // containment dominates Jaccard — the inclusion signal d4 misses
      assert(c >= i.toDouble / (na + nb - i) - 1e-12)
    }
  }

  test("e21: delete audit arithmetic — ledger total, live counts, the 20% rule") {
    val rows = SparkEntry.queries("e21_ivf_delete")(spark, dir).collect()
    val emb = graft.Tables(spark, dir, "embeddings")
    assert(rows.map(_.getLong(1)).sum == emb.count())
    assert(rows.map(_.getLong(2)).sum ==
      emb.where(col("vec_id") % 13 === 5).count())
    rows.foreach { r =>
      val (total, del, live, compact) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))
      assert(live == total - del)
      assert(compact == (if (del * 5 > total) 1 else 0))
    }
  }

  test("t24: one row per doc, exact token counts, nonnegative margin, argmax flag") {
    val rows = SparkEntry.queries("t24_lang_profile")(spark, dir).collect()
    val docs = graft.Tables(spark, dir, "documents")
    assert(rows.length == docs.count())
    val nToks = docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    rows.foreach { r =>
      assert(TextPack.LangLabels.contains(r.getString(3)))
      assert(r.getLong(2) == nToks(r.getLong(0)))
      assert(r.getLong(5) >= 0L, "top1-top2 margin is nonnegative by definition")
      assert((r.getInt(4) == 1) == (r.getString(3) == r.getString(1)))
    }
  }

  test("x12: driver replay — sessionization, truncation, assembly for every user") {
    val rows = SparkEntry.queries("x12_conversation_pack")(spark, dir).collect()
    val ev = graft.Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._2)).toVector
      val convs = scala.collection.mutable.ArrayBuffer
        .empty[Vector[(Long, Long, Long, String)]]
      sorted.foreach { e =>
        if (convs.isEmpty || e._3 - convs.last.last._3 > SamplingPack.ConvGapUs)
          convs += Vector(e)
        else convs(convs.size - 1) = convs.last :+ e
      }
      convs.zipWithIndex.map { case (c, i) =>
        val kept = c.takeRight(SamplingPack.MaxTurns)
        (u, (i + 1).toLong) ->
          ((c.size.toLong, kept.size.toLong, kept.head._3, kept.last._3,
            kept.map(_._4).mkString(">")))
      }
    }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (nt, nk, ts, te, dlg) = expected((r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) == nt && r.getLong(3) == nk)
      assert(r.getLong(4) == ts && r.getLong(5) == te)
      assert(r.getString(6) == dlg)
    }
  }
}
