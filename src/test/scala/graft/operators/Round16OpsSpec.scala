package graft.operators

import graft.{SparkEntry, SparkSuite}

/** Semantic invariants for the round-16 levers: the corpus-scaled
  * trainer frame width, the scratch-budget band-shard selection, and
  * the scorer-fed anneal schedule (x18 / the x17 quality dial).
  * Value-level cross-engine equality is the DuckDB crosscheck's job;
  * these pin the selection RULES and the knobs' contracts.
  */
class Round16OpsSpec extends SparkSuite {
  private val dir = sf("sf0.001")

  test("trainFrameWidth scales with the corpus: floor 4, 1 per 4M docs, cap 512") {
    // the floor keeps every committed fixture/decade cell (all ≤ 15M
    // docs) at the width its numbers were captured at
    for (n <- Seq(0L, 500L, 60000L, 5000000L, 15000000L, 16000000L))
      assert(TextPack.trainFrameWidth(n) == 4, s"n=$n")
    assert(TextPack.trainFrameWidth(20000000L) == 5)
    assert(TextPack.trainFrameWidth(50000000L) == 12)
    assert(TextPack.trainFrameWidth(1000000000L) == 250)
    // cap: a bounded-sample trainer never needs a wider epoch wave
    assert(TextPack.trainFrameWidth(3000000000L) == 512)
    assert(TextPack.trainFrameWidth(Long.MaxValue / 2) == 512)
  }

  test("trainFrame pins the width the rule selects") {
    assert(TextPack.trainFrame(spark, dir).rdd.getNumPartitions == 4)
  }

  test("autoBandShards picks the smallest shard count whose scratch fits the budget") {
    val B = 4000000000L // the §3f-addendum example budget: 4 GB scratch
    // measured optima from SCALING §3f-addendum: x3000m (15M docs ×
    // 4 bands = 60M sig rows) wants 2 — spill eliminated, 1.7× faster;
    // x10000m (200M sig rows) wants the NumBands=4 clamp
    assert(DedupPack.autoBandShards(60000000L, B) == 2)
    assert(DedupPack.autoBandShards(200000000L, B) == 4)
    // small corpora stay unsharded; the clamp holds at any extreme
    assert(DedupPack.autoBandShards(2000L, B) == 1)
    assert(DedupPack.autoBandShards(0L, B) == 1)
    assert(DedupPack.autoBandShards(Long.MaxValue / 256, B) == 4)
    // monotone in the budget: a bigger allowance never shards more
    assert(DedupPack.autoBandShards(60000000L, 8L * B) == 1)
    // overflow guard (review finding): a typo'd tiny budget on a big
    // matrix must clamp to NumBands, never wrap the Int cast to 1 —
    // unsharded under the tiniest budget was the lever's exact opposite
    assert(DedupPack.autoBandShards(200000000L, 10L) == 4)
    assert(DedupPack.autoBandShards(Long.MaxValue / 128, 1L) == 4)
  }

  test("bandShards precedence: explicit knob wins, then budget, then 1") {
    import spark.implicits._
    val sig = (1L to 1000L).toDF("x")
    def withConf[T](kvs: (String, String)*)(body: => T): T = {
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
    }
    // neither conf → today's default
    assert(DedupPack.bandShardsOf(spark, sig) == 1)
    // budget alone → the rule over the DERIVED per-row scratch (r17:
    // measured from this frame's own sampled width — one 8 B long field
    // + 8 B header = 16 B × the 4× multiplier = 64 B/row; 1000 rows ×
    // 64 B = 64 kB; a 50 kB budget needs 2 passes)
    withConf("graft.dedup.scratchBudgetBytes" -> "50000") {
      assert(DedupPack.bandShardsOf(spark, sig) == 2)
    }
    // the manual per-row constant stays available and wins over the
    // derivation (112 B × 1000 = 112 kB → 3 passes, the pre-r17 model)
    withConf("graft.dedup.scratchBudgetBytes" -> "50000",
        "graft.dedup.scratchBytesPerSigRow" -> "112") {
      assert(DedupPack.bandShardsOf(spark, sig) == 3)
    }
    // explicit knob wins even when a budget is also set
    withConf("graft.dedup.bandShards" -> "2",
        "graft.dedup.scratchBudgetBytes" -> "50000") {
      assert(DedupPack.bandShardsOf(spark, sig) == 2)
    }
    // a non-positive budget is ignored, not an error
    withConf("graft.dedup.scratchBudgetBytes" -> "0") {
      assert(DedupPack.bandShardsOf(spark, sig) == 1)
    }
  }

  test("d3: the budget-selected shard count is value-identical to the default path") {
    def pairs(): Set[(Long, Long)] =
      SparkEntry.queries("d3_lsh_pairs")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = pairs()
    assert(base.nonEmpty)
    // a 200 kB budget forces a multi-shard auto pick on the fixture's
    // signature matrix; the pair set must not move
    spark.conf.set("graft.dedup.scratchBudgetBytes", "200000")
    try assert(pairs() == base, "budget-driven sharding changed the pair set")
    finally spark.conf.unset("graft.dedup.scratchBudgetBytes")
  }

  test("x18 == x17 under the scorer dial; a typo'd quality source fails loudly") {
    val x18 = SparkEntry.queries("x18_anneal_scored")(spark, dir).collect()
    spark.conf.set("graft.anneal.quality", "scorer")
    val dialed =
      try SparkEntry.queries("x17_anneal_schedule")(spark, dir).collect()
      finally spark.conf.unset("graft.anneal.quality")
    assert(x18.toSeq == dialed.toSeq,
      "the x17 scorer dial and its hash-checked twin x18 drifted")
    spark.conf.set("graft.anneal.quality", "gaet")
    try {
      intercept[RuntimeException] {
        SparkEntry.queries("x17_anneal_schedule")(spark, dir).collect()
      }
    } finally spark.conf.unset("graft.anneal.quality")
  }

  test("a scorer shift moves the anneal share (rate AND allocation)") {
    val q = SamplingPack.pocketQualityScores(spark, dir)
    val baseRows = SamplingPack.annealScheduleDf(spark, dir, q)
      .where(org.apache.spark.sql.functions.col("phase") === "anneal")
      .collect()
    val base = baseRows
      .map(r => r.getString(2) -> (r.getLong(5), r.getLong(8))).toMap
    // per-source anneal headroom (the carryover cap): promoting a source
    // whose cap the MAIN phase already drained can't move tokens — pick
    // the lowest-scored source that still has headroom and isn't already
    // drawing the top-tier rate
    val headroom = baseRows.map(r => r.getString(2) -> r.getLong(7)).toMap
    val worst = q.toSeq
      .filter { case (s, _) =>
        headroom(s) > 0 && base(s)._1 < SamplingPack.AnnealTierRates.head.toLong }
      .minBy { case (s, v) => (v, s) }._1
    val q2 = q + (worst -> (q.values.max + 1))
    val moved = SamplingPack.annealScheduleDf(spark, dir, q2)
      .where(org.apache.spark.sql.functions.col("phase") === "anneal")
      .collect().map(r => r.getString(2) -> (r.getLong(5), r.getLong(8))).toMap
    val (rate0, alloc0) = base(worst)
    val (rate1, alloc1) = moved(worst)
    assert(rate1 == SamplingPack.AnnealTierRates.head.toLong,
      s"promoted source should draw the top-tier rate, got $rate1")
    assert(rate1 > rate0, "promotion did not raise the anneal rate")
    assert(alloc1 >= alloc0, "a higher tier must never shrink the draw")
    assert(alloc1 > alloc0,
      "the shifted scorer should move actual anneal tokens on this fixture")
    // both schedules still partition the anneal budget exactly
    for (m <- Seq(base, moved))
      assert(m.values.map(_._2).sum <= SamplingPack.AnnealBudgetTokens)
  }

  test("d7: the shuffle-join propagation path is value-identical to the broadcast path") {
    // graft.components.broadcastNodeLimit=0 forces the at-scale shape
    // (shuffle joins, session-width labels) through the SAME min-label
    // algebra — cluster assignments must not move. maxUnionFindEdges=0
    // routes d7 through propagateComponents at all, so both paths of
    // the size dial are the ones under test.
    def clusters(): Map[Long, Long] =
      SparkEntry.queries("d7_dedup_clusters")(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("graft.components.maxUnionFindEdges", "0")
    try {
      val viaBroadcast = clusters()
      assert(viaBroadcast.nonEmpty)
      spark.conf.set("graft.components.broadcastNodeLimit", "0")
      try assert(clusters() == viaBroadcast,
        "shuffle-path labels diverged from the broadcast path")
      finally spark.conf.unset("graft.components.broadcastNodeLimit")
    } finally spark.conf.unset("graft.components.maxUnionFindEdges")
  }

  test("x20 == x19 under the scorer dial, and the scorer moves the realization") {
    val x20 = SparkEntry.queries("x20_anneal_sample_scored")(spark, dir).collect()
    spark.conf.set("graft.anneal.quality", "scorer")
    val dialed =
      try SparkEntry.queries("x19_anneal_sample")(spark, dir).collect()
      finally spark.conf.unset("graft.anneal.quality")
    assert(x20.toSeq == dialed.toSeq,
      "the x19 scorer dial and its hash-checked twin x20 drifted")
    // the two quality sources must produce genuinely different draws on
    // the fixture (699 vs 678 rows at sf0.001) — otherwise the twin
    // proves nothing
    val x19 = SparkEntry.queries("x19_anneal_sample")(spark, dir).collect()
    assert(x19.toSeq != x20.toSeq,
      "gate and scorer schedules realized identically — fixture too weak")
  }

  test("x19 token-contiguous phases: per-doc repeats exactly capped, tokens within one doc") {
    val sched = SparkEntry.queries("x17_anneal_schedule")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(2)) ->
        (r.getLong(4), r.getLong(8))).toMap // (phase, source) -> (unique, alloc)
    val draws = SparkEntry.queries("x19_anneal_sample")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(3), r.getLong(2),
        r.getLong(4), r.getLong(5))) // (phase, source, doc, n_tokens, n_repeats)
    assert(draws.nonEmpty && draws.forall(_._5 >= 1))
    val maxDoc = draws.map(_._4).max
    val realized = draws.groupBy(d => (d._1, d._2))
      .view.mapValues(_.map(d => d._4 * d._5).sum).toMap
    // Token-contiguous attribution (r17): main's range starts at 0, so
    // its realization keeps x16's exact bound (≤ alloc, shortfall < one
    // doc); a doc STRADDLING the phase boundary goes wholly to the later
    // phase, so anneal sits within ONE document either side of its alloc
    // — the stated price of exact per-doc repeat bounds.
    for (((ph, src), (_, alloc)) <- sched) {
      val got = realized.getOrElse((ph, src), 0L)
      if (ph == "main") {
        assert(got <= alloc, s"main/$src realized $got > alloc $alloc")
        assert(alloc - got < maxDoc || alloc == 0,
          s"main/$src left ${alloc - got} tokens unrealized (max doc $maxDoc)")
      } else {
        assert(math.abs(got - alloc) < maxDoc || alloc == 0,
          s"$ph/$src realized $got vs alloc $alloc — off by ≥ one doc ($maxDoc)")
      }
    }
    // run-level: Σ realized ≤ Σ alloc EXACTLY (the boundary doc moved
    // between phases, never duplicated), shortfall < one doc per source
    val bySrc = draws.groupBy(_._2)
    for ((src, ds) <- bySrc) {
      val tot = ds.map(d => d._4 * d._5).sum
      val cumAlloc = sched(("main", src))._2 + sched(("anneal", src))._2
      assert(tot <= cumAlloc, s"$src realized $tot > cumulative alloc $cumAlloc")
      assert(cumAlloc - tot < maxDoc || cumAlloc == 0,
        s"$src left ${cumAlloc - tot} tokens unrealized")
      // the token cap transfers: cum alloc ≤ 4×unique (carryover)
      val uniq = sched(("main", src))._1
      assert(tot <= SamplingPack.MaxUniqueEpochs * uniq,
        s"$src cumulative realized $tot > 4×unique ${4 * uniq}")
    }
    // THE r17 invariant (previously only token-level): per-DOC total
    // repeats across both phases ≤ MaxUniqueEpochs, exactly
    val perDoc = draws.groupBy(d => (d._2, d._3))
      .view.mapValues(_.map(_._5).sum).toMap
    assert(perDoc.values.max <= SamplingPack.MaxUniqueEpochs,
      s"a doc repeats ${perDoc.values.max} times > ${SamplingPack.MaxUniqueEpochs}")
    // the fixture must exercise a genuine anneal draw (the schedule's
    // whole point) and a genuine partial epoch somewhere
    assert(draws.exists(_._1 == "anneal"), "no anneal-phase draws")
    val perPhaseRepeats = draws.groupBy(d => (d._1, d._2))
      .view.mapValues(_.map(_._5).toSet).toMap
    assert(perPhaseRepeats.values.exists(_.size > 1),
      "no partial epoch bit on the fixture — the prefix rule is untested")
  }
}
