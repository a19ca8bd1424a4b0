package graft.operators

import graft.{SparkEntry, SparkSuite}

/** Semantic invariants for the round-15 operators: the full-canon
  * quality scorer (t29 widened to 26 rule-verdict features) and its
  * serve side (s23 at the ingest edge). Value-level cross-engine
  * equality is the DuckDB crosscheck's job; these driver-replay the
  * stated training rules in independent BigInt and pin the properties
  * a hash can't express.
  */
class Round15OpsSpec extends SparkSuite {
  private val dir = sf("sf0.001")

  test("t29: the widened trainer replays an independent BigInt pocket over the 26 canon verdicts") {
    val rows = SparkEntry.queries("t29_quality_perceptron")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))
    // independent replay: features from the factored canon frame (the
    // r14 discipline — the frame itself is pinned by the t26/t27/t28
    // planted-row replays and the cross-engine hash), training in
    // BigInt with the STATED rules: ties are misses, no learning rate,
    // PerceptronEpochs static epochs, pocket = (min misses, earliest).
    val nx = TextPack.CanonFeatures.size
    val feats = TextPack.canonFeats(
        graft.Tables(spark, dir, "documents")).collect()
      .map { r =>
        (r.getLong(0), BigInt(r.getLong(2)),
          Array.tabulate(nx)(i => BigInt(r.getLong(3 + i))))
      }
    // every feature is a ±1 verdict (the stated signum encoding)
    feats.foreach { case (id, _, xs) =>
      xs.foreach(x => assert(x == 1 || x == -1, s"non-signum feature, doc $id")) }
    def marginOf(w: Array[BigInt], xs: Array[BigInt]): BigInt =
      w(0) + (0 until nx).map(i => w(i + 1) * xs(i)).sum
    var w = Array.fill(nx + 1)(BigInt(0))
    var pocket = w
    var pocketM = Int.MaxValue
    for (_ <- 1 to TextPack.PerceptronEpochs) {
      val g = Array.fill(nx + 1)(BigInt(0))
      feats.foreach { case (_, y, xs) =>
        if (y * marginOf(w, xs) <= 0) {
          g(0) += y
          (0 until nx).foreach(i => g(i + 1) += y * xs(i))
        }
      }
      w = Array.tabulate(nx + 1)(i => w(i) + g(i))
      val m = feats.count { case (_, y, xs) => y * marginOf(w, xs) <= 0 }
      if (m < pocketM) { pocketM = m; pocket = w }
    }
    val expect = feats.map { case (id, y, xs) =>
      id -> (y, marginOf(pocket, xs)) }.toMap
    assert(rows.length == feats.length)
    rows.foreach { case (id, y, score, pred, correct) =>
      val (ey, es) = expect(id)
      assert(BigInt(y) == ey, s"label $id")
      assert(BigInt(score) == es, s"score $id (weights replay)")
      assert(pred == (if (score > 0) 1 else 0), s"pred $id")
      assert(correct == (if ((if (score > 0) 1 else -1) == y) 1 else 0), s"correct $id")
    }
    // the verdict gate: both classes predicted, agreement at least the
    // r14 bar (measured 1.0 — the canon AND is separable on verdicts
    // and the pocket finds the separator by epoch ~24)
    assert(rows.exists(_._4 == 1) && rows.exists(_._4 == 0), "degenerate predictor")
    val acc = rows.count(_._5 == 1).toDouble / rows.length
    assert(acc >= 0.974, s"agreement $acc below the 0.974 bar")
  }

  test("d3: the band-sharded spill lever is value-identical to the one-pass plan") {
    // graft.dedup.bandShards partitions the df-agg + bucket-join by
    // band group and dedups once across the union; bands partition the
    // key space, so the pair SET cannot change — pinned here against
    // the default path, including a shard count that doesn't divide
    // NumBands evenly.
    def pairs(): Set[(Long, Long)] =
      SparkEntry.queries("d3_lsh_pairs")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = pairs()
    assert(base.nonEmpty)
    for (g <- Seq(2, 3)) {
      spark.conf.set("graft.dedup.bandShards", g.toString)
      try assert(pairs() == base, s"bandShards=$g changed the pair set")
      finally spark.conf.unset("graft.dedup.bandShards")
    }
  }

  test("the x1 rate policy is TOTAL: an unknown catalog name gets the tail rate, no cast failure") {
    import spark.implicits._
    // r14 verdict "What's wrong" #3: the srcNN parse would throw under
    // ANSI on any real catalog name. try_cast + the otherwise/ELSE
    // branch now classify unknowns to the tail rate on BOTH engines.
    val rows = SamplingPack.mixtureSample(
      Seq((1L, "src01"), (2L, "common-crawl-2409"), (3L, "src17"))
        .toDF("doc_id", "source"))
      .select("doc_id", "permille").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows(1L) == 1000) // group 0
    assert(rows(3L) == 750)  // tail group
    assert(rows(2L) == 750, "unknown name must fall to the tail rate")
  }

  test("s23: the stream serves the batch-trained scorer bit for bit") {
    val served = SparkEntry.queries("s23_stream_quality_score")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4)))
      .toMap
    val trained = SparkEntry.queries("t29_quality_perceptron")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3)))
      .toMap
    assert(served.keySet == trained.keySet, "stream must score every document")
    served.foreach { case (id, (ck, score, pred, agree)) =>
      val (y, tScore, tPred) = trained(id)
      // the ingest-edge score IS the batch trainer's score (exact Long
      // end to end — no drift between the trained and served model)
      assert(score == tScore, s"served score $id != trained")
      assert(pred == tPred, s"served pred $id != trained")
      assert(y == 2L * ck - 1, s"canon label $id")
      assert(agree == (if (pred == ck) 1 else 0), s"agree $id")
    }
    // serve-side agreement meets the same bar
    val acc = served.values.count(_._4 == 1).toDouble / served.size
    assert(acc >= 0.974, s"serve agreement $acc below the 0.974 bar")
  }
}
