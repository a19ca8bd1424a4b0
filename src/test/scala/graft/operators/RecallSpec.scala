package graft.operators

import graft.SparkSuite

/** Recall gates for the approximate similarity operators. e4 spent most
  * of round 1 returning zero true candidates before anyone noticed —
  * rows-only driver checks can't see that, so these specs measure recall
  * against the exact operators and fail on regression.
  */
class RecallSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sf("sf0.01")

  private def topIds(q: String): Set[Long] =
    SimilarityPack.queries(q)(spark, dir)
      .select("vec_id").as[Long].collect().toSet

  test("e4 LSH KNN: recall@20 vs exact e1 >= 0.8") {
    val exact = topIds("e1_knn_brute")
    val lsh = topIds("e4_knn_lsh")
    val recall = (exact & lsh).size.toDouble / exact.size
    info(s"e4 recall@20 = $recall")
    assert(recall >= 0.8, s"e4 recall@20 degraded to $recall")
  }

  test("e4 LSH candidate volume is bounded (the selectivity side of the dial)") {
    // Recall gates alone can hide an index that degenerates into a full
    // scan (100% candidates = perfect recall, zero selectivity). On this
    // near-random corpus the 16-table union covers ~64% per query —
    // report it and bound it, so anyone turning the tables/planes dial at
    // scale sees BOTH sides move.
    import org.apache.spark.sql.functions._
    val emb = graft.Tables(spark, dir, "embeddings")
    val sig = SimilarityPack.lshBuckets(spark, emb)
    val q = sig.where(col("vec_id") === 0)
      .select(col("table").as("qtable"), col("bucket").as("qbucket"))
    val corpus = emb.where(col("vec_id") =!= 0).count()
    val candidates = sig.where(col("vec_id") =!= 0)
      .join(broadcast(q),
        col("table") === col("qtable") && col("bucket") === col("qbucket"))
      .select("vec_id").distinct().count()
    val ratio = candidates.toDouble / corpus
    info(f"e4 candidate volume: $candidates/$corpus = $ratio%.3f of corpus")
    assert(ratio > 0.0, "LSH returned zero candidates")
    assert(ratio <= 0.75, f"e4 candidate set covers $ratio%.3f of the corpus - " +
      "the index has degenerated toward a full scan; retune planes/tables")
  }

  test("e24 blocked bitext mining: pair recall vs exact e23, at 1-probe and 2-probe") {
    // The r12 containment proof said co-assigned exact pairs SURVIVE
    // blocking; this measures how many mutual pairs the blocking LOSES
    // (r12 verdict ask #3). Recall is the list-count trade: nlist=16
    // over ~50 vectors/side is deliberately aggressive blocking; a
    // production deployment tunes nlist (and multi-probe) so each list
    // holds enough cross-side candidates. The 2-probe variant re-mines
    // over pairs sharing ANY of each endpoint's 2 nearest lists — the
    // cheap recall lever that never touches the margin math.
    import org.apache.spark.sql.functions._
    def pairsOf(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairsOf(SimilarityPack.queries("e23_bitext_mine")(spark, dir).collect())
    val blocked = pairsOf(SimilarityPack.queries("e24_bitext_blocked")(spark, dir).collect())
    val r1 = (exact & blocked).size.toDouble / exact.size
    info(f"e24 pair recall @1-probe (nlist=${IvfIndex.Pretrained.length}) = $r1%.3f " +
      s"(${(exact & blocked).size}/${exact.size})")
    // 2-probe: candidate pairs share at least one of each side's 2
    // nearest lists; cos6 comes from the same compiled kernel, the
    // mining tail is the same shared marginMine.
    val emb = graft.Tables(spark, dir, "embeddings")
      .where(col("label").isin(0, 1))
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val probe2 = emb.map { case (id, _, v) =>
      id -> IvfIndex.probeCids(IvfIndex.Pretrained, v, 2).toSet }.toMap
    val aIds = emb.filter(_._2 == 0).map(_._1)
    val bIds = emb.filter(_._2 == 1).map(_._1)
    val cand = for {
      x <- aIds.toSeq; y <- bIds.toSeq
      if (probe2(x) & probe2(y)).nonEmpty
    } yield (x, y)
    val candDf = cand.toDF("x_id", "y_id")
      .join(graft.Tables(spark, dir, "embeddings")
        .select(col("vec_id").as("x_id"), col("embedding").as("xe")), "x_id")
      .join(graft.Tables(spark, dir, "embeddings")
        .select(col("vec_id").as("y_id"), col("embedding").as("ye")), "y_id")
      .select(col("x_id"), col("y_id"),
        round(graft.functions.cosine_similarity(col("xe"), col("ye")) * 1e6, 0)
          .cast("long").as("cos6"))
    val mined2 = pairsOf(SimilarityPack.marginMine(spark, candDf).collect())
    val r2 = (exact & mined2).size.toDouble / exact.size
    info(f"e24 pair recall @2-probe = $r2%.3f (${(exact & mined2).size}/${exact.size})")
    // e25 IS the shipped 2-probe form: its mined pair set must equal
    // this driver-side replay (pins the compiled NearestCentroids top-2
    // against probeCids, and the dedup-before-heap discipline)
    val e25 = pairsOf(SimilarityPack.queries("e25_bitext_probe2")(spark, dir).collect())
    assert(e25 == mined2, "e25 diverged from the 2-probe replay")
    // Measured on this fixture: 0.200 @1-probe, 0.433 @2-probe. The
    // corpus is near-i.i.d. (no real translation-pair clustering), so
    // 16-way blocking over ~3-vector cross-side lists is the WORST case
    // for blocking recall — real multilingual embeddings co-locate
    // translation pairs and the same nlist recovers far more; the
    // deterministic fixture makes these floors regression pins, not
    // quality claims. (2-probe ≥ 1-probe is not a theorem — extra
    // candidates can evict a pair from a k-heap — but it holds on this
    // fixture and a flip would be worth seeing.)
    assert(r1 >= 0.15, f"1-probe blocking recall collapsed: $r1%.3f")
    assert(r2 >= r1, "2-probe lost pairs vs 1-probe on the pinned fixture")
    assert(r2 >= 0.35, f"2-probe recall floor: $r2%.3f")
  }

  test("e25 probe dial on a planted-cluster fixture: recall rises toward the exact ceiling") {
    // The shared corpus is near-i.i.d. — the WORST case for blocking
    // (0.200 @1-probe / 0.433 @2-probe, pinned above). Real multilingual
    // embeddings co-locate translation pairs, so this plants that
    // structure deterministically (seeded Gaussians — same discipline as
    // ScaleUp's deterministic transforms): 25 concepts, each with 2
    // correlated vectors per side, and sweeps probes {1,2,4} × nlist
    // {16,64}, measuring pair recall vs the exact full-cross mining AND
    // the candidate work fraction — both sides of the dial a deployment
    // tunes. probeCids is the same (distance, index) ranking as the
    // compiled NearestCentroids kernel (pinned by the e25 == replay
    // assert above), so this curve IS e25's dial.
    import org.apache.spark.sql.functions._
    val dim = 64
    val concepts = 25
    val perSide = 2
    def gauss(seed: Long): Iterator[Double] = {
      val r = new java.util.Random(seed); Iterator.continually(r.nextGaussian())
    }
    val centers = (0 until concepts).map(c =>
      gauss(c * 7919L + 13).take(dim).map(_ * 0.5).toArray).toArray
    val rowsIn = for {
      c <- 0 until concepts; side <- 0 to 1; i <- 0 until perSide
    } yield {
      val g = gauss(c * 104729L + side * 31L + i)
      val v = centers(c).map(x => (x + 0.05 * g.next()).toFloat).toSeq
      (c * 1000L + side * 100L + i, side, v)
    }
    val emb = rowsIn.toDF("vec_id", "label", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .cache()
    val cos6 = round(graft.functions.cosine_similarity(col("xe"), col("ye")) * 1e6, 0)
      .cast("long").as("cos6")
    def mine(cand: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      SimilarityPack.marginMine(spark, cand).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = emb.where(col("label") === 0)
      .select(col("vec_id").as("x_id"), col("embedding").as("xe"))
    val b = emb.where(col("label") === 1)
      .select(col("vec_id").as("y_id"), col("embedding").as("ye"))
    val fullCross = a.crossJoin(b)
    val exact = mine(fullCross.select(col("x_id"), col("y_id"), cos6))
    assert(exact.nonEmpty)
    val nCross = (concepts * perSide).toLong * (concepts * perSide)
    val vecs = emb.select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val curve = for (nlist <- Seq(16, 64)) yield {
      val cents = IvfIndex.kmeans(spark, emb.select("vec_id", "embedding"), nlist, 3)
      val byProbe = for (p <- Seq(1, 2, 4)) yield {
        val lists = vecs.map { case (id, _, v) =>
          id -> IvfIndex.probeCids(cents, v, p).toSet }.toMap
        val cand = for {
          (x, sx, _) <- vecs.toSeq if sx == 0
          (y, sy, _) <- vecs.toSeq if sy == 1
          if (lists(x) & lists(y)).nonEmpty
        } yield (x, y)
        val candDf = cand.toDF("x_id", "y_id")
          .join(a, "x_id").join(b, "y_id")
          .select(col("x_id"), col("y_id"), cos6)
        val recall = (exact & mine(candDf)).size.toDouble / exact.size
        val work = cand.size.toDouble / nCross
        info(f"e25 dial nlist=$nlist%2d probes=$p: recall=$recall%.3f " +
          f"candidate work=${cand.size}%4d/$nCross ($work%.3f)")
        (recall, work)
      }
      // recall is monotone in probes on the pinned fixture, and the
      // blocking genuinely prunes (work fraction < 1) at every point
      assert(byProbe.map(_._1) == byProbe.map(_._1).sorted,
        s"nlist=$nlist: recall not rising with probes: ${byProbe.map(_._1)}")
      assert(byProbe.forall(_._2 < 1.0), s"nlist=$nlist: blocking degenerated to full cross")
      assert(byProbe.map(_._2) == byProbe.map(_._2).sorted,
        s"nlist=$nlist: candidate work not rising with probes")
      byProbe
    }
    // on clustered data the dial reaches (near) the exact ceiling:
    // 4 probes over nlist=16 must recover >= 0.9 of the exact pairs,
    // and even 1 probe beats the near-i.i.d. fixture's 0.200 floor
    assert(curve.head.last._1 >= 0.9,
      f"nlist=16 @4-probe recall ${curve.head.last._1}%.3f below the clustered ceiling")
    assert(curve.head.head._1 >= 0.5,
      f"nlist=16 @1-probe recall ${curve.head.head._1}%.3f — clustering should dominate the i.i.d. 0.200")
    emb.unpersist()
  }

  test("e5 IVF KNN: recall@20 vs exact e1 >= 0.8") {
    val exact = topIds("e1_knn_brute")
    val ivf = topIds("e5_ivf_knn")
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"e5 recall@20 = $recall")
    assert(recall >= 0.8, s"e5 recall@20 degraded to $recall")
  }

  test("e7 PQ KNN: recall@20 vs exact e1 >= 0.8") {
    val exact = topIds("e1_knn_brute")
    val pq = topIds("e7_pq_knn")
    val recall = (exact & pq).size.toDouble / exact.size
    info(s"e7 recall@20 = $recall")
    assert(recall >= 0.8, s"e7 recall@20 degraded to $recall")
  }

  test("e13 MRL two-stage KNN: recall@20 vs exact e1 >= 0.6 (untrained prefix)") {
    // Prefix-16 of 64 i.i.d. dims keeps only 1/4 of the signal and the
    // fixture carries no Matryoshka training, yet a 200-of-5000 (4%)
    // shortlist recovers 0.75 of the true top-20 (measured) — gate the
    // floor below that. On real MRL embeddings the prefix is the trained
    // summary and this approaches full-dim recall.
    val exact = topIds("e1_knn_brute")
    val mrl = topIds("e13_mrl_knn")
    val recall = (exact & mrl).size.toDouble / exact.size
    info(s"e13 recall@20 = $recall")
    assert(recall >= 0.6, s"e13 recall@20 degraded to $recall")
  }

  test("e14 two-level IVF KNN: recall@20 vs exact e1 >= 0.7 (IMI tier)") {
    // Same nprobe budget as e5 (6 centroids) but spent through the
    // 2-group coarse tier, which adds the group-misassignment loss on
    // top of e5's cluster-miss loss — the documented IMI trade for
    // (g + k/g)·dim assignment. Measured 0.85 on this near-random
    // corpus — identical to e5: the probed 6 centroids coincide and the
    // group tier misassigns none of the true top-20 here. Floor below
    // that to absorb fixture wobble while catching real degradation.
    val exact = topIds("e1_knn_brute")
    val ivf2 = topIds("e14_ivf2_knn")
    val recall = (exact & ivf2).size.toDouble / exact.size
    info(s"e14 recall@20 = $recall")
    assert(recall >= 0.7, s"e14 recall@20 degraded to $recall")
  }

  test("e17 IVF-PQ KNN: recall@20 vs exact e1 >= 0.7 (IVFADC)") {
    // The IVF routing is the binding loss: with the same nprobe=6 budget
    // as e5 the measured recall is 0.85 — identical to e5, i.e. the
    // residual-PQ ADC shortlist (200 of the probed clusters' vectors)
    // recovers every candidate the coarse quantizer lets through.
    // Residual coding is why: the per-cluster shifted codebooks quantize
    // the zero-centered residual, so ADC ranks within a cluster track
    // exact distance far better than e7's raw-vector codes. Floor at
    // 0.7 (e14's slack) to absorb fixture wobble.
    val exact = topIds("e1_knn_brute")
    val ivfpq = topIds("e17_ivfpq_knn")
    val recall = (exact & ivfpq).size.toDouble / exact.size
    info(s"e17 recall@20 = $recall")
    assert(recall >= 0.7, s"e17 recall@20 degraded to $recall")
  }

  test("e20 BQ KNN: recall@20 vs exact e1 >= 0.5 (coarsest 1-bit tier)") {
    // sign quantization keeps 1 of 32 bits per dimension — on this
    // near-random corpus it is the coarsest tier by far; the gate exists
    // to catch a broken pack/popcount (which collapses recall to ~chance
    // ≈ 20/n), not to promise SQ8-class fidelity.
    val exact = topIds("e1_knn_brute")
    val bq = topIds("e20_bq_knn")
    val recall = (exact & bq).size.toDouble / exact.size
    info(s"e20 recall@20 = $recall")
    assert(recall >= 0.5, s"e20 recall@20 degraded to $recall")
  }

  test("e8 SQ8 KNN: recall@20 vs exact e1 >= 0.9 (finest quantizer)") {
    val exact = topIds("e1_knn_brute")
    val sq = topIds("e8_sq_knn")
    val recall = (exact & sq).size.toDouble / exact.size
    info(s"e8 recall@20 = $recall")
    // 8-bit-per-dim quantization error is far below PQ's — hold it to a
    // tighter gate than the bucketing indexes.
    assert(recall >= 0.9, s"e8 recall@20 degraded to $recall")
  }

  test("e12 recall evaluation: agrees with an independent recomputation") {
    // e12 IS the metric the other gates here hand-compute — so gate it
    // against an independent formulation: per-probe recall must equal
    // |truth ∩ approx|/K where truth = exact brute top-K and approx =
    // IVF(nprobe=2) top-K, recomputed with plain collect-side code.
    import org.apache.spark.sql.functions._
    val got = SimilarityPack.queries("e12_ann_recall")(spark, dir)
      .select("probe_id", "hits").as[(Long, Long)].collect().toMap
    assert(got.size === SimilarityPack.RecallProbes)
    val emb = graft.Tables(spark, dir, "embeddings")
    val centroids = IvfIndex.Pretrained
    val corpus = emb.where(col("vec_id") >= SimilarityPack.RecallProbes)
    val probes = emb.where(col("vec_id") < SimilarityPack.RecallProbes)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    probes.foreach { case (pid, pv) =>
      val assigned = IvfIndex.assign(corpus, centroids)
        .select(col("vec_id"), col("cid"),
          round(graft.functions.cosine_similarity(
            col("embedding"), typedLit(pv.toSeq)) * 1e6, 0).cast("long").as("cos6"))
        .as[(Long, Int, Long)].collect()
      def topK(rows: Seq[(Long, Int, Long)]): Set[Long] =
        rows.sortBy { case (id, _, c) => (-c, id) }
          .take(SimilarityPack.RecallK).map(_._1).toSet
      val truth = topK(assigned.toSeq)
      val cids = IvfIndex.probeCids(centroids, pv, SimilarityPack.RecallNprobe).toSet
      val approx = topK(assigned.toSeq.filter(r => cids(r._2)))
      assert(got(pid) === (truth & approx).size.toLong,
        s"probe $pid: e12 hits ${got(pid)} != independent ${(truth & approx).size}")
    }
  }

  test("a20 HLL approx distinct: relative error vs exact a11 within 5%") {
    import spark.implicits._
    val exactCounts = graft.SparkEntry.queries("a11_distinct_agg")(spark, dir)
      .select("event_type", "n_users").as[(String, Long)].collect().toMap
    val approx = graft.analytics.ExtrasPack.queries("a20_approx_distinct")(spark, dir)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    exactCounts.foreach { case (k, n) =>
      val a = approx(k)
      val err = math.abs(a - n).toDouble / n
      info(f"a20 $k: exact=$n approx=$a err=$err%.4f")
      assert(err <= 0.05, s"$k: HLL error $err exceeds 5%% (exact=$n approx=$a)")
    }
  }

  test("a20b KMV sketch: relative error vs exact a11 within 30% (K=64)") {
    import spark.implicits._
    val exactCounts = graft.SparkEntry.queries("a11_distinct_agg")(spark, dir)
      .select("event_type", "n_users").as[(String, Long)].collect().toMap
    val est = graft.analytics.ExtrasPack.queries("a20b_kmv_distinct")(spark, dir)
      .select("event_type", "est_users").as[(String, Double)].collect().toMap
    exactCounts.foreach { case (k, n) =>
      val e = est(k)
      val err = math.abs(e - n) / n
      info(f"a20b $k: exact=$n kmv=$e%.1f err=$err%.4f")
      assert(err <= 0.30, s"$k: KMV error $err exceeds 30%% (exact=$n est=$e)")
    }
  }

  test("a43 sampled quantiles: error vs exact a15 within 15% of the value range") {
    import spark.implicits._
    val exact = graft.SparkEntry.queries("a15_percentiles")(spark, dir)
      .select("event_type", "p50", "vmin", "vmax")
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._4 - r._3))).toMap
    val est = graft.analytics.ExtrasPack.queries("a43_sketch_quantiles")(spark, dir)
      .select("event_type", "est_p50").as[(String, Double)].collect().toMap
    exact.foreach { case (k, (p50, range)) =>
      val e = est(k)
      val err = math.abs(e - p50) / range
      info(f"a43 $k: exact p50=$p50%.2f sampled=$e%.2f err=$err%.4f of range")
      assert(err <= 0.15,
        s"$k: sampled p50 off by $err of the value range (exact=$p50 est=$e)")
    }
  }

  test("a30 theta-overlap estimate: relative error vs exact intersection within 30%") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables(spark, dir, "events")
    def users(t: String) =
      ev.where(col("event_type") === t).select("user_id").distinct()
    val exact = users("click").intersect(users("purchase")).count()
    val est = graft.analytics.ExtrasPack.queries("a30_sketch_overlap")(spark, dir)
      .select("est_overlap").head().getDouble(0)
    val err = math.abs(est - exact) / exact
    info(f"a30 overlap: exact=$exact est=$est%.1f err=$err%.4f")
    assert(err <= 0.30, s"overlap error $err exceeds 30% (exact=$exact est=$est)")
  }

  test("d6 LSH near-dup: pair recall vs bounded brute (d6b)") {
    def pairs(q: String) = DedupPack.queries(q)(spark, dir)
      .select("vec_a", "vec_b", "cos_sim")
      .as[(Long, Long, Double)].collect()
    val brute = pairs("d6b_neardup_brute")
    val lsh = pairs("d6_embed_neardup")
      .collect { case (a, b, c) if a < 500 && b < 500 => (a, b) }.toSet
    // Collision probability grows with similarity, so gate per band: the
    // pairs a dedup pipeline must catch (higher cosine) recall best.
    val strong = brute.collect { case (a, b, c) if c >= 0.45 => (a, b) }
    val strongRecall = strong.count(lsh).toDouble / strong.length
    val all = brute.map(t => (t._1, t._2))
    val allRecall = all.count(lsh).toDouble / all.length
    info(s"d6 pair recall: cos>=0.45 -> $strongRecall, all (>=0.35) -> $allRecall")
    assert(strong.nonEmpty)
    assert(strongRecall >= 0.8, s"d6 strong-pair recall degraded to $strongRecall")
    assert(allRecall >= 0.6, s"d6 overall pair recall degraded to $allRecall")
  }

  test("d9 Bloom decontamination: superset of exact d8 (no false negatives), bounded FP adds") {
    // A Bloom filter can only ADD flags: every doc d8 proves contaminated
    // must appear in d9 with at least as many hits (a missing one would
    // be a broken filter, not an approximation), and the false-positive
    // additions must stay within the filter's design rate.
    val exact = DedupPack.queries("d8_decontaminate")(spark, dir)
      .select("doc_id", "n_shared").as[(Long, Long)].collect().toMap
    val bloom = DedupPack.queries("d9_bloom_decontaminate")(spark, dir)
      .select("doc_id", "n_bloom_hits").as[(Long, Int)].collect().toMap
    exact.foreach { case (id, nShared) =>
      assert(bloom.contains(id), s"d9 MISSED exactly-contaminated doc $id")
      assert(bloom(id) >= nShared,
        s"doc $id: bloom hits ${bloom(id)} < exact shared grams $nShared")
    }
    val fpDocs = bloom.keySet -- exact.keySet
    val probed = graft.Tables(spark, dir, "documents")
      .where($"doc_id" % 97 =!= 0).count()
    val fpRate = fpDocs.size.toDouble / probed
    info(s"d9: ${exact.size} exact docs, ${fpDocs.size} FP docs of $probed probed (rate $fpRate)")
    assert(fpRate <= 0.05, s"d9 doc-level FP rate $fpRate exceeds 5%")
  }

  test("a44 count-min: est >= exact for every probe, overestimate within 3N/w") {
    val rows = graft.analytics.ExtrasPack.queries("a44_count_min")(spark, dir)
      .select("user_id", "n_exact", "cms_est").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val n = graft.Tables(spark, dir, "events").count()
    val bound = 3.0 * n / 512 // ~3 expected collision masses at width 512
    rows.foreach { case (u, exact, est) =>
      assert(est >= exact, s"user $u: CMS UNDERestimated ($est < $exact) — impossible for a correct sketch")
      assert(est - exact <= bound,
        s"user $u: overestimate ${est - exact} exceeds $bound — width/hashing regressed")
    }
    val meanOver = rows.map(r => r._3 - r._2).sum.toDouble / rows.length
    info(f"a44: ${rows.length} probes, mean overestimate $meanOver%.2f (bound $bound%.1f)")
  }
}
