package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.functions.tokens

/** Behavioral invariants of the corpus-assembly operators (SamplingPack)
  * and the round-3 curation additions (d8 decontamination, t9 TF-IDF,
  * a25 grouping sets). Cross-engine value equality is the driver's
  * DuckDB check; these specs pin the properties the oracle can't state —
  * determinism, conservation laws, and algebraic equivalences between
  * the scalable implementation and its naive definition.
  */
class SamplingSpec extends SparkSuite {

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf("sf0.001"))

  test("x1 mixture sample is deterministic and respects per-group rates") {
    val a = q("x1_mixture_sample").collect()
    val b = q("x1_mixture_sample").collect()
    assert(a.toSeq === b.toSeq, "hash sampling must be replay-stable")

    // every kept row's bucket is under its group's threshold, and the
    // weight is exactly the inverse rate
    val byWeight = a.groupBy(_.getAs[Double]("weight")).view.mapValues(_.size).toMap
    assert(byWeight.keySet.subsetOf(Set(1.0, 2.0, 4.0, 1000.0 / 750.0)))

    // rate sanity: the full-keep group (weight 1.0) retains all its docs
    val docs = Tables(spark, sf("sf0.001"), "documents")
      .where(expr("CAST(substring(source, 4) AS INT) div 5") === 0).count()
    assert(byWeight(1.0).toLong === docs)
  }

  test("x2 two-level prefix sum equals the naive global cumsum") {
    val dir = sf("sf0.001")
    val got = q("x2_pack_sequences")

    // naive definition: one global window (single partition — the shape
    // the scalable version exists to avoid)
    val t = Tables(spark, dir, "documents")
      .select(col("doc_id"), size(tokens(col("text"))).as("n_tokens"))
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = t
      .withColumn("cum_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr("cum_before div 2048").as("shard_id"),
        (col("cum_before") % 2048).as("offset_in_shard"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("x2 packing invariants: offsets bounded, shards contiguous from 0") {
    val rows = q("x2_pack_sequences").collect()
    assert(rows.forall { r =>
      val off = r.getAs[Long]("offset_in_shard")
      off >= 0 && off < 2048
    })
    val shards = rows.map(_.getAs[Long]("shard_id")).distinct.sorted
    assert(shards.head === 0L)
    assert(shards === (0L to shards.last))
    // doc order implies shard order (packing never goes backwards)
    val inOrder = rows.sortBy(_.getAs[Long]("doc_id")).map(_.getAs[Long]("shard_id"))
    assert(inOrder.sameElements(inOrder.sorted))
  }

  test("x2 packing handles doc_id gaps and zero-token docs (random corpora)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // Sparse ids (filtered corpora leave gaps; some prefix buckets end up
    // empty) and zero-token docs must not disturb the prefix sum.
    val genDocs = Gen.listOfN(120,
      Gen.zip(Gen.choose(0L, 4000L), Gen.choose(0, 300)))
    val corpora = Gen.listOfN(6, genDocs)(Gen.Parameters.default, Seed(11L)).get
    corpora.foreach { raw =>
      val docs = raw.toMap.toSeq.sortBy(_._1) // distinct ids, sorted
      val cumBefore = docs.scanLeft(0L) { case (acc, (_, n)) => acc + n }.init
      val expected = docs.zip(cumBefore).map { case ((id, n), cb) =>
        id -> ((n, cb / 2048, cb % 2048)) }.toMap
      val got = SamplingPack.packSequences(docs.toDF("doc_id", "n_tokens"))
        .select("doc_id", "n_tokens", "shard_id", "offset_in_shard")
        .collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got === expected)
    }
  }

  test("x3 two-level stratified rank equals the naive per-stratum row_number") {
    val dir = sf("sf0.001")
    val got = q("x3_stratified_exact")
    // naive definition: one window per whole stratum (the single-task-per-
    // stratum shape the two-level rank exists to avoid)
    val h = Tables(spark, dir, "documents").select(col("doc_id"), col("lang"))
      .withColumn("hh",
        md5(concat(lit("strat:"), col("doc_id").cast("string")).cast("binary")))
    val naive = h
      .withColumn("strat_rank",
        row_number().over(Window.partitionBy("lang").orderBy("hh", "doc_id"))
          .cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .where(col("strat_rank") <= expr("(n + 4) div 5"))
      .select("doc_id", "lang", "strat_rank")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("x3 keeps exactly ceil(n/5) docs per stratum, deterministically") {
    val totals = Tables(spark, sf("sf0.001"), "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = q("x3_stratified_exact").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet === totals.keySet, "every stratum must be represented")
    totals.foreach { case (lang, n) =>
      assert(kept(lang) === (n + 4) / 5, s"stratum $lang quota")
    }
    assert(q("x3_stratified_exact").collect().toSeq ===
      q("x3_stratified_exact").collect().toSeq, "hash order must be replay-stable")
  }

  test("x7 soft dedup: singletons always survive, keep flag is the integer draw, clusters match d7") {
    import spark.implicits._
    val rows = q("x7_soft_dedup_sample")
      .select("doc_id", "cluster", "cluster_size", "keep")
      .as[(Long, Long, Long, Int)].collect()
    assert(rows.length === 500)
    // a singleton's draw h·1 < 10^6 is always true — hard dedup of
    // unique content would be a bug, soft dedup must never drop it
    rows.filter(_._3 == 1L).foreach { case (id, _, _, keep) =>
      assert(keep === 1, s"singleton doc $id dropped")
    }
    // keep ⟺ the salted integer draw, recomputed independently
    val draws = q("x7_soft_dedup_sample")
      .select(col("doc_id"),
        pmod(graft.functions.md5Prefix60(
          concat(lit("soft:"), col("doc_id").cast("string"))), lit(1000000L)).as("h"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, _, size, keep) =>
      assert(keep === (if (draws(id) * size < 1000000L) 1 else 0), s"doc $id")
    }
    // cluster assignment is exactly d7's (same shared component stage)
    val d7 = q("d7_dedup_clusters")
      .select("doc_id", "keep_id").as[(Long, Long)].collect().toMap
    rows.foreach { case (id, cluster, _, _) =>
      assert(cluster === d7(id), s"doc $id: x7 cluster $cluster != d7 ${d7(id)}")
    }
    // expected survivors per cluster is 1; with ~150 clusters the total
    // kept count concentrates — a loose 3σ-style band catches a broken
    // draw (all-keep ≈ 500, all-drop = 0) without flaking
    val clusters = rows.map(_._2).distinct.length
    val kept = rows.count(_._4 == 1)
    assert(kept > clusters / 2 && kept < clusters * 2,
      s"kept $kept far from expected ≈ $clusters")
  }

  test("x8 DSIR: feature counts match bigrams, scores separate target from raw") {
    import spark.implicits._
    val rows = q("x8_dsir_sample")
      .select("doc_id", "n_feat", "score9", "keep")
      .as[(Long, Long, Long, Int)].collect()
    assert(rows.toSeq === q("x8_dsir_sample")
      .select("doc_id", "n_feat", "score9", "keep")
      .as[(Long, Long, Long, Int)].collect().toSeq, "must be replay-stable")
    // n_feat is the bigram count: n_tokens - 1 for every scoreable doc
    val nToks = Tables(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), size(tokens(col("text"))).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(rows.length === nToks.count(_._2 >= 2))
    rows.foreach { case (id, nf, _, _) =>
      assert(nf === nToks(id) - 1L, s"doc $id n_feat")
    }
    // keep is exactly the sign gate
    rows.foreach { case (id, _, s9, keep) =>
      assert(keep === (if (s9 > 0) 1 else 0), s"doc $id keep flag")
    }
    // the model must actually separate: target-language docs score
    // higher per-feature than the rest on average (en bigrams populate
    // the target buckets by construction)
    val langs = Tables(spark, sf("sf0.001"), "documents")
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    def meanPerFeat(p: ((Long, Long, Long, Int)) => Boolean) = {
      val sel = rows.filter(p)
      sel.map(r => r._3.toDouble / r._2).sum / sel.length
    }
    val en = meanPerFeat(r => langs(r._1) == "en")
    val rest = meanPerFeat(r => langs(r._1) != "en")
    assert(en > rest,
      s"en per-feature score $en must exceed non-en $rest — model not separating")
  }

  test("x9 split is leakage-safe: every member of a near-dup cluster lands in the same split") {
    import spark.implicits._
    val rows = q("x9_cluster_split")
      .select("doc_id", "cluster", "bucket", "split")
      .as[(Long, Long, Long, String)].collect()
    assert(rows.length === 500)
    // THE property: split is a function of the cluster
    rows.groupBy(_._2).foreach { case (cluster, members) =>
      assert(members.map(_._4).distinct.length === 1,
        s"cluster $cluster straddles splits: ${members.map(m => m._1 -> m._4).toSeq}")
    }
    // clusters are exactly d7's
    val d7 = q("d7_dedup_clusters")
      .select("doc_id", "keep_id").as[(Long, Long)].collect().toMap
    rows.foreach { case (id, cluster, _, _) =>
      assert(cluster === d7(id), s"doc $id: x9 cluster $cluster != d7 ${d7(id)}")
    }
    // split is the stated bucket mapping, and all three splits exist
    // with roughly the 80/10/10 cluster-level shape (loose band)
    rows.foreach { case (id, _, b, s) =>
      val expect = if (b < 800) "train" else if (b < 900) "val" else "test"
      assert(s === expect, s"doc $id bucket $b split $s")
    }
    val clusterSplit = rows.groupBy(_._2).map { case (_, ms) => ms.head._4 }
    val frac = clusterSplit.count(_ == "train").toDouble / clusterSplit.size
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac far from 0.8")
    assert(Set("train", "val", "test").subsetOf(rows.map(_._4).toSet))
  }

  test("t12 novelty stats are self-consistent with token counts") {
    import spark.implicits._
    val stats = q("t12_bigram_novelty").collect()
    val nToks = Tables(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), size(tokens(col("text"))).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(stats.length === nToks.count(_._2 >= 2))
    stats.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_bigrams") === nToks(id) - 1L,
        s"doc $id: every adjacent pair is one bigram")
      // each bigram occurs at least once (itself) and the mean is the
      // exact ratio of the two integer aggregates
      assert(r.getAs[Long]("min_freq") >= 1L)
      assert(r.getAs[Long]("sum_freq") >= r.getAs[Long]("n_bigrams"))
      assert(r.getAs[Double]("avg_freq") ===
        r.getAs[Long]("sum_freq").toDouble / r.getAs[Long]("n_bigrams").toDouble)
    }
  }

  test("d8 never flags benchmark members and only flags true overlaps") {
    val rows = q("d8_decontaminate").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("doc_id") % 97 != 0))
    assert(rows.forall { r =>
      r.getAs[Long]("n_shared") >= 1 && r.getAs[Long]("n_bench_docs") >= 1
    })
  }

  test("t9 top term actually occurs in its document") {
    import spark.implicits._
    val top = q("t9_tfidf_top_term")
      .select("doc_id", "top_term").as[(Long, String)].collect().toMap
    val texts = Tables(spark, sf("sf0.001"), "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(top.nonEmpty)
    top.foreach { case (id, term) =>
      assert(texts(id).split(" ").contains(term), s"doc $id lost term $term")
    }
  }

  test("t10 redaction removes every injected email and phone") {
    val rows = q("t10_pii_redact").collect()
    assert(rows.forall(_.getAs[Int]("n_emails") >= 1))
    assert(rows.forall(_.getAs[Int]("n_phones") >= 1))
    assert(rows.forall { r =>
      val red = r.getAs[String]("redacted")
      !red.contains("@example.com") && !red.matches(".*\\+1-555-[0-9]{4}.*")
    })
  }

  test("a25 grouping-set levels are mutually consistent") {
    val rows = q("a25_grouping_sets").collect()
    val fine = rows.filter(_.getAs[Int]("gid") == 0)
    val mid = rows.filter(_.getAs[Int]("gid") == 1)
    val total = rows.filter(_.getAs[Int]("gid") == 3)
    assert(total.length === 1)
    assert(total.head.getAs[Long]("n") === fine.map(_.getAs[Long]("n")).sum)
    mid.foreach { m =>
      val rf = m.getAs[String]("rf")
      val kids = fine.filter(_.getAs[String]("rf") == rf)
      assert(m.getAs[Long]("n") === kids.map(_.getAs[Long]("n")).sum)
      assert(math.abs(m.getAs[Double]("qty") -
        kids.map(_.getAs[Double]("qty")).sum) < 1e-6)
    }
  }

  test("x4 epoch shuffle: a permutation — every doc once, dense per-shard positions") {
    val a = q("x4_epoch_shuffle").collect()
    val b = q("x4_epoch_shuffle").collect()
    assert(a.toSeq === b.toSeq, "shuffle order must be replay-stable")

    val nDocs = Tables(spark, sf("sf0.001"), "documents").count()
    assert(a.map(_.getAs[Long]("doc_id")).distinct.length.toLong === nDocs)
    a.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val ps = rows.map(_.getAs[Int]("pos")).sorted
      assert(ps.toSeq === (1 to rows.length), "positions must be dense from 1")
    }
  }

  test("x5 upsampling: copy counts bounded by floor/ceil of each lang's epoch weight") {
    val rows = q("x5_repeat_upsample").collect()
    val bounds = Map( // floor/ceil of en 0.8, zh 1.5, es 2.25, de 3.0, fr 0.4
      "en" -> (0, 1), "zh" -> (1, 2), "es" -> (2, 3), "de" -> (3, 3), "fr" -> (0, 1))
    val perDoc = rows.groupBy(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    perDoc.foreach { case ((_, lang), cs) =>
      val (lo, hi) = bounds(lang)
      assert(cs.length >= math.max(lo, 1) && cs.length <= hi)
      assert(cs.map(_.getAs[Int]("copy")).sorted.toSeq === (1 to cs.length),
        "copy indexes must be dense from 1")
    }
    // docs absent from the output are exactly the zero-copy draws of a
    // fractional-epoch lang (never de, whose weight is a whole number)
    val emitted = perDoc.keySet.map(_._1)
    Tables(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("lang")).collect()
      .filterNot(r => emitted.contains(r.getLong(0)))
      .foreach(r => assert(r.getString(1) != "de"))
  }

  test("x11 histogram rank = naive global rank; serpentine balances within one doc") {
    val dir = sf("sf0.001")
    val got = q("x11_shard_balance").collect()
    val W = 6

    // the scalable histogram-offset rank must equal the one-partition
    // global window it replaces
    val t = Tables(spark, dir, "documents")
      .select(col("doc_id"), size(tokens(col("text"))).as("n_tokens"))
    val naive = t.withColumn("rnk",
        row_number().over(Window.orderBy(desc("n_tokens"), col("doc_id"))))
      .collect().map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    got.foreach(r =>
      assert(r.getAs[Long]("rnk") === naive(r.getAs[Long]("doc_id"))))

    // serpentine guarantees: every shard populated, doc counts within 1,
    // token totals within one document's tokens of each other
    val byShard = got.groupBy(_.getAs[Int]("shard_id"))
    assert(byShard.keySet === (0 until W).toSet)
    val counts = byShard.view.mapValues(_.size).values.toSeq
    assert(counts.max - counts.min <= 1)
    val totals = byShard.view
      .mapValues(_.map(_.getAs[Int]("n_tokens").toLong).sum).values.toSeq
    val maxDoc = got.map(_.getAs[Int]("n_tokens")).max.toLong
    assert(totals.max - totals.min <= maxDoc,
      s"shard token totals ${totals.sorted} spread more than one doc ($maxDoc)")
  }
}
