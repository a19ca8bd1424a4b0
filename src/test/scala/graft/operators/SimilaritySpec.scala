package graft.operators

import graft.{SparkSuite, SparkEntry}

/** The approximate similarity paths (no DuckDB oracle) still have hard
  * guarantees to pin: determinism across runs, and candidate sets that are
  * genuine subsets of the corpus scored identically to the exact path.
  */
class SimilaritySpec extends SparkSuite {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf("sf0.001")).collect()
      .map(_.toString).toSeq

  test("e5_ivf_knn is deterministic across invocations") {
    assert(run("e5_ivf_knn") == run("e5_ivf_knn"))
  }

  test("e4_knn_lsh is deterministic across invocations") {
    assert(run("e4_knn_lsh") == run("e4_knn_lsh"))
  }

  test("approximate scores agree with the exact scorer for shared vec_ids") {
    val exact = SparkEntry.queries("e2_knn_expr")(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = SparkEntry.queries("e5_ivf_knn")(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val shared = exact.keySet intersect ivf.keySet
    shared.foreach { id => assert(exact(id) == ivf(id), s"vec $id") }
  }

  test("e9 bounded-heap batch KNN equals the window formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.cosine_similarity
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("e9_knn_batch")(spark, dir)
    val emb = graft.Tables(spark, dir, "embeddings")
    val qs = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val sc = emb.where(col("vec_id") >= 8).crossJoin(qs)
      .select(col("q_id"), col("vec_id"),
        round(cosine_similarity(col("embedding"), col("qe")) * 1e6, 0)
          .cast("long").as("cos6"))
    val w = Window.partitionBy("q_id").orderBy(col("cos6").desc, col("vec_id"))
    val naive = sc.withColumn("rn", row_number().over(w)).where(col("rn") <= 20)
      .select(col("q_id"), col("vec_id"),
        (col("cos6").cast("double") / 1000000.0).as("cos_sim"), col("rn"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("e11 RRF fusion: scores recompute from the ranks, order is correct, both rankers contribute") {
    val rows = SparkEntry.queries("e11_hybrid_rrf")(spark, sf("sf0.001"))
      .collect().map { r =>
        (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getInt(1)),
          if (r.isNullAt(2)) None else Some(r.getInt(2)),
          r.getDouble(3))
      }.toSeq
    assert(rows.length == 20)
    rows.foreach { case (id, rd, rs, score) =>
      assert(rd.isDefined || rs.isDefined, s"doc $id in neither ranked list")
      val expected = rd.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rs.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(score == expected, s"doc $id: rrf $score != recomputed $expected")
      assert(rd.forall(r => r >= 1 && r <= 50) && rs.forall(r => r >= 1 && r <= 50))
    }
    // fused order: descending score, doc_id tiebreak
    val key = rows.map { case (id, _, _, s) => (-s, id) }
    assert(key == key.sorted, "e11 output not in (rrf desc, doc_id) order")
    // the fusion must actually fuse: docs ranked by BOTH lists exist and
    // outrank everything ranked by only one list at comparable depth
    assert(rows.exists { case (_, rd, rs, _) => rd.isDefined && rs.isDefined },
      "no doc carried both a dense and a sparse rank")
  }

  test("e15 filtered KNN: every hit satisfies the predicate and equals the naive filtered top-20") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("e15_filtered_knn")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(got.length == 20)
    got.foreach { case (id, label, _) =>
      assert(label % 3 == 1, s"vec $id label $label escapes the filter")
    }
    // naive reference: score EVERYTHING with the HOF cosine (the e1
    // baseline kernel), filter after, take 20 — pre-filtering must not
    // change the answer, only the work
    val e = graft.Tables(spark, dir, "embeddings")
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    val naive = e.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(graft.functions.cosine_similarity_hof(col("embedding"), col("qe")), 6)
          .as("cos_sim"))
      .where(col("label") % 3 === 1)
      .orderBy(desc("cos_sim"), col("vec_id")).limit(20)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(got == naive)
  }

  test("e16 MMR: picks are distinct shortlist members, rank 1 is the relevance argmax, and diversification reorders") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val got = SparkEntry.queries("e16_mmr_diversify")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._1) == (1 to 10), "ranks must be 1..10 in order")
    assert(got.map(_._2).distinct.length == 10, "picks must be distinct")
    // the shortlist the greedy ran on: top-20 by (rel6 desc, vec_id)
    val e = graft.Tables(spark, dir, "embeddings")
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    val short = e.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(graft.functions.cosine_similarity(col("embedding"), col("qe")) * 1e6, 0)
          .cast("long").as("rel6"))
      .orderBy(col("rel6").desc, col("vec_id")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val rel = short.toMap
    got.foreach { case (_, id, r6) =>
      assert(rel.get(id).contains(r6), s"pick $id not in shortlist / rel6 drifted")
    }
    // rank 1 is pure relevance (no redundancy penalty yet)
    assert(got.head._2 == short.maxBy { case (id, r) => (r, -id) }._1)
    // and the OTHER nine are not simply the next-best by relevance —
    // MMR must trade relevance for diversity somewhere in the list
    val topByRel = short.sortBy { case (id, r) => (-r, id) }.take(10).map(_._1).toSet
    assert(got.map(_._2).toSet != topByRel,
      "MMR output equals the pure-relevance top-10: no diversification happened")
  }

  test("e19 audit conserves the corpus and splits exactly the >2x-mean lists") {
    val dir = sf("sf0.001")
    val rows = SparkEntry.queries("e19_ivf_append")(spark, dir).collect()
    val emb = graft.Tables(spark, dir, "embeddings")
    val n = emb.count()
    val k = IvfIndex.Pretrained.length

    // conservation: every vector lands in exactly one list
    assert(rows.map(_.getAs[Long]("n_total")).sum === n)
    // the "new batch" really is the vec_id % 10 = 0 class
    import org.apache.spark.sql.functions.col
    assert(rows.map(_.getAs[Long]("n_new")).sum ===
      emb.where(col("vec_id") % 10 === 0).count())
    // the split flag is the exact integer rule, nothing else
    rows.foreach { r =>
      val t = r.getAs[Long]("n_total")
      assert((r.getAs[Int]("needs_split") == 1) === (t * k > 2 * n),
        s"cid ${r.getAs[Int]("cid")}: n_total=$t")
    }
  }
}
