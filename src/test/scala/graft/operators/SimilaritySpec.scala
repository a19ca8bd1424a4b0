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
}
