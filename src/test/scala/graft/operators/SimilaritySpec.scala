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
}
