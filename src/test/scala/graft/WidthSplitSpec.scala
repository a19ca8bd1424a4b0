package graft

/** g1's two-stage width split (round-6 verdict): the corpus-sized
  * candidate-graph build must run at the CALLER's shuffle width — only the
  * few-hundred-row PageRank iteration may drop to the width-4 child
  * session. This pins the mechanism: DedupPack.candidatePairs materializes
  * on the session it is given, so its output partitioning is that
  * session's width, not the iteration child's.
  */
class WidthSplitSpec extends SparkSuite {

  test("candidatePairs builds at the caller session's width, not the g1 child's 4") {
    // AQE off so the observed partition count IS the configured shuffle
    // width (with AQE on, tiny test data coalesces and hides the width).
    val parent = spark.newSession()
    parent.conf.set("spark.sql.adaptive.enabled", "false")
    parent.conf.set("spark.sql.shuffle.partitions", "16")
    val pairs = graft.operators.DedupPack.candidatePairs(parent, sf("sf0.001"))
    assert(pairs.rdd.getNumPartitions == 16,
      s"candidate-graph build ran at width ${pairs.rdd.getNumPartitions}, " +
        "expected the caller session's 16 — the corpus-sized stage must " +
        "not inherit the narrow iteration width")
  }
}
