package graft.operators

import graft.SparkSuite

/** d14's claim is strong — every output row is a MAXIMAL VERBATIM shared
  * token run — and hash equality with the oracle can't prove it (both
  * engines could share a bug in the islands merge). Re-verify the claim
  * against the raw documents on the driver: slice the tokens and compare.
  */
class SubstringRunsSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sf("sf0.01")

  test("d14: every run is a verbatim shared span, maximal on both ends") {
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val runs = DedupPack.queries("d14_substring_runs")(spark, dir)
      .select("doc_a", "doc_b", "start_a", "start_b", "run_tokens")
      .as[(Long, Long, Int, Int, Int)].collect()
    assert(runs.nonEmpty, "d14 found no runs at sf0.01 — fixture regressed")
    runs.foreach { case (a, b, sa, sb, n) =>
      val (ta, tb) = (docs(a), docs(b))
      assert(n >= DedupPack.RunL, s"run ($a,$b) shorter than a window")
      assert(ta.slice(sa, sa + n) == tb.slice(sb, sb + n),
        s"run ($a,$b,$sa,$sb,len=$n) is not verbatim-shared")
      // maximality: one more token on either side must differ (or hit a
      // document boundary) — otherwise the islands merge under-extended.
      // Holds whenever the df-cap doesn't fire (max window df here is 4);
      // a capped boilerplate window CAN split a run at scale, by design.
      assert(!(sa > 0 && sb > 0 && ta(sa - 1) == tb(sb - 1)),
        s"run ($a,$b,$sa,$sb) extends left — not maximal")
      assert(!(sa + n < ta.length && sb + n < tb.length && ta(sa + n) == tb(sb + n)),
        s"run ($a,$b,$sa,$sb) extends right — not maximal")
    }
    val longest = runs.map(_._5).max
    info(s"d14: ${runs.length} maximal runs, longest $longest tokens")
  }
}
