package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite

class WinnowSpec extends SparkSuite {
  import spark.implicits._

  /** Reference implementation: direct polynomial per gram (the exact
    * formula the DuckDB oracle evaluates), naive window minima, distinct.
    */
  private def reference(s: String): Seq[Long] = {
    val cps = s.codePoints.toArray
    val g = WinnowFingerprints.GramLen
    val ng = cps.length - g + 1
    if (ng <= 0) return Seq.empty
    val h = (0 until ng).map { i =>
      (0 until g).map(j =>
        cps(i + j) * WinnowFingerprints.Pows(j) % WinnowFingerprints.Mod)
        .sum % WinnowFingerprints.Mod
    }
    (0 until ng).map { t =>
      h.slice(t, math.min(t + WinnowFingerprints.WindowLen, ng)).min
    }.distinct.sorted
  }

  test("rolling hash equals the oracle's direct polynomial on sample text") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaa",          // repeated grams collapse under distinct
      "abcdefgh",            // exactly one gram
      "short",               // fewer chars than a gram -> empty
      "café latte with unicode ümläuts")
    texts.foreach { t =>
      val got = WinnowFingerprints.javaWinnow(UTF8String.fromString(t))
        .toLongArray().toSeq
      assert(got == reference(t), s"mismatch for: $t")
    }
  }

  test("codegen and interpreted eval agree on real documents") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents").limit(100)
    val viaQuery = docs
      .select($"doc_id", winnow_fingerprints($"text").as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    val texts = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    texts.foreach { case (id, t) =>
      val interp = WinnowFingerprints.javaWinnow(UTF8String.fromString(t))
        .toLongArray().toSeq
      assert(viaQuery(id) == interp, s"doc $id")
    }
  }

  test("fingerprints are sorted, distinct, in [0, Mod)") {
    val fps = graft.Tables(spark, sf("sf0.001"), "documents")
      .select(winnow_fingerprints($"text").as("fp"))
      .as[Seq[Long]].collect()
    fps.foreach { a =>
      assert(a == a.sorted && a.distinct.size == a.size)
      assert(a.forall(v => v >= 0 && v < WinnowFingerprints.Mod))
    }
  }

  test("t5 plan: no shuffle before the explode (scan -> project -> generate)") {
    val plan = graft.operators.TextPack
      .queries("t5_winnow_fingerprint")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    val generateAt = plan.indexOf("Generate")
    val exchangeAt = plan.indexOf("Exchange")
    assert(generateAt >= 0 && exchangeAt >= 0)
    // Plans print top-down, so the only Exchange (the final sort) must
    // appear ABOVE the Generate that does the winnow.
    assert(exchangeAt < generateAt,
      s"winnow should shuffle only for the final sort:\n$plan")
  }
}
