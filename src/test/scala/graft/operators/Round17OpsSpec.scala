package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite, Tables}
import graft.functions.{md5Prefix60, tokens}

/** Semantic invariants for the round-17 changes: the token-contiguous
  * phase attribution in x19/x20 (each phase owns a contiguous token
  * range of ONE cumulative realization per source) and the guarded
  * epoch division. Value-level cross-engine equality is the DuckDB
  * crosscheck's job; these pin the attribution RULE — including that
  * the PREVIOUS rule genuinely drew the +1 overlap on this fixture, so
  * the change is observable, not vacuous.
  */
class Round17OpsSpec extends SparkSuite {
  private val dir = sf("sf0.001")

  test("epochSplit is loud on a zero-unique-token source, exact otherwise") {
    // r16 verdict "what's wrong" #2: the raw division threw an anonymous
    // ArithmeticException deep in the plan on a degenerate/empty shard
    assert(SamplingPack.epochSplit(90000L, 20000L, "src00") == (4L, 10000L))
    assert(SamplingPack.epochSplit(0L, 7L, "src01") == (0L, 0L))
    val e = intercept[IllegalArgumentException] {
      SamplingPack.epochSplit(0L, 0L, "src-degenerate")
    }
    assert(e.getMessage.contains("src-degenerate"), e.getMessage)
    assert(e.getMessage.contains("zero unique tokens"), e.getMessage)
  }

  test("scratch per sig row derives from the matrix's own sampled width") {
    import spark.implicits._
    // the engine's real signature schema (long doc_id, int band, long
    // minhash): 8+4+8 field bytes + 8 header = 28 B — the derivation
    // reproduces the §3f-measured 112 B constant exactly, so every
    // committed auto-pick cell stays valid
    val sigLike = Seq((1L, 0, 42L), (2L, 1, 43L))
      .toDF("doc_id", "band", "minhash")
    assert(DedupPack.sampledSigRowBytes(sigLike, 1.0) == 28L)
    assert(DedupPack.scratchBytesPerRow(spark, sigLike, 1.0) ==
      DedupPack.ScratchBytesPerSigRow) // 4 × 28 = the measured 112
    // a WIDER matrix (string minhash) scales the model instead of
    // silently undershooting the budget: 8 (doc_id) + 4 (band) +
    // (10 chars + 8 offset word) + 8 header = 38 B → 4 × 38 = 152
    val wide = Seq((1L, 0, "0123456789"), (2L, 1, "0123456789"))
      .toDF("doc_id", "band", "minhash")
    assert(DedupPack.sampledSigRowBytes(wide, 1.0) == 38L)
    assert(DedupPack.scratchBytesPerRow(spark, wide, 1.0) == 152L)
    // an empty matrix has no evidence — fall back to the measured
    // constant rather than deriving 0 (which would never shard)
    assert(DedupPack.scratchBytesPerRow(spark, sigLike.limit(0), 1.0) ==
      DedupPack.ScratchBytesPerSigRow)
    // the manual constant wins over the derivation
    spark.conf.set("graft.dedup.scratchBytesPerSigRow", "999")
    try assert(DedupPack.scratchBytesPerRow(spark, sigLike, 1.0) == 999L)
    finally spark.conf.unset("graft.dedup.scratchBytesPerSigRow")
  }

  test("range-delta realization: phases partition the cumulative draws (random property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the per-doc rule, pure: cumRepeats(A) = A div u + [ca <= A mod u]
    def f(a: Long, u: Long, ca: Long): Long =
      a / u + (if (ca <= a % u) 1L else 0L)
    val cases = Gen.listOfN(4000, for {
      u <- Gen.choose(1L, 500L)
      m <- Gen.choose(0L, 4L * u)
      a <- Gen.choose(0L, 4L * u - m) // carryover invariant: m + a <= 4u
      ca <- Gen.choose(1L, u) // cum_after of some doc in a u-token corpus
    } yield (u, m, a, ca))(Gen.Parameters.default, Seed(17L)).get
    for ((u, m, a, ca) <- cases) {
      val main = f(m, u, ca) - f(0, u, ca)
      val anneal = f(m + a, u, ca) - f(m, u, ca)
      // deltas are draws: never negative (cumRepeats is monotone in A)
      assert(main >= 0 && anneal >= 0, s"($u,$m,$a,$ca)")
      // phases PARTITION the cumulative realization — no overlap, no gap
      assert(main + anneal == f(m + a, u, ca), s"($u,$m,$a,$ca)")
      // per-doc total is exactly capped by the carryover invariant
      assert(main + anneal <= SamplingPack.MaxUniqueEpochs, s"($u,$m,$a,$ca)")
      // the main phase is unchanged vs the old per-phase rule (its range
      // starts at 0, and ca >= 1 > 0 means f(0)=0 on any real doc)
      assert(main == f(m, u, ca), s"($u,$m,$a,$ca)")
    }
  }

  test("x19 phases partition ONE cumulative realization; the old per-phase rule overlapped") {
    // Naive re-derivation of the draw line, per source: d1's
    // keep-min-doc_id dedup, the canonical salted-hash order, a plain
    // driver-side cumulative sum (sf0.001 is collect-sized).
    val line = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        md5Prefix60(col("text")).as("fp"),
        md5(concat(lit("real:"), col("doc_id").cast("string")).cast("binary"))
          .as("hh"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getAs[Any](3).toString, r.getString(4)))
      .groupBy(_._2).view.mapValues { rows =>
        val uniq = rows.groupBy(_._4).values.map(_.minBy(_._1)).toSeq
        var cum = 0L
        uniq.sortBy(d => (d._5, d._1)).map { d =>
          cum += d._3
          (d._1, d._3, cum) // (doc_id, n_tokens, cum_after)
        }
      }.toMap

    val sched = SparkEntry.queries("x17_anneal_schedule")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(2)) ->
        (r.getLong(4), r.getLong(8))).toMap // (phase, source) -> (unique, alloc)
    // x16's cumulative realization rule at token boundary A
    def cumRepeats(a: Long, u: Long, cumAfter: Long): Long =
      a / u + (if (cumAfter <= a % u) 1L else 0L)

    val got = SparkEntry.queries("x19_anneal_sample")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(3), r.getLong(2)) -> r.getLong(5))
      .toMap // (phase, source, doc) -> n_repeats

    var overlapDocs = 0
    for ((src, docs) <- line) {
      val (u, mAlloc) = sched(("main", src))
      val aAlloc = sched(("anneal", src))._2
      for ((docId, _, cumAfter) <- docs) {
        // the NEW rule: phase draws = delta of the cumulative
        // realization at the phase's token-range ends
        val atMain = cumRepeats(mAlloc, u, cumAfter)
        val atEnd = cumRepeats(mAlloc + aAlloc, u, cumAfter)
        val newMain = atMain
        val newAnneal = atEnd - atMain
        assert(newAnneal >= 0, s"negative delta for $src/$docId")
        assert(got.getOrElse(("main", src, docId), 0L) == newMain,
          s"main/$src/$docId engine draw != range-delta rule")
        assert(got.getOrElse(("anneal", src, docId), 0L) == newAnneal,
          s"anneal/$src/$docId engine draw != range-delta rule")
        // per-doc totals are the cumulative realization — exactly capped
        assert(atEnd <= SamplingPack.MaxUniqueEpochs,
          s"$src/$docId total $atEnd > cap")
        // the OLD rule (each phase realizes its own prefix from the same
        // leading docs): a doc inside both partial prefixes drew +1
        val old = cumRepeats(mAlloc, u, cumAfter) +
          cumRepeats(aAlloc, u, cumAfter)
        if (old > atEnd) overlapDocs += 1
      }
    }
    // the fixture must actually exercise the overlap the r17 rule
    // removes — otherwise this pin is vacuous
    assert(overlapDocs > 0,
      "no doc sat in both phases' partial prefixes — fixture too weak to pin the rule change")
  }
}
