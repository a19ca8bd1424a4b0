package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Round-18 invariants: the spill-probed scratch derivation (the §3f
  * fixture ratio becomes a FLOOR that runtime evidence raises), its
  * precedence order, and the UTF-8-byte string sizing fix in the width
  * sample. Wall-clock validation of the derived picks is the SLOPES_r18
  * cells' job; these pin the arithmetic and the wiring.
  */
class Round18OpsSpec extends SparkSuite {

  test("scratch derivation arithmetic: the fixture prior floors, probe evidence raises") {
    // r17 verdict next-#1: the width term self-calibrated but the 4x
    // spill ratio was the §3f fixture family's. The probe regime
    // (max-sharded) LOWER-BOUNDS the unsharded ratio, so evidence may
    // only raise the model — a spill-free or lighter probe keeps the
    // measured prior ("fixture fallback on no evidence").
    assert(DedupPack.derivedScratchPerRow(112L, 0L) == 112L)
    assert(DedupPack.derivedScratchPerRow(112L, 90L) == 112L)
    // a heavier-colliding corpus raises it — the silent-under-sharding
    // class this derivation closes
    assert(DedupPack.derivedScratchPerRow(112L, 150L) == 150L)
    // the prior itself scales with the matrix's own width (r17)
    assert(DedupPack.derivedScratchPerRow(160L, 150L) == 160L)
  }

  test("probe wiring: conf wins outright, probe runs end-to-end and reads 0 on a spill-free matrix") {
    import spark.implicits._
    val sig = (0L until 64L)
      .flatMap(d => (0 until 4).map(b => (d, b, d * 31L + b)))
      .toDF("doc_id", "band", "minhash")
    // explicit per-row conf is absolute — no probe, no derivation
    spark.conf.set("graft.dedup.scratchBytesPerSigRow", "999")
    try assert(DedupPack.scratchBytesPerRow(spark, sig, 1.0) == 999L)
    finally spark.conf.unset("graft.dedup.scratchBytesPerSigRow")
    // the probe executes the real one-band-group workload under the
    // metrics listener; a tiny in-memory matrix spills nothing, so the
    // reading is 0 and the prior holds
    assert(DedupPack.probedSpillPerRow(spark, sig) == 0L)
    // empty slice: 0, never a division error
    assert(DedupPack.probedSpillPerRow(spark,
      sig.where(col("band") === 99)) == 0L)
    // end-to-end through the auto path: budget forces a multi-shard
    // prior BELOW the NumBands clamp so the probe is consulted (and
    // reads 0 here), and the pick equals the pure width model's
    // 64 docs x 4 bands x 112 B = 28672 B; budget 16384 -> 2 shards
    spark.conf.set("graft.dedup.scratchBudgetBytes", "16384")
    try assert(DedupPack.bandShardsOf(spark, sig) == 2)
    finally spark.conf.unset("graft.dedup.scratchBudgetBytes")
    // probe opt-out leaves the same prior-driven pick
    spark.conf.set("graft.dedup.scratchBudgetBytes", "16384")
    spark.conf.set("graft.dedup.scratchProbe", "false")
    try assert(DedupPack.bandShardsOf(spark, sig) == 2)
    finally {
      spark.conf.unset("graft.dedup.scratchBudgetBytes")
      spark.conf.unset("graft.dedup.scratchProbe")
    }
  }

  test("probe is optional evidence: failures degrade to the prior, the caller's job group survives") {
    import spark.implicits._
    val sc = spark.sparkContext
    // a probe whose ACTION fails (ANSI division by zero surfaces when
    // the aggregation first evaluates minhash) must log and return 0 —
    // the fixture prior carries the pick exactly as if skipped, never
    // failing the dedup query the probe serves (review finding)
    val bad = (0L until 8L).flatMap(d => (0 until 4).map(b => (d, b)))
      .toDF("doc_id", "band").withColumn("minhash", expr("1 div 0"))
    assert(DedupPack.probedSpillPerRow(spark, bad) == 0L)
    // the probe scopes its metrics with its own job group but must
    // RESTORE the caller's (review finding: clearing it would drop a
    // multi-tenant driver's cancellation scope for the main passes
    // that follow)
    val sig = (0L until 16L)
      .flatMap(d => (0 until 4).map(b => (d, b, d * 31L + b)))
      .toDF("doc_id", "band", "minhash")
    sc.setJobGroup("tenant-1", "outer work")
    try {
      assert(DedupPack.probedSpillPerRow(spark, sig) == 0L)
      assert(sc.getLocalProperty("spark.jobGroup.id") == "tenant-1")
      assert(sc.getLocalProperty("spark.job.description") == "outer work")
    } finally sc.clearJobGroup()
    // ...and a caller with NO group gets none left behind
    assert(DedupPack.probedSpillPerRow(spark, sig) == 0L)
    assert(sc.getLocalProperty("spark.jobGroup.id") == null)
  }

  test("sampled row width counts UTF-8 BYTES, not characters (r17 ADVICE)") {
    import spark.implicits._
    // 'é' is 1 character but 2 UTF-8 bytes — what UnsafeRow stores. The
    // character count undercounted non-ASCII corpora, which is exactly
    // the silent under-sharding class the width derivation exists to
    // eliminate.
    val df = Seq.fill(50)(("ééééé", 1L)).toDF("s", "v")
    // 8 header + (10 string bytes + 8 offset word) + 8 long = 34
    assert(DedupPack.sampledSigRowBytes(df, 1.0) == 34L)
    // binary stays byte-accurate through length()
    val bin = Seq.fill(50)((Array[Byte](1, 2, 3), 1L)).toDF("b", "v")
    // 8 header + (3 bytes + 8 offset word) + 8 long = 27
    assert(DedupPack.sampledSigRowBytes(bin, 1.0) == 27L)
  }
}
