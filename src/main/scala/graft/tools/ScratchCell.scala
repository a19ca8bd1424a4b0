package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.DedupPack

/** Scratch-model capture for the band-shard auto-pick (SCALING.md
  * §3f-addendum / r17): compute the real signature matrix of a fixture,
  * sample its own row width, derive the per-row scratch the way
  * [[graft.operators.DedupPack.bandShardsOf]]'s auto path now does, and
  * print the shard pick for a stated budget — ONE JSON line, so the
  * "derived constant lands on the measured optimum" claim is a committed
  * artifact instead of an assertion. Timings come from the slope
  * harness, never from here.
  *
  * Usage: runMain graft.tools.ScratchCell <sfDir> <budgetBytes>
  */
object ScratchCell {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, budgetStr) = args.take(2)
    val budget = budgetStr.toLong
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sig = DedupPack.signaturesOf(Tables(spark, sfDir, "documents"))
      .localCheckpoint(true)
    val rows = sig.count()
    val sampled = DedupPack.sampledSigRowBytes(sig)
    val prior = DedupPack.scratchBytesPerRow(spark, sig)
    // The r18 spill probe, run UNCONDITIONALLY here (the production path
    // in bandShardsOf skips it when it can't move the pick) — this tool
    // exists to make the whole derivation a committed artifact, probe
    // reading included.
    val probed = DedupPack.probedSpillPerRow(spark, sig)
    val perRow = DedupPack.derivedScratchPerRow(prior, probed)
    val pick = DedupPack.autoBandShards(rows, budget, perRow)
    println(s"""{"dir":"$sfDir","sig_rows":$rows,"sampled_row_bytes":$sampled,"prior_per_row_scratch":$prior,"probed_spill_per_row":$probed,"derived_per_row_scratch":$perRow,"budget_bytes":$budget,"auto_shards":$pick}""")
    spark.stop()
  }
}
