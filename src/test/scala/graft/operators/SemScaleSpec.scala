package graft.operators

import java.nio.file.Files

import graft.SparkSuite

/** d12/pipeline3's at-scale path: above k·targetClusterSize vectors,
  * `semAssign` abandons the k=16 pretrained quantizer and trains
  * k = ⌈n/target⌉ centroids with the deterministic Lloyd's iteration the
  * e10 surface exposes, holding mean cluster size — and therefore the
  * within-cluster pairwise cost per vector — constant as the corpus
  * grows (the SCALING.md x10 capture measured the fixed-k alternative at
  * ~n²). This spec pins the two invariants the switch must preserve:
  *
  *   1. determinism — same corpus in, bit-identical (vec_id, cid) out,
  *      twice (fixed init = first k by vec_id, lowest-index argmin ties);
  *   2. exact-duplicate safety — identical vectors land on identical
  *      nearest centroids under ANY centroid set, so every junior exact
  *      duplicate (cosine = 1 to a lower vec_id) MUST be dropped by the
  *      scaled path, exactly as it is by the pretrained path. Refining
  *      the clustering can only lose CROSS-cluster near-dup comparisons
  *      (the documented SemDeDup approximation knob), never exact ones.
  */
class SemScaleSpec extends SparkSuite {

  test("scaled semdedup is deterministic and drops every junior exact-duplicate") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(42)
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    val base = (0L until 120L).map(i => (i, vec()))
    // 40 exact duplicates of the first 20 base vectors (2 juniors each)
    val dups = (0 until 40).map(j => (120L + j, base(j % 20)._2))
    val dir = Files.createTempDirectory("graft-semscale-").toString
    (base ++ dups).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // n=160 > 16·4 ⇒ the trained path with k = ⌈160/4⌉ = 40 centroids
    spark.conf.set("graft.semdedup.targetClusterSize", "4")
    try {
      def run() = DedupPack.queries("d12_semdedup")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getInt(1))
      val kept = run()
      assert(kept.sameElements(run()), "scaled path must be deterministic")
      val keptIds = kept.map(_._1).toSet
      (120L until 160L).foreach { junior =>
        assert(!keptIds.contains(junior),
          s"junior exact-duplicate $junior must be dropped at any k")
      }
      // the 20 most-senior vectors can never be dropped: each is either
      // its cluster's minimum or preceded only by non-identical vectors
      // that cannot outrank it as "senior exact duplicate"; at least the
      // global minimum id always survives
      assert(keptIds.contains(0L), "the most-senior vector always survives")
      assert(kept.map(_._2).max >= 16,
        "assignment must use more clusters than the pretrained k=16")
    } finally spark.conf.unset("graft.semdedup.targetClusterSize")
  }

  test("two-level assignment tier preserves the same invariants") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    val base = (0L until 200L).map(i => (i, vec()))
    val dups = (0 until 56).map(j => (200L + j, base(j % 28)._2))
    val dir = java.nio.file.Files.createTempDirectory("graft-semscale2-").toString
    (base ++ dups).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // n=256, target=2 ⇒ k=128 > SemTwoLevelK=64 ⇒ the e14 two-level
    // coarse tier carries the full-corpus assignment
    spark.conf.set("graft.semdedup.targetClusterSize", "2")
    try {
      def run() = DedupPack.queries("d12_semdedup")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getInt(1))
      val kept = run()
      assert(kept.sameElements(run()), "two-level path must be deterministic")
      val keptIds = kept.map(_._1).toSet
      (200L until 256L).foreach { junior =>
        assert(!keptIds.contains(junior),
          s"junior exact-duplicate $junior must be dropped under two-level assignment")
      }
      assert(keptIds.contains(0L))
    } finally spark.conf.unset("graft.semdedup.targetClusterSize")
  }
}
