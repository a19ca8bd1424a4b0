package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.functions.cosine_similarity

/** d12 semantic dedup semantics: "keep vec_id iff no lower-id vector in
  * its own IVF cluster has cosine >= τ". The spec recomputes the drop set
  * from the literal definition — enumerate within-cluster pairs
  * driver-side on the tiny fixture, score them in one pass — with none of
  * the query's staging (no self-join ordering, no anti-join), then checks
  * set algebra against d12's output.
  */
class SemDedupSpec extends SparkSuite {

  private val Tau = 0.35

  test("d12 keeps exactly the vectors with no senior in-cluster near-dup") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val kept = DedupPack.queries("d12_semdedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    val asg = IvfIndex
      .assign(Tables(spark, dir, "embeddings"), IvfIndex.Pretrained)
      .select(col("vec_id"), col("cid"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val all = asg.map(v => v._1 -> v._2).toMap
    val byCluster = asg.groupBy(_._2)

    // every within-cluster pair, seniority-ordered; scored in ONE pass
    // through the engine's own arithmetic (compiled cosine + round(_,6)),
    // so the spec cannot drift from the query's accumulation order
    val pairs = for {
      (_, members) <- byCluster.toSeq
      Array(a, b) <- members.sortBy(_._1).combinations(2).map(_.sortBy(_._1))
    } yield (b._1, a._3, b._3)
    val dropped = pairs.toDF("junior", "ea", "eb")
      .where(round(cosine_similarity(col("ea"), col("eb")), 6) >= Tau)
      .select("junior").collect().map(_.getLong(0)).toSet

    assert(kept.keySet === all.keySet -- dropped)
    assert(kept.forall { case (id, cid) => all(id) == cid },
      "kept rows must carry their assignment cluster")
    // every cluster's most-senior member can never be dropped
    byCluster.foreach { case (_, members) =>
      assert(kept.contains(members.map(_._1).min))
    }
    assert(dropped.nonEmpty, "fixture must exercise the drop path")
    assert(kept.nonEmpty)
  }

  test("d13 pair counts never exceed the true winnow-set intersection") {
    val dir = sf("sf0.001")
    val sets = graft.SparkEntry.queries("t5_winnow_fingerprint")(spark, dir)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val pairs = graft.SparkEntry.queries("d13_winnow_pairs")(spark, dir).collect()
    assert(pairs.nonEmpty, "fixture must produce span-dup candidates")
    pairs.foreach { r =>
      val (a, b, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b)
      assert(n >= 5L)
      // d13 counts only df-capped fingerprints, so its count is a lower
      // bound on the full intersection
      assert(n <= (sets(a) intersect sets(b)).size.toLong, s"pair ($a,$b)")
    }
  }

  test("pipeline3's sem_canonical set is exactly d12's kept set") {
    val dir = sf("sf0.001")
    val d12 = DedupPack.queries("d12_semdedup")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val p3 = CurationPipeline.queries("pipeline3_semantic")(spark, dir).collect()
    assert(p3.filter(_.getAs[Int]("sem_canonical") == 1)
      .map(_.getLong(0)).toSet === d12)
    // keep is the conjunction, never wider than either gate
    p3.foreach { r =>
      assert(r.getAs[Int]("keep") ===
        r.getAs[Int]("sem_canonical") * r.getAs[Int]("quality_ok"))
    }
  }
}
