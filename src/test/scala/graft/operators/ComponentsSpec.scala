package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The two d7 component-labeling paths must be interchangeable: the
  * bounded single-task union-find and the unbounded iterative min-label
  * propagation are different algorithms for the same fixpoint, so they
  * must emit identical (doc_id, label) sets on the same candidate graph.
  */
class ComponentsSpec extends SparkSuite {

  test("union-find and min-label propagation agree on the sf0.001 LSH graph") {
    val pairs = DedupPack.lshPairs(spark, sf("sf0.001"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(pairs.count() > 0, "fixture graph must be non-trivial")
    val uf = DedupPack.unionFindComponents(spark, pairs)
    val lp = DedupPack.propagateComponents(spark, pairs)
    assert(uf.count() === lp.count())
    assert(uf.exceptAll(lp).isEmpty && lp.exceptAll(uf).isEmpty)
    pairs.unpersist()
  }

  test("g1 PageRank: base bound, mass bound, determinism, exact value on isolated pairs") {
    val dir = sf("sf0.001")
    def run() = DedupPack.queries("g1_pagerank")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rank = run()
    assert(rank.nonEmpty)
    // every node holds at least the damping base, and floor divisions can
    // only LOSE mass relative to the uniform start
    assert(rank.values.forall(_ >= 150000L))
    assert(rank.values.sum <= rank.size * 1000000L)
    assert(run() === rank, "integer iteration must be replay-stable")

    // an isolated pair (both endpoints touch only each other) is a fixed
    // point of the iteration: 150000 + (1000000·850) div 1000 = 1000000
    val pairs = DedupPack.lshPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = pairs.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val isolated = pairs.filter { case (a, b) => deg(a) == 1 && deg(b) == 1 }
    assert(isolated.nonEmpty, "fixture should contain an isolated pair")
    isolated.foreach { case (a, b) =>
      assert(rank(a) === 1000000L && rank(b) === 1000000L)
    }
  }

  test("g2 triangle counts equal a brute-force adjacency-set enumeration") {
    val dir = sf("sf0.001")
    val got = DedupPack.queries("g2_triangle_counts")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = DedupPack.lshPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    pairs.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val nodes = adj.keySet
    val brute = nodes.map { v =>
      v -> adj(v).toSeq.combinations(2)
        .count { case Seq(x, y) => adj(x).contains(y) }.toLong
    }.toMap
    assert(got === brute.toMap)
    assert(got.values.sum % 3 === 0L, "each triangle counted at 3 vertices")
    assert(got.values.exists(_ > 0L), "fixture graph should contain triangles")
  }

  test("union-find matches a brute-force closure on random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val genEdges = Gen.listOfN(60,
      Gen.zip(Gen.choose(0L, 29L), Gen.choose(0L, 29L)))
    val graphs = Gen.listOfN(8, genEdges)(
      Gen.Parameters.default, Seed(7L)).get
    graphs.foreach { raw =>
      val edges = raw.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct
      if (edges.nonEmpty) {
        // brute-force reference: propagate min labels until fixpoint
        val label = scala.collection.mutable.Map.empty[Long, Long]
        edges.foreach { case (a, b) => label(a) = a; label(b) = b }
        var changed = true
        while (changed) {
          changed = false
          edges.foreach { case (a, b) =>
            val m = math.min(label(a), label(b))
            if (label(a) != m) { label(a) = m; changed = true }
            if (label(b) != m) { label(b) = m; changed = true }
          }
        }
        val got = DedupPack.unionFindComponents(
            spark, edges.toDF("doc_a", "doc_b"))
          .as[(Long, Long)].collect().toMap
        assert(got === label.toMap)
      }
    }
  }

  test("union-find labels every component by its least doc_id") {
    import spark.implicits._
    // two chains and a singleton edge: {1-2-3-4}, {10-11}, {20-21}
    val pairs = Seq((2L, 3L), (1L, 2L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val got = DedupPack.unionFindComponents(spark, pairs)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("d11 estimates cover exactly the d3 candidate pairs, bounded in (0, 1]") {
    val est = graft.SparkEntry.queries("d11_minhash_estimate")(spark, sf("sf0.001"))
      .collect()
    val estPairs = est.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val d3Pairs = graft.SparkEntry.queries("d3_lsh_pairs")(spark, sf("sf0.001"))
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(estPairs === d3Pairs, "every LSH candidate gets an estimate, nothing else")
    est.foreach { r =>
      val n = r.getAs[Long]("n_agree")
      assert(n >= 1L && n <= 4L, "a candidate agrees on at least the colliding band")
      assert(r.getAs[Double]("est_jaccard") === n.toDouble / 4.0)
    }
  }

  test("d10 keeps exactly one doc per cluster, and it is the longest (ties to min id)") {
    val rows = graft.SparkEntry.queries("d10_cluster_keep_best")(spark, sf("sf0.001"))
      .collect()
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (c, members) =>
      assert(members.count(_.getAs[Int]("is_kept") == 1) === 1, s"cluster $c")
      assert(members.forall(_.getAs[Long]("cluster_size") === members.length.toLong))
      val kept = members.find(_.getAs[Int]("is_kept") == 1).get
      val maxTok = members.map(_.getAs[Int]("n_tokens")).max
      assert(kept.getAs[Int]("n_tokens") === maxTok, s"cluster $c keeps a longest member")
      val tied = members.filter(_.getAs[Int]("n_tokens") == maxTok)
        .map(_.getAs[Long]("doc_id")).min
      assert(kept.getAs[Long]("doc_id") === tied, s"cluster $c tie-breaks to min id")
    }
    // d7 and d10 agree on the clustering itself
    val d7 = graft.SparkEntry.queries("d7_dedup_clusters")(spark, sf("sf0.001"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keep_id")).toMap
    rows.foreach { r =>
      assert(d7(r.getAs[Long]("doc_id")) === r.getAs[Long]("cluster"))
    }
  }
}
