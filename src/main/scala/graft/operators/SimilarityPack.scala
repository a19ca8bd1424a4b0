package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.functions.{cosine_similarity, cosine_similarity_hof, lsh_bucket_codes, nearest_centroids, sq8_cosine, tokens}

/** One scored candidate in e9's bounded per-query heap; `cos6` is the
  * cosine in integer micro-units (round(c·1e6)) so ordering is a long
  * compare both engines replay exactly.
  */
final case class KnnScore(q_id: Long, vec_id: Long, cos6: Long)

/** Similarity search over the `embeddings` table (`ARRAY<FLOAT>` vectors).
  *
  * e1/e2: brute-force cosine top-K — the exact baseline. The plan is a
  * broadcast of the single query vector against a scan; per-row fused
  * cosine (native codegen expression in e2, HOF baseline in e1) then
  * TakeOrderedAndProject. At 100 TB this is one pass over the corpus —
  * bandwidth-bound, embarrassingly parallel, no shuffle.
  *
  * e4: random-hyperplane LSH bucketing — the approximate scale path:
  * 16-bit signatures, shuffle only to co-locate same-bucket vectors, exact
  * re-scoring within buckets. Hyperplanes are deterministic (seeded
  * per-(plane,dim) hash), so results are reproducible run to run.
  */
object SimilarityPack extends QueryPack {

  private[operators] val Dim = 64
  private[operators] val NumPlanes = 64

  /** Deterministic pseudo-Gaussian-free hyperplanes: sign pattern from a
    * per-(plane,dim) hash. Rademacher ±1 components are a standard LSH
    * choice (Charikar'02 uses Gaussians; ±1 preserves the cosine-LSH
    * property in expectation and is cheap + reproducible). Exposed to
    * DedupPack so the d6 oracle embeds the identical plane constants.
    */
  // productHash is pinned deliberately (deprecated in 2.13.17): switching
  // to caseClassHash would change every hyperplane sign, silently moving
  // all LSH buckets and invalidating the embedded oracle constants.
  @scala.annotation.nowarn("cat=deprecation")
  private[operators] def planeSign(plane: Int, d: Int): Float = {
    val h = scala.util.hashing.MurmurHash3.productHash((plane, d))
    if ((h & 1) == 0) 1.0f else -1.0f
  }

  private[operators] val PlanesPerTable = 4
  private[operators] val NumTables = NumPlanes / PlanesPerTable

  /** Multi-table LSH: NumTables independent hash tables of PlanesPerTable
    * hyperplanes each — candidates share a bucket in ANY table. One wide
    * table (2^16 buckets over a sparse corpus) has near-zero recall;
    * narrow 16-bucket tables give each query ~1/16 of the corpus per
    * table as candidates — the standard recall/selectivity dial (more
    * planes per table ⇒ fewer candidates; more tables ⇒ higher recall).
    * `numTables` is per-operator: e4's top-20 gate needs 16 tables on
    * this near-random corpus (measured per-table hit p ≈ 0.14 for the
    * true neighbors: 4 tables → 0.5 recall, 8 → 0.7, 16 → ≈0.91), while
    * d6's pair search keeps 8 — its strong-pair recall is already 0.93
    * there and fewer tables keep the candidate set lean.
    *
    * All sign bits come from the fused [[graft.functions.LshBucketCodes]]
    * expression — one compiled pass dotting the vector against every
    * plane (sign(dot) == sign(cosine): the positive norms can't flip it,
    * and the DuckDB oracle replays the same dots via `list_dot_product`).
    */
  private[operators] def lshBuckets(s: SparkSession, emb: DataFrame,
      numTables: Int = NumTables): DataFrame = {
    require(numTables * PlanesPerTable <= NumPlanes)
    val planes = (0 until numTables * PlanesPerTable).map { p =>
      (0 until Dim).map(d => planeSign(p, d))
    }
    // eval_once (r18, guide §4.4): the optimizer collapses this
    // projection into the posexplode and then INFERS a
    // `size(lsh_bucket_codes(...)) > 0` filter below the Generate
    // (InferFiltersFromGenerate) — every vector dotted all planes twice
    // (e4's plan; d6's pin build carried the same clone). Barriered, the
    // generator input stays an attribute and the inferred filter is an
    // attribute test.
    emb.withColumn("_buckets", graft.functions.eval_once(
        lsh_bucket_codes(col("embedding"), typedLit(planes), PlanesPerTable)))
      .select(col("*"), posexplode(col("_buckets")).as(Seq("table", "bucket")))
      .drop("_buckets")
  }

  private def knn(s: SparkSession, dir: String, cos: (Column, Column) => Column): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    e.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cos(col("embedding"), col("qe")), 6).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_id"))
      .limit(20)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // e1: brute-force KNN with built-in HOFs (baseline formulation).
    "e1_knn_brute" -> ((s, dir) => knn(s, dir, cosine_similarity_hof)),

    // e2: same query through the fused native expression — same oracle,
    // faster inner loop (single pass, no intermediate arrays).
    "e2_knn_expr" -> ((s, dir) => knn(s, dir, cosine_similarity)),

    // e18: RANGE search (FAISS range_search) — every vector within a
    // cosine radius of the query, not a fixed k. The retrieval shape
    // dedup thresholds and near-dup audits want: "give me EVERYTHING at
    // least this similar", where k-NN would silently truncate a dense
    // neighborhood. One compiled-cosine scan + pushed filter; the sort
    // only orders the (selectivity-bounded) result set, not the corpus.
    // The τ boundary compares round-6 values — the same cross-engine
    // agreement contract e1's kth-place boundary already relies on. At
    // scale this composes with the IVF serving layout exactly like e5:
    // probe the query's nprobe nearest lists and range-scan only those
    // partitions (cosine radius → the triangle-inequality probe bound).
    "e18_range_search" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
      e.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          // eval_once (r18, guide §4.4): the τ filter otherwise clones
          // the compiled cosine — in-range rows scored it twice
          graft.functions.eval_once(
            round(cosine_similarity(col("embedding"), col("qe")), 6))
            .as("cos_sim"))
        .where(col("cos_sim") >= RangeTau)
        .orderBy(desc("cos_sim"), col("vec_id"))
    }),

    // e3: per-label centroids (the "coarse quantizer" of an IVF index) —
    // posexplode + groupBy(label, pos): partial aggregation makes this one
    // small shuffle regardless of corpus size. The mean is the kmeans/e10
    // fixed-point form (quantize each value to integer micro-units BEFORE
    // the cross-partition sum, one terminal division): a bare avg(double)
    // depends on partial-aggregation merge order in ulps, and a group mean
    // within half an ulp of a 0.5e-6 rounding boundary could flip the 6th
    // decimal between partitionings or engines.
    "e3_label_centroids" -> ((s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(round(col("v").cast("double") * 1000000, 0).cast("long")).as("s6"),
          count(lit(1)).as("cnt"))
        .select(col("label"), col("pos"),
          round(col("s6").cast("double") /
            (col("cnt") * 1000000L).cast("double"), 6).as("c"))
        .orderBy("label", "pos")),

    // e5: IVF ANN — pretrained k-means coarse quantizer (16 clusters,
    // trained once on the bounded sf0.01 sample — the FAISS train/serve
    // split; IvfIndex.kmeans remains the training API), query probes its
    // 6 nearest clusters, exact cosine re-score inside. On this
    // near-random corpus the true top-20 spread across 7 of 16 clusters
    // (measured), so nprobe=2 recalls 0.75 and 6 recalls 0.85 — clustered
    // real-world embeddings concentrate far more, and nprobe is the
    // documented dial.
    // Assignment is the codegen'd nearest_centroid projection (no shuffle,
    // no row multiplication — see IvfIndex) and runs ONCE at index-build
    // time (servingCopy); the probe query is pruned-scan → score →
    // TakeOrderedAndProject over only the probed partitions — no joins
    // and no training jobs at all. Serving from constants also makes the result
    // a deterministic function of the corpus: the oracle replays the
    // same centroids, so e5 is hash-checked; RecallSpec still gates
    // recall@20.
    // Serving reads the cid-PARTITIONED inverted-list copy
    // (IvfIndex.servingCopy): the probe filter prunes at the directory
    // level, so the scan reads ~nprobe/k of the corpus — PlanSpec pins
    // the PartitionFilters on this exact plan.
    "e5_ivf_knn" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val centroids = IvfIndex.Pretrained
      val q = emb.where(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val probes = IvfIndex.probeCids(centroids, q, nprobe = 6)
      IvfIndex.servingCopy(s, dir)
        .where(col("cid").isin(probes: _*) && col("vec_id") =!= 0)
        .select(col("vec_id"), col("cid"),
          round(cosine_similarity(col("embedding"), typedLit(q.toSeq)), 6).as("cos_sim"))
        .orderBy(desc("cos_sim"), col("vec_id"))
        .limit(20)
    }),

    // e8: scalar-quantization (SQ8) KNN — the fourth classic index
    // family next to Flat (e1/e2), LSH/IVF (e4/e5) and PQ (e6/e7):
    // every dimension linearly quantized to an 8-bit code between the
    // corpus per-dimension min/max, queries scored against the DECODED
    // vectors (asymmetric, like ADC). The scan reads 1/4 the bytes of
    // float32 at a quantization error ≪ PQ's. Dataflow at scale: the
    // stats pass is a posexplode + 64-group aggregation (one tiny
    // shuffle, like e3), the (lo, hi) arrays broadcast to the scan, and
    // quantize+decode+score run per-row inside the scan stage as ONE
    // compiled loop (the fused `sq8_cosine` expression — the earlier
    // `transform(sequence...)` + HOF-cosine formulation evaluated
    // interpreted, forfeiting SQ8's cheap-scan purpose at scale) — one
    // pass, no joins. Everything is a deterministic function of the
    // corpus, so the DuckDB oracle replays it exactly; RecallSpec gates
    // recall@20.
    "e8_sq_knn" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val cons = e.select(posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("pos")
        .agg(min(col("v").cast("double")).as("lo"), max(col("v").cast("double")).as("hi"))
        .agg(
          transform(array_sort(collect_list(struct(col("pos"), col("lo")))),
            x => x.getField("lo")).as("los"),
          transform(array_sort(collect_list(struct(col("pos"), col("hi")))),
            x => x.getField("hi")).as("his"))
      val q = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
      e.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(cons))
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(sq8_cosine(col("embedding"), col("los"), col("his"), col("qe")), 6)
            .as("cos_sim"))
        .orderBy(desc("cos_sim"), col("vec_id"))
        .limit(20)
    }),

    // e6: PQ codes — every vector compressed to SubSpaces one-byte
    // codes (FAISS-style product quantization). Encoding is a pure
    // compiled projection (NearestCentroid per subspace over codebook
    // literals); training reads a bounded driver-side sample. The codes
    // are deterministic, so this is oracle-checked exactly: the DuckDB
    // side replays the assignment from the same codebook constants.
    "e6_pq_codes" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      PqIndex.encode(emb, PqIndex.Pretrained)
        .select(col("vec_id") +:
          (0 until PqIndex.SubSpaces).map(j => col(s"c$j")): _*)
        .orderBy("vec_id")
    }),

    // e7: PQ KNN — ADC (asymmetric distance) shortlist over the codes,
    // exact cosine re-rank of the shortlist. Scoring a candidate costs
    // SubSpaces lookup-table reads instead of a 64-dim float loop; the
    // plan is projection → TakeOrderedAndProject (shortlist) → projection
    // → TakeOrderedAndProject (re-rank). Approximate vs e1 but
    // deterministic from the codebook constants ⇒ hash-checked via
    // adcKnnSql; RecallSpec gates recall@20. Shortlist size is the
    // recall dial.
    "e7_pq_knn" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      PqIndex.encode(emb.where(col("vec_id") =!= 0), PqIndex.Pretrained)
        .withColumn("adc", PqIndex.adcDistance(PqIndex.Pretrained, q))
        .orderBy(col("adc"), col("vec_id")).limit(200)
        .select(col("vec_id"),
          round(cosine_similarity(col("embedding"), typedLit(q.toSeq)), 6).as("cos_sim"))
        .orderBy(desc("cos_sim"), col("vec_id"))
        .limit(20)
    }),

    // e4: multi-table LSH approximate KNN — candidates share a bucket
    // with the query in ANY of the 16 tables; exact cosine re-score on
    // the candidate set. Approximate vs e1's exact answer, but
    // DETERMINISTIC by seeded hyperplanes — so the oracle replays the
    // bucketing from the same constants and e4 is hash-checked;
    // RecallSpec separately gates recall@20 against e1.
    //
    // Score FIRST, dedup the narrow (vec_id, cos_sim) projection after —
    // never dedup rows still carrying the two 64-float embeddings: the
    // dedup is this plan's only exchange, and scoring first shrinks it
    // from ~520 bytes/candidate to 16 (the d6 lesson,
    // DedupPack d6 notes — recomputing a dot product per duplicate
    // candidate is far cheaper than shuffling wide rows). cos_sim is a
    // pure function of vec_id given the fixed query, so deduping after
    // scoring picks identical values. PlanSpec pins the no-wide-exchange
    // shape.
    "e4_knn_lsh" -> ((s, dir) => {
      val sig = lshBuckets(s, Tables(s, dir, "embeddings"))
      val q = sig.where(col("vec_id") === 0)
        .select(col("table").as("qtable"), col("bucket").as("qbucket"),
          col("embedding").as("qe"))
      sig.where(col("vec_id") =!= 0)
        .join(broadcast(q),
          col("table") === col("qtable") && col("bucket") === col("qbucket"))
        .select(col("vec_id"),
          round(cosine_similarity(col("embedding"), col("qe")), 6).as("cos_sim"))
        .dropDuplicates("vec_id")
        .orderBy(desc("cos_sim"), col("vec_id"))
        .limit(20)
    }),

    // e9: BATCH KNN serving — top-K for a whole query SET in one corpus
    // pass. e1/e2 answer one query per scan; the serving shape broadcasts
    // all Q queries, scores each corpus row against all of them in place,
    // and bounds every query's candidates with the TopKAggregator heap:
    // map-side partial aggregation reduces each partition to ≤K rows per
    // query BEFORE the shuffle, so shuffle volume is K·Q, independent of
    // corpus size (a row_number window would shuffle+sort all Q·corpus
    // scored rows). Scores are fixed to integer micro-units (round(c·1e6))
    // at the scoring boundary: the heap orders by a long, and both
    // engines agree on the ordering and the emitted value exactly.
    "e9_knn_batch" -> ((s, dir) => {
      import s.implicits._
      implicit val seqEnc: org.apache.spark.sql.Encoder[Seq[KnnScore]] =
        org.apache.spark.sql.Encoders.kryo[Seq[KnnScore]]
      val emb = Tables(s, dir, "embeddings")
      val qs = emb.where(col("vec_id") < BatchQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      val topk = new graft.functions.TopKAggregator[KnnScore](
        BatchK, _.cos6, _.vec_id)
      emb.where(col("vec_id") >= BatchQueries)
        .crossJoin(broadcast(qs))
        .select(col("q_id"), col("vec_id"),
          round(cosine_similarity(col("embedding"), col("qe")) * 1e6, 0)
            .cast("long").as("cos6"))
        .as[KnnScore]
        .groupByKey(_.q_id)
        .agg(topk.toColumn.name("top"))
        .flatMap { case (_, rows) =>
          rows.zipWithIndex.map { case (r, i) => (r.q_id, r.vec_id, r.cos6, i + 1) } }
        .toDF("q_id", "vec_id", "cos6", "rn")
        .select(col("q_id"), col("vec_id"),
          (col("cos6").cast("double") / 1000000.0).as("cos_sim"), col("rn"))
        .orderBy("q_id", "rn")
    }),

    // e10: in-engine k-means TRAINING — the missing half of the
    // train-once/serve-many story e5/e6/e7 tell from pretrained
    // constants: two full Lloyd iterations (k=4, init = first k raw
    // vectors) run as DataFrame jobs, then the final cluster assignment
    // is the deliverable (an IVF index build). Cross-engine determinism
    // by construction, not by luck: centroid means are EXACT — each
    // component quantizes to round(v·1e6) and the cluster mean is one
    // double division of the exact integer sum (g1's fixed-point trick
    // for iterative numerics: float-sum accumulation order, the reason
    // a raw k-means can't be hash-checked, never exists). Only the
    // argmin compares doubles, on round(·, 6) distances with ties to
    // the lowest cid (array_position first-min ≡ ORDER BY d, cid) —
    // the e3/e8 rounding precedent confined to the final compare
    // instead of compounding through three rounds of state. Scale:
    // each iteration is one corpus pass (a per-row projection against
    // k×dim driver-resident constants — the blessed IvfIndex residency)
    // plus a ≤ k×dim-row partial-agg shuffle; at 100 TB you train on a
    // bounded sample exactly like the committed Pretrained artifacts —
    // this query proves the trainer itself is in-engine, deterministic,
    // and oracle-checkable.
    "e10_kmeans_train" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val init: Seq[Seq[Double]] = emb.where(col("vec_id") < KmeansK)
        .orderBy("vec_id")
        .select(col("embedding").cast("array<double>").as("c"))
        .collect().toSeq.map(_.getSeq[Double](0).toSeq)
      def update(cents: Seq[Seq[Double]]): Seq[Seq[Double]] = {
        val rows = kmeansAssign(emb, cents)
          .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy("cid", "pos")
          .agg(sum(round(col("v").cast("double") * 1000000, 0).cast("long")).as("sq"),
            count(lit(1)).as("cnt"))
          .select(col("cid"), col("pos"),
            (col("sq").cast("double") / (col("cnt") * 1000000L).cast("double")).as("c"))
          .collect()
        // an empty cluster would keep its previous centroid on the Spark
        // side but has no row in the oracle's GROUP BY — fail loudly
        // rather than hash-diverge (k=4 over this corpus never empties)
        require(rows.map(_.getInt(0)).distinct.length == cents.length,
          s"e10: empty cluster among ${cents.length}")
        val next = Array.fill(cents.length)(new Array[Double](Dim))
        rows.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
        next.map(_.toSeq).toSeq
      }
      val trained = update(update(init))
      kmeansAssign(emb, trained)
        .select(col("vec_id"), col("cid"), col("dist"))
        .orderBy("vec_id")
    }),

    // e12: ANN index-quality evaluation — recall@K of the IVF probe path
    // against the exact brute-force truth, the metric every real ANN
    // deployment tracks before trusting an index (FAISS's own benchmark
    // protocol). nprobe=2 (vs e5's serving 6) so the measured recall is
    // non-trivial on this near-random corpus and the number actually
    // exercises the metric. Shape: probes are a BOUNDED eval sample
    // (RecallProbes×Dim floats pulled to the driver — e5's blessed
    // bounded-pull contract), both rankings use e9's TopKAggregator
    // (map-side K-bounded partials — shuffle volume K·probes, never
    // corpus-sized; a window over the ×probes-multiplied corpus would
    // sort it in full), and the recall join touches ≤ K·probes rows. At
    // 100 TB the truth side is deliberately one exact corpus pass per
    // eval — that is what "measuring recall" means; you bound it by
    // bounding the probe sample, which is the knob this operator
    // exposes. Determinism: integer micro-unit cosines (e9's fixed
    // point), ties to lowest vec_id, first-min centroid assignment —
    // the oracle replays all three exactly.
    "e12_ann_recall" -> ((s, dir) => {
      import s.implicits._
      implicit val seqEnc: org.apache.spark.sql.Encoder[Seq[KnnScore]] =
        org.apache.spark.sql.Encoders.kryo[Seq[KnnScore]]
      val emb = Tables(s, dir, "embeddings")
      val centroids = IvfIndex.Pretrained
      val pvs = emb.where(col("vec_id") < RecallProbes)
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val probes = pvs.toSeq
        .map { case (id, v) =>
          (id, v.toSeq, IvfIndex.probeCids(centroids, v, RecallNprobe)) }
        .toDF("q_id", "qe", "cids")
      val topk = new graft.functions.TopKAggregator[KnnScore](
        RecallK, _.cos6, _.vec_id)
      def topIds(scored: org.apache.spark.sql.Dataset[KnnScore]): DataFrame =
        scored.groupByKey(_.q_id).agg(topk.toColumn.name("top"))
          .map { case (q, rows) => (q, rows.map(_.vec_id)) }
          .toDF("probe_id", "ids")
      val scored = IvfIndex.assign(emb, centroids)
        .where(col("vec_id") >= RecallProbes)
        .crossJoin(broadcast(probes))
        .select(col("q_id"), col("vec_id"), col("cid"), col("cids"),
          round(cosine_similarity(col("embedding"), col("qe")) * 1e6, 0)
            .cast("long").as("cos6"))
      val truth = topIds(scored.select("q_id", "vec_id", "cos6").as[KnnScore])
      val approx = topIds(
        scored.where(array_contains(col("cids"), col("cid")))
          .select("q_id", "vec_id", "cos6").as[KnnScore])
        .withColumnRenamed("ids", "aids")
      // both sides are ≤RecallProbes rows post-aggregation, but the typed
      // agg output carries no stats — hint it or this 8×8 join sorts.
      truth.join(broadcast(approx), Seq("probe_id"), "left")
        .select(col("probe_id"),
          size(array_intersect(col("ids"),
            coalesce(col("aids"), array()))).cast("long").as("hits"))
        .select(col("probe_id"), col("hits"),
          (col("hits").cast("double") / lit(RecallK.toDouble)).as("recall"))
        .orderBy("probe_id")
    }),

    // e13: truncated-dimension two-stage ANN — the Matryoshka (MRL,
    // Kusupati et al.'22) serving pattern: embeddings trained so every
    // prefix is itself a usable embedding let the first pass score only
    // the first MrlPrefixDim dims (¼ of the multiply-adds; with a
    // prefix-dim column layout, ¼ of the bytes), keep a bounded
    // shortlist, and re-rank it with full-dimension cosine. Same
    // shortlist+rerank shape as e7's ADC path — both stages are
    // TakeOrderedAndProject over one scan, no joins, no shuffle. The
    // fixture's dims carry no MRL training, so this measures the
    // MACHINERY (RecallSpec gates what prefix-16 of 64 i.i.d. dims can
    // deliver); on real MRL embeddings the prefix IS the trained
    // summary and recall approaches full-dim. Shortlist ranking
    // quantizes to integer micro-units (e9's fixed point), ties to
    // lowest vec_id — the oracle replays both stages exactly.
    "e13_mrl_knn" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      emb.where(col("vec_id") =!= 0)
        .select(col("vec_id"), col("embedding"),
          round(cosine_similarity(
            slice(col("embedding"), 1, MrlPrefixDim),
            typedLit(q.take(MrlPrefixDim).toSeq)) * 1e6, 0)
            .cast("long").as("pre6"))
        .orderBy(desc("pre6"), col("vec_id")).limit(MrlShortlist)
        .select(col("vec_id"),
          round(cosine_similarity(col("embedding"), typedLit(q.toSeq)), 6)
            .as("cos_sim"))
        .orderBy(desc("cos_sim"), col("vec_id"))
        .limit(20)
    }),

    // e14: TWO-LEVEL coarse quantization ANN (FAISS IMI / IVF-tree
    // shape) — the assignment-cost fix SCALING.md §5 names for flat IVF
    // past ~32 k centroids: cluster the centroid table itself into
    // Ivf2Groups groups (driver-side k-means over k×dim floats — config
    // data, never corpus data), assign a vector by nearest GROUP then
    // nearest member centroid within it: (g + k/g)·dim work per row
    // instead of k·dim, compiled via the same NearestCentroid kernel
    // (one when-chain, no shuffle, no row multiplication). The query
    // probes the Ivf2ProbeGroups nearest groups, then the Ivf2ProbeCids
    // nearest member centroids inside them, exact cosine re-score within
    // — the same scan → project → filter → TakeOrderedAndProject single
    // pass as e5. Approximation tier: a vector whose nearest centroid
    // lies outside its nearest group mis-assigns (the IMI trade);
    // RecallSpec gates recall@20 against exact truth alongside e5/e13.
    // Deterministic end-to-end (lowest-index argmin at both levels,
    // members ascending so ties compose to lowest global cid), so the
    // oracle replays assignment AND probe selection exactly.
    "e14_ivf2_knn" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val cents = IvfIndex.Pretrained
      val (gc, members) = ivf2
      val q = emb.where(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val gids = IvfIndex.probeCids(gc, q, Ivf2ProbeGroups)
      val probes = gids.flatMap(g => members(g))
        .map(c => (IvfIndex.sqDistLocal(cents(c), q), c))
        .sorted.take(Ivf2ProbeCids).map(_._2)
      emb.withColumn("cid",
          IvfIndex.assignTwoLevelCol(col("embedding"), cents, gc, members))
        .where(col("cid").isin(probes: _*) && col("vec_id") =!= 0)
        .select(col("vec_id"), col("cid"),
          round(cosine_similarity(col("embedding"), typedLit(q.toSeq)), 6)
            .as("cos_sim"))
        .orderBy(desc("cos_sim"), col("vec_id"))
        .limit(20)
    }),

    // e11: HYBRID retrieval — reciprocal rank fusion (RRF, Cormack et
    // al.'09: score = Σ 1/(C + rank_i), C = 60) of a DENSE ranking
    // (brute cosine vs the vec-0 query embedding, e1's one-pass shape)
    // and a SPARSE ranking (BM25 summed over the same mid-df query
    // terms t14 selects). This is the retrieval shape every RAG /
    // training-data search stack runs: two independent rankers, each
    // scale-safe on its own (dense = one bandwidth-bound corpus pass +
    // TakeOrderedAndProject; sparse = t14's broadcast-qterms plan), fused
    // on their bounded top-K lists — the fusion join touches ≤ 2·K rows
    // no matter the corpus size, so the whole operator's cost is the two
    // rankers, never the fusion. Determinism: per-term BM25 scores and
    // cosines quantize to integer micro-units BEFORE any cross-term sum
    // (float addition is order-sensitive; integer addition is not — the
    // e9/e10 fixed-point trick), ranks are integer row_numbers on
    // (score6 desc, doc_id), and the final RRF doubles are one fixed
    // expression of those integer ranks — bit-identical cross-engine.
    // The rank windows run AFTER a TakeOrderedAndProject limit, so each
    // covers exactly HybridK rows (bounded, like t14's qterm frame).
    "e11_hybrid_rrf" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
      val denseW = Window.orderBy(col("cos6").desc, col("doc_id"))
      val dense = e.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id").as("doc_id"),
          round(cosine_similarity(col("embedding"), col("qe")) * 1e6, 0)
            .cast("long").as("cos6"))
        .orderBy(col("cos6").desc, col("doc_id")).limit(HybridK)
        .withColumn("r_dense", row_number().over(denseW))
        .select("doc_id", "r_dense")
      // sparse side: t14's BM25 factors via the SHARED builder
      // (TextPack.bm25Factors — one definition of the weighting and the
      // query-term selection), micro-unit-quantized, integer-summed over
      // the ~5 query terms
      val sparseW = Window.orderBy(col("bm6").desc, col("doc_id"))
      val sparse = TextPack.bm25Factors(Tables(s, dir, "documents"))
        .withColumn("score6", round(col("idf") * col("tfn") * 1e6, 0).cast("long"))
        .where(col("doc_id") =!= 0)
        .groupBy("doc_id").agg(sum(col("score6")).as("bm6"))
        .orderBy(col("bm6").desc, col("doc_id")).limit(HybridK)
        .withColumn("r_sparse", row_number().over(sparseW))
        .select("doc_id", "r_sparse")
      dense.join(sparse, Seq("doc_id"), "full_outer")
        .withColumn("rrf_score",
          coalesce(lit(1.0) / (lit(RrfC) + col("r_dense")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfC) + col("r_sparse")), lit(0.0)))
        .select(col("doc_id"), col("r_dense"), col("r_sparse"), col("rrf_score"))
        .orderBy(col("rrf_score").desc, col("doc_id")).limit(HybridOut)
    }),

    // e15: METADATA-FILTERED vector search — top-K under a structured
    // predicate (here label % 3 = 1), the capability every production
    // vector store ships next to plain KNN (FAISS IDSelector, the
    // filtered-search mode of Milvus/Qdrant/Vespa). The engine gets it
    // by COMPOSITION, which is the point of building ANN inside a
    // relational optimizer rather than beside one: the predicate is a
    // plain Catalyst filter, so Spark pushes it into the parquet scan
    // (PlanSpec pins PushedFilters) and the exact cosine pass runs only
    // over survivors — pre-filtering, the strategy that stays correct at
    // ANY selectivity (post-filtering an ANN shortlist under-fills K
    // when the predicate is selective). One corpus pass, broadcast query
    // vector, TakeOrderedAndProject: e1's scale shape with the scan
    // narrowed by the filter. For low-selectivity predicates over an IVF
    // corpus the same .where composes after e5's assign — the filter
    // rides the same scan either way.
    "e15_filtered_knn" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
      e.where(col("vec_id") =!= 0 && col("label") % 3 === 1)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          round(cosine_similarity(col("embedding"), col("qe")), 6).as("cos_sim"))
        .orderBy(desc("cos_sim"), col("vec_id"))
        .limit(20)
    }),

    // e17: IVF-PQ (FAISS "IVFADC", Jégou et al.'11) — the production-
    // default billion-vector index, composed from the engine's existing
    // parts: the pretrained coarse quantizer routes the query to nprobe
    // clusters (e5), and within them candidates are scored by PQ codes
    // of their RESIDUAL v − centroid (e7's ADC) — residuals are zero-
    // centered and far tighter than the raw corpus, so 8 bytes/vector
    // buys more precision than raw-vector PQ. The residual never
    // materializes: encoding residual v − c against codebook entry b
    // equals encoding v against the SHIFTED entry c + b (argmin is
    // translation-invariant), and the ADC table ‖(q−c) − b‖² =
    // ‖q − (c+b)‖² — so the whole operator is the compiled
    // NearestCentroid / adcDistance kernels over per-cluster shifted
    // codebook literals (a when-chain on the assigned cid). Plan: one
    // scan → compiled assignment → probe filter → compiled codes + ADC
    // → TakeOrderedAndProject shortlist → exact re-rank. No joins, no
    // shuffle, no training jobs at serve time; the table IS clustered by
    // cid (IvfIndex.servingCopy — the FAISS inverted-list layout), so
    // the scan reads only probed partitions. The oracle
    // replays the float shifted-codebook arithmetic via REAL + REAL
    // (verified bit-identical to Float addition), assignment and codes
    // from the same constants; RecallSpec gates recall@20.
    "e17_ivfpq_knn" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val cents = IvfIndex.Pretrained
      val rbooks = PqIndex.PretrainedResidual
      val q = emb.where(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val probes = IvfIndex.probeCids(cents, q, nprobe = 6)
      val shifted = probes.map(c => c -> PqIndex.shiftedBooks(cents, rbooks, c)).toMap
      // serve from the cid-partitioned inverted-list copy: the probe
      // filter prunes at the directory level (see e5 / IvfIndex.servingCopy)
      val base = IvfIndex.servingCopy(s, dir)
        .where(col("cid").isin(probes: _*) && col("vec_id") =!= 0)
      val coded = (0 until PqIndex.SubSpaces).foldLeft(base) { (df, j) =>
        val sub = slice(col("embedding"), j * PqIndex.SubDim + 1, PqIndex.SubDim)
        df.withColumn(s"c$j", probes.tail.foldLeft(
          when(col("cid") === probes.head, graft.functions.nearest_centroid(
            sub, typedLit(shifted(probes.head)(j).map(_.toSeq).toSeq)))) { (w, c) =>
          w.when(col("cid") === c, graft.functions.nearest_centroid(
            sub, typedLit(shifted(c)(j).map(_.toSeq).toSeq)))
        })
      }
      val adc = probes.tail.foldLeft(
        when(col("cid") === probes.head,
          PqIndex.adcDistance(shifted(probes.head), q))) { (w, c) =>
        w.when(col("cid") === c, PqIndex.adcDistance(shifted(c), q))
      }
      coded.withColumn("adc", adc)
        .orderBy(col("adc"), col("vec_id")).limit(200)
        .select(col("vec_id"),
          round(cosine_similarity(col("embedding"), typedLit(q.toSeq)), 6).as("cos_sim"))
        .orderBy(desc("cos_sim"), col("vec_id"))
        .limit(20)
    }),

    // e16: MMR-diversified retrieval (Carbonell & Goldstein '98, the
    // result-diversification step RAG and search stacks run after ANN):
    // greedily re-rank a top-N shortlist so each pick balances query
    // relevance against redundancy with what is already picked —
    // argmax_c [λ·rel(c) − (1−λ)·max_{s∈picked} sim(c,s)]. The split of
    // work is the entire scale story: the CORPUS-sized stage is e1's
    // one-pass TakeOrderedAndProject shortlist (bandwidth-bound, no
    // shuffle), and the greedy loop — inherently sequential, O(K·N)
    // — runs on the driver over the BOUNDED N=20 shortlist and its
    // N·(N−1) pairwise sims, both computed by the same compiled cosine
    // kernel the e-family already proves ulp-equal to the oracle's
    // (t17's blessed bounded-collect residency: the collect is
    // shortlist-sized at any corpus size). λ = ½ states the margin in
    // pure integers — 2·MMR = rel6 − maxsim6, micro-unit longs — with
    // (margin DESC, vec_id) ties, so all ten picks replay bit-exactly
    // in the oracle's unrolled step CTEs (t17's unrolled-iteration
    // discipline).
    "e16_mmr_diversify" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
      val cand = e.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("embedding"),
          round(cosine_similarity(col("embedding"), col("qe")) * 1e6, 0)
            .cast("long").as("rel6"))
        .orderBy(col("rel6").desc, col("vec_id")).limit(MmrShortlist)
        .localCheckpoint()
      val rel = cand.select(col("vec_id"), col("rel6"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sims = cand.alias("a")
        .join(cand.alias("b"), col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("a"), col("b.vec_id").as("b"),
          round(cosine_similarity(col("a.embedding"), col("b.embedding")) * 1e6, 0)
            .cast("long").as("sim6"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (picked.size < MmrK) {
        val next = rel.keysIterator.filterNot(picked.contains).map { c =>
          val margin =
            if (picked.isEmpty) rel(c)
            else rel(c) - picked.iterator.map(s => sims((c, s))).max
          (margin, c)
        }.minBy { case (m, c) => (-m, c) }._2
        picked += next
      }
      import s.implicits._
      picked.zipWithIndex
        .map { case (v, i) => (i + 1, v, rel(v)) }.toSeq
        .toDF("rank", "vec_id", "rel6")
        .orderBy("rank")
    }),

    // e19: IVF index MAINTENANCE — the append/rebalance audit an ingest
    // pipeline runs when a new vector batch lands on a served index
    // (vec_id % 10 = 0 plays the batch; the rest is the standing index).
    // Assignment of the new batch to the FROZEN coarse quantizer is e5's
    // pure map-side projection; the question the operator answers is the
    // maintenance decision FAISS calls list splitting: which posting
    // lists exceed 2× the mean occupancy (n_total·k > 2·N,
    // cross-multiplied exact integers — no float mean) after the append
    // and must be split/re-trained before probe latency degrades. The
    // whole result is k rows; the only shuffle is the k-bounded count
    // agg. The standing census comes from the cid-partitioned serving
    // layout's OWN partition statistics ([[IvfIndex.servingCopy]]): cid
    // is a partition column there, so the per-list count reads ZERO data
    // columns — directory listing + parquet footer row counts
    // (PlanSpec pins ReadSchema struct<> on the census scan). The only
    // data-column work is assigning the NEW batch to the frozen
    // quantizer — at 100 TB the audit's cost is the batch, not the
    // corpus.
    "e19_ivf_append" -> ((s, dir) => {
      val k = IvfIndex.Pretrained.length
      // the new batch: the only scan that touches embedding bytes
      val newBatch = IvfIndex.assign(
          Tables(s, dir, "embeddings").where(col("vec_id") % 10 === 0),
          IvfIndex.Pretrained)
        .groupBy("cid").agg(count(lit(1)).as("n_new_raw"))
      // standing census from partition statistics: zero data columns
      val census = ivfListCensus(s, dir)
      // materialize the k-row list census ONCE (e16's bounded-collect
      // residency): it feeds both the corpus total and the output, and
      // without the checkpoint each branch would re-run the census +
      // batch assignment (the t19 lesson: totals ride the bounded
      // frame, and the bounded frame computes once)
      val byList = census
        .join(newBatch, Seq("cid"), "left")
        .withColumn("n_new", coalesce(col("n_new_raw"), lit(0L)))
        .select(col("cid"), (col("n_total") - col("n_new")).as("n_existing"),
          col("n_new"), col("n_total"))
        .localCheckpoint()
      val total = byList.agg(sum(col("n_total")).as("n"))
      byList
        .crossJoin(broadcast(total))
        .withColumn("needs_split",
          (col("n_total") * k > col("n") * 2).cast("int"))
        .select(col("cid"), col("n_existing"), col("n_new"),
          col("n_total"), col("needs_split"))
        .orderBy("cid")
    }),

    // e20: BINARY (sign) quantization ANN — the 1-bit-per-dimension tier
    // modern vector stores put UNDER scalar/product quantization: codes
    // are 32× narrower than float32 (64 dims → two packed words), the
    // shortlist scan is xor+popcount over those words (built-in
    // codegen'd bit_count — the cheapest possible distance kernel), and
    // a bounded exact-cosine re-rank recovers the final order. Packing
    // is the compiled [[graft.functions.SignBits]] projection, WRITTEN
    // AT INGEST into the [[IvfIndex.signCodeCopy]] serving copy (the e5
    // pattern): the shortlist pass scans that copy and so reads 1/32nd
    // of the embedding bytes from disk — an I/O tier, not just a
    // compute trick (PlanSpec pins the shortlist scan's ReadSchema to
    // the packed code column). The re-rank then point-fetches ONLY the
    // shortlisted rows from the float corpus via a pushed In(vec_id)
    // filter — ≤ BqShortlist rows of wide data move, ever. Both
    // boundaries are deterministic: Hamming is an exact integer
    // (vec_id ties), the re-rank compares round-6 micro-units (e1's
    // boundary contract). The oracle replays the sign rule per
    // DIMENSION — popcount(xor(pack(a), pack(q))) ≡ |{i : sign(a_i) ≠
    // sign(q_i)}| by construction, so the word layout never leaks into
    // values.
    "e20_bq_knn" -> ((s, dir) => {
      // shortlist: narrow-column scan, bounded top-BqShortlist collect
      // (e16's bounded-collect precedent — 100 (vec_id, hamming) pairs)
      val shortlist = bqShortlist(s, dir).collect()
      import s.implicits._
      val shortDf = shortlist.map(r => (r.getLong(0), r.getInt(1))).toSeq
        .toDF("vec_id", "hamming")
      val e = Tables(s, dir, "embeddings")
      val qe = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
      // re-rank: pushed In-filter point fetch of the shortlisted rows
      e.where(col("vec_id").isin(shortlist.map(_.getLong(0)): _*))
        .join(broadcast(shortDf), "vec_id")
        .crossJoin(broadcast(qe))
        .select(col("vec_id"), col("hamming"),
          round(cosine_similarity(col("embedding"), col("qe")), 6).as("cos_sim"))
        .orderBy(desc("cos_sim"), col("vec_id")).limit(20)
    }),

    // e21: IVF index DELETE maintenance — e19's counterpart for the other
    // mutation an ingest pipeline applies to a served index (FAISS
    // remove_ids / a vector store's vacuum decision). A delete ledger
    // (vec_id % 13 = 5 plays the batch) tombstones rows in place; dead
    // rows still burn probe bandwidth inside their posting list until the
    // list is compacted, so the operator answers each list's dead count
    // and which lists must compact now — needs_compact when tombstones
    // exceed 20 % of the list (n_deleted·5 > n_total, cross-multiplied
    // exact integers like e19's split rule). I/O shape at 100 TB: the
    // id→list lookup reads exactly ONE narrow i64 column — cid is a
    // PARTITION column of [[IvfIndex.servingCopy]] and vec_id the only
    // data column touched (PlanSpec pins the scan's ReadSchema to
    // struct<vec_id:bigint>); the census side reads ZERO data columns
    // (e19's partition-statistics path). Both sides shuffle k-bounded
    // aggregates only — the audit never reads an embedding byte.
    "e21_ivf_delete" -> ((s, dir) => {
      val tomb = ivfTombstoneCensus(s, dir)
      ivfListCensus(s, dir)
        .join(tomb, Seq("cid"), "left")
        .withColumn("n_deleted", coalesce(col("n_del_raw"), lit(0L)))
        .select(col("cid"), col("n_total"), col("n_deleted"),
          (col("n_total") - col("n_deleted")).as("n_live"),
          (col("n_deleted") * 5 > col("n_total")).cast("int").as("needs_compact"))
        .orderBy("cid")
    }),

    // e22: IVF index DRIFT audit — the third index mutation signal after
    // append (e19) and delete (e21): as the corpus distribution moves
    // away from the frozen quantizer's training distribution, vectors
    // land ever further from their assigned centroid, recall decays with
    // no error anywhere, and the operational fix is retraining — IF
    // someone measures the drift. Per posting list: member count, the
    // exact sum of cosine distortions to the list's own centroid
    // (1e6 − cos6 per row, quantized to micro-units BEFORE the sum —
    // t19's fixed-point discipline, so the corpus sum is partial-agg-
    // order-free and hash-checked), and the retrain flag when the list's
    // MEAN distortion exceeds 1.5× the global mean — cross-multiplied in
    // DECIMAL(38,0) (2·sum_l·n_global > 3·sum_global·n_l; a38's
    // HUGEINT-replayed guard against both float means and long overflow
    // at 10¹²-row lists). Dataflow: one scan of the cid-partitioned
    // serving copy (the embedding bytes ARE the audit's input), the
    // per-row distortion a compiled cosine against
    // element_at(centroid-literal, cid) — no join, no row fan-out — and
    // the only shuffle the k-bounded partial+final agg; the global mean
    // is a 2-number broadcast off the k-row frame. At 100 TB the same
    // audit runs on a per-list hash sample (a43's bounded sampler) —
    // the mean estimate is all the decision needs; the fixture runs it
    // exhaustively so the oracle can be exact.
    "e22_ivf_drift" -> ((s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      // k rows; feeds both the totals and the output (e19's bounded-
      // frame-computes-once discipline)
      val byList = e22PerRow(s, dir).groupBy("cid")
        .agg(count(lit(1)).as("n_vecs"), sum(col("d6")).as("sum_d6"))
        .localCheckpoint()
      val tot = byList.agg(sum(col("n_vecs")).as("ng"), sum(col("sum_d6")).as("sg"))
      byList.crossJoin(broadcast(tot))
        .select(col("cid"), col("n_vecs"), col("sum_d6"),
          (col("sum_d6").cast("double") / col("n_vecs").cast("double")).as("mean_d6"),
          (col("sum_d6").cast(dec) * col("ng").cast(dec) * 2 >
            col("sg").cast(dec) * col("n_vecs").cast(dec) * 3)
            .cast("int").as("needs_retrain"))
        .orderBy("cid")
    }),

    // e23: margin-based BITEXT MINING (Artetxe & Schwenk '19, the
    // LASER/CCMatrix recipe behind every mined parallel corpus): find
    // translation pairs across two sides of an embedding space by
    // MUTUAL k-NN with margin scoring — raw cosine over-selects hubs
    // (vectors near everything), so each pair's score is normalized by
    // the two endpoints' own neighborhood similarity: margin(x, y) =
    // cos(x, y) / ((avgTopK(x) + avgTopK(y)) / 2). Labels 0/1 play the
    // two languages. Dataflow is e9's batch-KNN shape run BOTH
    // directions: the one corpus-sized stage is the compiled-cosine
    // score pass; each side's top-k then folds through the K-bounded
    // [[graft.functions.TopKAggregator]] heap (map-side partial
    // aggregation — shuffle volume k·|side|, never |A|·|B|), the
    // mutual-pair join and margin arithmetic run on those K-bounded
    // frames. The margin is stated in exact integers — num =
    // 2·cos6·nx·ny, den = sx·ny + sy·nx over the ACTUAL per-side
    // neighbor counts (see [[marginMine]]; nothing divides before the
    // one terminal IEEE division) — and membership/ranks are
    // (cos6 DESC, id) deterministic, so every mined pair
    // hash-checks. Emitting ALL mutual pairs (id-ordered) rather than a
    // margin-sorted top-N keeps the float ratio out of row selection —
    // thresholding by margin is the consumer's one comparison. The
    // exhaustive A×B score pass is the EXACT tier; the blocked/sharded
    // form production mining actually runs at scale is e24 below — same
    // margin machinery (shared marginMine), candidates restricted to
    // co-assigned IVF lists.
    "e23_bitext_mine" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val a = emb.where(col("label") === 0)
        .select(col("vec_id").as("x_id"), col("embedding").as("xe"))
      val b = emb.where(col("label") === 1)
        .select(col("vec_id").as("y_id"), col("embedding").as("ye"))
      marginMine(s, a.crossJoin(broadcast(b))
        .select(col("x_id"), col("y_id"),
          round(cosine_similarity(col("xe"), col("ye")) * 1e6, 0)
            .cast("long").as("cos6")))
    }),

    // e24: BLOCKED bitext mining — e23's margin machinery with the
    // candidate set production mining actually scores at scale
    // (CCMatrix/CCAligned shard the space and mine within shards): both
    // sides assign to the frozen coarse quantizer (e5's compiled
    // map-side projection — no training at mine time), and candidate
    // pairs are generated ONLY within co-assigned posting lists, so the
    // pair stage is one cid equi-join — shuffle-partitioned by cid, each
    // task scoring one list's local cross — instead of e23's |A|×|B|
    // cross. On the cid-partitioned serving layout (e5) the join is
    // I/O-local per list. Everything after the candidate set is
    // byte-identical to e23 (shared [[marginMine]]): K-bounded heap
    // folds both directions, integer margins, mutual pairs id-ordered.
    // The blocking is the recall trade, stated honestly: a pair whose
    // endpoints land in different lists is invisible (Round12OpsSpec
    // measures the overlap vs exact e23 and pins blocked ⊆ plausible
    // mutual structure); production tunes list count / multi-probe for
    // that recall, the margin math never changes.
    "e24_bitext_blocked" -> ((s, dir) => {
      val asg = IvfIndex.assign(Tables(s, dir, "embeddings"), IvfIndex.Pretrained)
      val a = asg.where(col("label") === 0)
        .select(col("cid"), col("vec_id").as("x_id"), col("embedding").as("xe"))
      val b = asg.where(col("label") === 1)
        .select(col("cid"), col("vec_id").as("y_id"), col("embedding").as("ye"))
      marginMine(s, a.join(b, "cid")
        .select(col("x_id"), col("y_id"),
          round(cosine_similarity(col("xe"), col("ye")) * 1e6, 0)
            .cast("long").as("cos6")))
    }),

    // e25: MULTI-PROBE blocked bitext mining — e24's recall lever,
    // shipped instead of footnoted: each vector contributes its
    // [[BitextProbes]] nearest lists (the compiled
    // [[graft.functions.NearestCentroids]] top-p projection — no ×k
    // explode, no window, assignment stays a map pass fused into the
    // scan), candidates are pairs sharing ANY probed list, deduped
    // BEFORE scoring (a pair sharing both probes must enter the top-k
    // heaps once, not twice), then the identical shared marginMine
    // tail. RecallSpec measures exactly this trade on the fixture:
    // pair recall vs exact e23 goes 0.200 (1-probe, e24) → 0.433
    // (2-probe) for ~2× the candidate work — the dial production
    // mining turns (CCMatrix tunes probes/nlist until the margin-pair
    // yield stops moving, the margin math never changes). Scale shape:
    // probe fan-out is ×p on the narrow (cid, id) stream only, the
    // pair stage stays one cid equi-join, and the dedup shuffle is
    // candidate-bounded.
    "e25_bitext_probe2" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .withColumn("pcid", explode(nearest_centroids(col("embedding"),
          IvfIndex.centroidsLit(IvfIndex.Pretrained), BitextProbes)))
      val a = emb.where(col("label") === 0)
        .select(col("pcid"), col("vec_id").as("x_id"), col("embedding").as("xe"))
      val b = emb.where(col("label") === 1)
        .select(col("pcid"), col("vec_id").as("y_id"), col("embedding").as("ye"))
      marginMine(s, a.join(b, "pcid")
        .dropDuplicates(Seq("x_id", "y_id"))
        .select(col("x_id"), col("y_id"),
          round(cosine_similarity(col("xe"), col("ye")) * 1e6, 0)
            .cast("long").as("cos6")))
    })
  )

  /** e25's probe budget (2 = the standard first multi-probe step). */
  private[operators] val BitextProbes = 2

  /** e23/e24's shared mining tail: fold a (x_id, y_id, cos6) candidate
    * frame through the K-bounded top-k heap in BOTH directions, keep
    * mutual pairs, and score the Artetxe-Schwenk margin in exact
    * integers with one terminal IEEE division.
    *
    * The margin is the RATIO form, cos(x,y) over the MEAN of the two
    * neighborhood averages — margin = cos6 / ((sx/nx + sy/ny) / 2) —
    * carried as exact integers: num = 2·cos6·nx·ny, den = sx·ny+sy·nx,
    * where nx/ny are the ACTUAL neighbor counts each side's heap held
    * (≤ [[BitextK]]). Round 12 hardcoded the numerator to 2k·cos6,
    * which silently inflates the margin by k/n whenever a side has
    * fewer than k candidates — routine in e24, where a small co-
    * assigned posting list can hold under k cross-side vectors — so
    * margins were not comparable across lists and a downstream
    * threshold would over-select pairs from sparse lists (r12 ADVICE).
    * With nx = ny = k the two forms coincide: 2k²·cos6 / k·(sx+sy) =
    * 2k·cos6 / (sx+sy), so dense-corpus results are unchanged;
    * Round13OpsSpec pins a sparse-list fixture where they differ.
    *
    * The candidate frame is the only stage the exact and blocked tiers
    * differ on, and it is deliberately NOT materialized: each direction
    * fold recomputes the score pass (two corpus passes), because
    * checkpointing it would store the FULL candidate cross — |A|×|B|
    * for e23, the sum of per-list crosses for e24 — on executor
    * storage, turning a shuffle-bounded operator (k·|side| after the
    * heaps) into a corpus-product-sized storage footprint (r12 ADVICE).
    * Two compiled-cosine passes are the at-scale trade: CPU is linear
    * and redoable, corpus-product storage is not.
    */
  private[operators] def marginMine(s: SparkSession, cand: DataFrame): DataFrame = {
    import s.implicits._
    implicit val seqEnc: org.apache.spark.sql.Encoder[Seq[KnnScore]] =
      org.apache.spark.sql.Encoders.kryo[Seq[KnnScore]]
    val k = BitextK
    def topSide(qCol: String, cCol: String): DataFrame = {
      val topk = new graft.functions.TopKAggregator[KnnScore](
        k, _.cos6, _.vec_id)
      cand.select(col(qCol).as("q_id"), col(cCol).as("vec_id"), col("cos6"))
        .as[KnnScore]
        .groupByKey(_.q_id)
        .agg(topk.toColumn.name("top"))
        .flatMap { case (_, rows) =>
          val sum6 = rows.map(_.cos6).sum
          val n = rows.size
          rows.zipWithIndex.map { case (r, i) =>
            (r.q_id, r.vec_id, r.cos6, i + 1, sum6, n) } }
        .toDF("q_id", "vec_id", "cos6", "rn", "sum6", "n")
    }
    val ta = topSide("x_id", "y_id")
      .select(col("q_id").as("x_id"), col("vec_id").as("y_id"),
        col("cos6"), col("rn").as("rank_ab"), col("sum6").as("sx"),
        col("n").as("nx"))
    val tb = topSide("y_id", "x_id")
      .select(col("vec_id").as("x_id"), col("q_id").as("y_id"),
        col("rn").as("rank_ba"), col("sum6").as("sy"), col("n").as("ny"))
    ta.join(tb, Seq("x_id", "y_id"))
      .select(col("x_id"), col("y_id"), col("cos6"),
        col("rank_ab"), col("rank_ba"),
        ((col("cos6") * lit(2) * col("nx") * col("ny")).cast("double") /
          (col("sx") * col("ny") + col("sy") * col("nx")).cast("double"))
          .as("margin"))
      .orderBy("x_id", "y_id")
  }

  /** e23's per-side neighborhood size (Artetxe & Schwenk use 4 for the
    * margin denominator).
    */
  private[operators] val BitextK = 4

  /** e23/e24's shared oracle tail appended to a candidate-CTE prefix
    * ending in `sc(x_id, y_id, cos6)` — the SQL twin of [[marginMine]].
    */
  private def bitextMineSql(candCtes: String): String =
    s"""$candCtes,
       |ta AS (
       |  SELECT x_id, y_id, cos6,
       |    CAST(row_number() OVER (PARTITION BY x_id ORDER BY cos6 DESC, y_id) AS INTEGER) AS rank_ab
       |  FROM sc QUALIFY rank_ab <= $BitextK),
       |sa AS (SELECT x_id, CAST(sum(cos6) AS BIGINT) AS sx,
       |              CAST(count(*) AS BIGINT) AS nx FROM ta GROUP BY 1),
       |tb AS (
       |  SELECT x_id, y_id,
       |    CAST(row_number() OVER (PARTITION BY y_id ORDER BY cos6 DESC, x_id) AS INTEGER) AS rank_ba
       |  FROM sc QUALIFY rank_ba <= $BitextK),
       |sb AS (SELECT y_id, CAST(sum(cos6) AS BIGINT) AS sy,
       |              CAST(count(*) AS BIGINT) AS ny
       |       FROM tb JOIN sc USING (x_id, y_id) GROUP BY y_id)
       |SELECT x_id, y_id, cos6, rank_ab, rank_ba,
       |  CAST(2 * cos6 * nx * ny AS DOUBLE) / CAST(sx * ny + sy * nx AS DOUBLE) AS margin
       |FROM ta JOIN tb USING (x_id, y_id) JOIN sa USING (x_id) JOIN sb USING (y_id)
       |ORDER BY x_id, y_id""".stripMargin

  /** e22's per-row distortion frame (pre-aggregation): the compiled
    * cosine against the row's OWN centroid (element_at of the centroid
    * literal by the serving copy's cid partition column) quantized to
    * micro-units — no join, no row fan-out. Shared with PlanSpec so the
    * pin runs on the query's actual frame.
    */
  private[graft] def e22PerRow(s: SparkSession, dir: String): DataFrame = {
    val centLit = IvfIndex.centroidsLit(IvfIndex.Pretrained)
    IvfIndex.servingCopy(s, dir)
      .select(col("cid"),
        (lit(1000000L) -
          round(cosine_similarity(col("embedding"),
            element_at(centLit, col("cid") + 1)) * 1000000, 0).cast("long"))
          .as("d6"))
  }

  /** e20's Hamming shortlist size before the exact re-rank. */
  private[operators] val BqShortlist = 100

  /** e19's standing-list census, taken from the serving layout's own
    * partition statistics: cid is a PARTITION column of
    * [[IvfIndex.servingCopy]], so this per-list count reads ZERO data
    * columns — directory listing + parquet footer row counts (PlanSpec
    * pins ReadSchema struct<> on the scan). Shared with PlanSpec so the
    * pin runs on the query's actual census frame.
    */
  private[graft] def ivfListCensus(s: SparkSession, dir: String): DataFrame =
    IvfIndex.servingCopy(s, dir)
      .groupBy("cid").agg(count(lit(1)).as("n_total"))

  /** e21's per-list tombstone census: the delete ledger's id→list lookup
    * against the serving copy, reading only the narrow vec_id column
    * (cid is the partition column — PlanSpec pins the ReadSchema).
    * Shared with PlanSpec so the pin runs on the query's actual frame.
    */
  private[graft] def ivfTombstoneCensus(s: SparkSession, dir: String): DataFrame =
    IvfIndex.servingCopy(s, dir)
      .select(col("vec_id"), col("cid"))
      .where(col("vec_id") % 13 === 5)
      .groupBy("cid").agg(count(lit(1)).as("n_del_raw"))

  /** e20's Hamming-shortlist frame (pre-collect): xor+popcount over the
    * ingest-written packed sign codes ([[IvfIndex.signCodeCopy]]) — the
    * scan reads only the 1/32-width code column, never the float
    * embeddings (PlanSpec pins the ReadSchema). Shared with PlanSpec.
    */
  private[graft] def bqShortlist(s: SparkSession, dir: String): DataFrame = {
    val codes = IvfIndex.signCodeCopy(s, dir)
    val q = codes.where(col("vec_id") === 0).select(col("code").as("qc"))
    val words = (Dim + 31) / 32
    val ham = (0 until words)
      .map(w => bit_count(element_at(col("code"), w + 1)
        .bitwiseXOR(element_at(col("qc"), w + 1))).cast("int"))
      .reduce(_ + _)
    codes.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("hamming", ham)
      .orderBy(col("hamming"), col("vec_id")).limit(BqShortlist)
      .select(col("vec_id"), col("hamming"))
  }

  /** e16's shortlist size and diversified-result size. */
  private val MmrShortlist = 20
  private val MmrK = 10

  /** e11 fusion constants: RRF's canonical C = 60 (Cormack et al.'09 —
    * large enough that rank-1 doesn't dominate, small enough that depth
    * still matters), list depth K = 50, fused output 20.
    */
  private[operators] val RrfC = 60
  private[operators] val HybridK = 50
  private[operators] val HybridOut = 20

  /** k for the e10 in-engine training demo. */
  private[operators] val KmeansK = 4

  /** Rounded euclidean distance to each centroid + lowest-index argmin.
    * Distances round to 6 before the argmin so both engines compare
    * identical doubles; the fold is the HOF formulation (interpreted) —
    * acceptable for a training pass that runs O(iters) times offline,
    * unlike the serving paths (e2/e8) which use fused codegen kernels.
    */
  private def kmeansAssign(emb: DataFrame, cents: Seq[Seq[Double]]): DataFrame = {
    val dists = cents.map { c =>
      round(sqrt(aggregate(
        zip_with(col("embedding").cast("array<double>"), typedLit(c),
          (x, cc) => (x - cc) * (x - cc)),
        lit(0.0), (acc, v) => acc + v)), 6)
    }
    emb.withColumn("_d", array(dists: _*))
      .withColumn("cid",
        (array_position(col("_d"), array_min(col("_d"))) - 1).cast("int"))
      .withColumn("dist", element_at(col("_d"), col("cid") + 1))
      .drop("_d")
  }

  /** Query-set size and per-query K for e9 batch serving. */
  private val BatchQueries = 8
  private val BatchK = 20

  /** e14 two-level IVF geometry: 16 pretrained centroids clustered into
    * 4 groups (√k — the IMI balance point: group scan + within-group
    * scan both √k); queries probe 2 groups, 6 member centroids (e5's
    * nprobe for comparability). Computed once, driver-side, from the
    * same committed constants the oracle replays.
    */
  private val Ivf2Groups = 4
  private val Ivf2ProbeGroups = 2
  private val Ivf2ProbeCids = 6
  private lazy val ivf2: (Array[Array[Float]], Array[Array[Int]]) =
    IvfIndex.groupCentroids(IvfIndex.Pretrained, Ivf2Groups)

  private[operators] val RecallProbes = 8
  private[operators] val RecallK = 10
  private[operators] val RecallNprobe = 2

  private[operators] val MrlPrefixDim = 16
  private[operators] val MrlShortlist = 200

  /** e18's cosine radius: 0.2 keeps a selective-but-nonempty band on the
    * fixtures (33 of 500 at sf0.001) — range results scale with
    * neighborhood density, not corpus size, which is the operator's point.
    */
  private[operators] val RangeTau = 0.2

  /** DuckDB replay of [[lshBuckets]]: per-table bucket codes b0..b{n-1}
    * over the SAME hyperplane constants (sign(list_dot_product) ==
    * sign(cosine) — the positive norms can't flip it). Shared by the d6
    * and e4 oracles so candidate sets match the Spark side exactly.
    */
  private[operators] def bucketColsSql(numTables: Int): String =
    (0 until numTables).map { t =>
      val bucket = (0 until PlanesPerTable).map { j =>
        val plane = (0 until Dim)
          .map(d => planeSign(t * PlanesPerTable + j, d))
          .map(v => if (v > 0) "1" else "-1").mkString(", ")
        s"CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), [$plane]) > 0 THEN ${1L << j} ELSE 0 END"
      }.mkString("\n      + ")
      s"($bucket) AS b$t"
    }.mkString(",\n    ")

  private val knnOracle =
    """SELECT vec_id, cos_sim FROM (
      |  SELECT e.vec_id,
      |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS cos_sim
      |  FROM embeddings e,
      |       (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) q
      |  WHERE e.vec_id <> 0)
      |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin

  override def oracles: Map[String, String] = Map(
    // e11: replay both rankers with the identical arithmetic (micro-unit
    // quantization before the integer cross-term sum, rank windows over
    // the bounded top-K), then the same fixed RRF expression of the
    // integer ranks.
    "e11_hybrid_rrf" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
         |dcos AS (
         |  SELECT e.vec_id AS doc_id,
         |    CAST(round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) * 1000000, 0) AS BIGINT) AS cos6
         |  FROM embeddings e, q WHERE e.vec_id <> 0),
         |dense AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY cos6 DESC, doc_id) AS INTEGER) AS r_dense
         |  FROM dcos QUALIFY r_dense <= $HybridK),
         |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS INTEGER) AS dl FROM tf GROUP BY doc_id),
         |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
         |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         |qterms AS (
         |  SELECT w, df FROM dfreq
         |  QUALIFY row_number() OVER (ORDER BY df DESC, w) BETWEEN 10 AND 14),
         |scored AS (
         |  SELECT tf.doc_id,
         |    CAST(round(
         |      ((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
         |      * (CAST(tf AS DOUBLE) * 2.2
         |         / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
         |            * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE))))))
         |      * 1000000, 0) AS BIGINT) AS score6
         |  FROM tf JOIN qterms USING (w) JOIN dl USING (doc_id), stats
         |  WHERE tf.doc_id <> 0),
         |summed AS (SELECT doc_id, sum(score6) AS bm6 FROM scored GROUP BY doc_id),
         |sparse AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY bm6 DESC, doc_id) AS INTEGER) AS r_sparse
         |  FROM summed QUALIFY r_sparse <= $HybridK)
         |SELECT doc_id, r_dense, r_sparse,
         |  coalesce(CAST(1 AS DOUBLE) / ($RrfC + r_dense), CAST(0 AS DOUBLE))
         |    + coalesce(CAST(1 AS DOUBLE) / ($RrfC + r_sparse), CAST(0 AS DOUBLE)) AS rrf_score
         |FROM dense FULL OUTER JOIN sparse USING (doc_id)
         |ORDER BY rrf_score DESC, doc_id LIMIT $HybridOut""".stripMargin,

    "e1_knn_brute" -> knnOracle,
    "e2_knn_expr" -> knnOracle,

    // e18: the knnOracle scan with the LIMIT replaced by the same
    // round-6 radius filter the Spark side applies.
    "e18_range_search" ->
      s"""SELECT vec_id, cos_sim FROM (
         |  SELECT e.vec_id,
         |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS cos_sim
         |  FROM embeddings e,
         |       (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) q
         |  WHERE e.vec_id <> 0)
         |WHERE cos_sim >= $RangeTau
         |ORDER BY cos_sim DESC, vec_id""".stripMargin,

    // e19: assignment replayed from the same centroid constants as e5's
    // oracle (lowest-index argmin over distListSql's bit-exact squared
    // distances); the split rule is the identical cross-multiplied
    // integer comparison.
    "e19_ivf_append" -> {
      val k = IvfIndex.Pretrained.length
      val distE = IvfIndex.distListSql(IvfIndex.Pretrained, "e")
      s"""WITH asg AS (
         |  SELECT vec_id, $distE AS d
         |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)),
         |c AS (
         |  SELECT vec_id,
         |    CAST(list_position(d, list_min(d)) - 1 AS INTEGER) AS cid
         |  FROM asg),
         |g AS (
         |  SELECT cid,
         |    CAST(sum(CASE WHEN vec_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_existing,
         |    CAST(sum(CASE WHEN vec_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
         |  FROM c GROUP BY cid),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)
         |SELECT cid, n_existing, n_new,
         |  n_existing + n_new AS n_total,
         |  CAST((n_existing + n_new) * $k > 2 * n AS INTEGER) AS needs_split
         |FROM g, t ORDER BY cid""".stripMargin
    },

    // e20: the sign rule replayed per dimension — popcount of the xor'd
    // packed words equals the count of sign-disagreeing dimensions by
    // construction, so the oracle never needs the word layout; Hamming
    // ties are exact integers, the re-rank boundary is e1's round-6
    // contract.
    "e20_bq_knn" ->
      s"""WITH q AS (
         |  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
         |h AS (
         |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS ev,
         |    CAST(len(list_filter(range(1, ${Dim + 1}), i ->
         |      (e.embedding[i] > 0) <> (q.qe[i] > 0))) AS INTEGER) AS hamming
         |  FROM embeddings e, q WHERE e.vec_id <> 0),
         |short AS (
         |  SELECT vec_id, ev, hamming FROM h
         |  ORDER BY hamming, vec_id LIMIT $BqShortlist)
         |SELECT s.vec_id, s.hamming,
         |  round(list_cosine_similarity(s.ev, q.qe), 6) AS cos_sim
         |FROM short s, q
         |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin,

    // e21: the serving copy's cid is e5/e19's frozen-quantizer
    // assignment, so the oracle recomputes it from the raw embeddings
    // and replays ledger membership + the 20 % compaction rule in exact
    // integers (cross-multiplied — no float fraction to disagree on).
    "e21_ivf_delete" -> {
      val distE = IvfIndex.distListSql(IvfIndex.Pretrained, "e")
      s"""WITH asg AS (
         |  SELECT vec_id, $distE AS d
         |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)),
         |c AS (
         |  SELECT vec_id,
         |    CAST(list_position(d, list_min(d)) - 1 AS INTEGER) AS cid
         |  FROM asg),
         |g AS (
         |  SELECT cid, CAST(count(*) AS BIGINT) AS n_total,
         |    CAST(sum(CASE WHEN vec_id % 13 = 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted
         |  FROM c GROUP BY cid)
         |SELECT cid, n_total, n_deleted,
         |  n_total - n_deleted AS n_live,
         |  CAST(n_deleted * 5 > n_total AS INTEGER) AS needs_compact
         |FROM g ORDER BY cid""".stripMargin
    },

    // e22: assignment replayed from the e5/e19 centroid constants, the
    // per-row distortion the same round-6→micro-unit quantization as
    // every e-family cosine, the retrain rule the identical HUGEINT
    // cross-multiply.
    "e22_ivf_drift" -> {
      val cents = IvfIndex.Pretrained
      val distE = IvfIndex.distListSql(cents, "e")
      val centRows = cents.zipWithIndex.map { case (c, i) =>
        s"($i, [${c.map(_.toDouble.toString).mkString(", ")}])"
      }.mkString(",\n    ")
      s"""WITH asg AS (
         |  SELECT vec_id, e, $distE AS d
         |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)),
         |c AS (
         |  SELECT vec_id, e,
         |    CAST(list_position(d, list_min(d)) - 1 AS INTEGER) AS cid
         |  FROM asg),
         |cv AS (SELECT * FROM (VALUES
         |    $centRows) t(cid, cv)),
         |per AS (
         |  SELECT c.cid,
         |    1000000 - CAST(round(list_cosine_similarity(c.e, cv.cv) * 1000000, 0) AS BIGINT) AS d6
         |  FROM c JOIN cv USING (cid)),
         |g AS (
         |  SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs,
         |    CAST(sum(d6) AS BIGINT) AS sum_d6
         |  FROM per GROUP BY cid),
         |t AS (
         |  SELECT CAST(sum(n_vecs) AS BIGINT) AS ng,
         |    CAST(sum(sum_d6) AS BIGINT) AS sg
         |  FROM g)
         |SELECT cid, n_vecs, sum_d6,
         |  CAST(sum_d6 AS DOUBLE) / CAST(n_vecs AS DOUBLE) AS mean_d6,
         |  CAST(CAST(sum_d6 AS HUGEINT) * CAST(ng AS HUGEINT) * 2
         |       > CAST(sg AS HUGEINT) * CAST(n_vecs AS HUGEINT) * 3 AS INTEGER) AS needs_retrain
         |FROM g, t ORDER BY cid""".stripMargin
    },

    // e23/e24: both directions' top-k replayed as rank windows over the
    // same micro-unit scores (ties by id — the heap's own rule),
    // neighborhood SUMS kept integer, one terminal division for the
    // margin; the two oracles differ ONLY in the candidate CTEs (exact
    // cross vs within-co-assigned-list join), mirroring the queries.
    "e23_bitext_mine" -> bitextMineSql(
      """WITH a AS (
        |  SELECT vec_id AS x_id, CAST(embedding AS DOUBLE[]) AS xe
        |  FROM embeddings WHERE label = 0),
        |b AS (
        |  SELECT vec_id AS y_id, CAST(embedding AS DOUBLE[]) AS ye
        |  FROM embeddings WHERE label = 1),
        |sc AS (
        |  SELECT x_id, y_id,
        |    CAST(round(list_cosine_similarity(xe, ye) * 1e6, 0) AS BIGINT) AS cos6
        |  FROM a, b)""".stripMargin),

    "e24_bitext_blocked" -> bitextMineSql(
      s"""WITH asg AS (
         |  SELECT vec_id, label, e, ${IvfIndex.distListSql(IvfIndex.Pretrained, "e")} AS d
         |  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)),
         |c AS (
         |  SELECT vec_id, label, e,
         |    CAST(list_position(d, list_min(d)) - 1 AS INTEGER) AS cid
         |  FROM asg),
         |a AS (SELECT cid, vec_id AS x_id, e AS xe FROM c WHERE label = 0),
         |b AS (SELECT cid, vec_id AS y_id, e AS ye FROM c WHERE label = 1),
         |sc AS (
         |  SELECT x_id, y_id,
         |    CAST(round(list_cosine_similarity(xe, ye) * 1e6, 0) AS BIGINT) AS cos6
         |  FROM a JOIN b USING (cid))""".stripMargin),

    // e25: top-2 probes replayed as first-position-of-min twice — the
    // second min over the list with rank-1's slot masked to +inf, so
    // every rank's (distance, index) tiebreak is the kernel's
    // (distListSql replays the kernel's squared distances bit-exactly —
    // r13 ADVICE: the sqrt form could collapse near-tied ranks, flipping
    // the masked second-min); candidate pairs dedup BEFORE scoring, then
    // the shared mining tail.
    "e25_bitext_probe2" -> bitextMineSql(
      s"""WITH asg AS (
         |  SELECT vec_id, label, e, ${IvfIndex.distListSql(IvfIndex.Pretrained, "e")} AS d
         |  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)),
         |r1 AS (
         |  SELECT vec_id, label, e, d,
         |    CAST(list_position(d, list_min(d)) - 1 AS INTEGER) AS c1
         |  FROM asg),
         |r2 AS (
         |  SELECT vec_id, label, e, c1,
         |    CAST(list_position(dm, list_min(dm)) - 1 AS INTEGER) AS c2
         |  FROM (SELECT *, list_transform(range(1, ${IvfIndex.Pretrained.length} + 1),
         |          i -> CASE WHEN i = c1 + 1 THEN 1e308 ELSE d[i] END) AS dm
         |        FROM r1)),
         |pr AS (SELECT vec_id, label, unnest([c1, c2]) AS cid FROM r2),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS x_id, b.vec_id AS y_id
         |  FROM pr a JOIN pr b ON a.cid = b.cid AND a.label = 0 AND b.label = 1),
         |ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |sc AS (
         |  SELECT x_id, y_id,
         |    CAST(round(list_cosine_similarity(ax.e, bz.e) * 1e6, 0) AS BIGINT) AS cos6
         |  FROM cand JOIN ev ax ON ax.vec_id = cand.x_id
         |            JOIN ev bz ON bz.vec_id = cand.y_id)""".stripMargin),

    // e16: shortlist + pairwise sims in micro-units, then the greedy
    // MMR selection unrolled step-by-step (t17's unrolled-iteration
    // discipline): each step CTE picks argmax(rel6 − maxsim6-to-picked)
    // with (margin DESC, vec_id) ties, exactly the driver loop.
    // e17: probes + assignment replayed like e5's oracle; the per-cluster
    // shifted codebooks are recomputed relationally from compact centroid
    // and codebook REAL tables (REAL + REAL reproduces the Float sums
    // bit-exactly — verified against 2000 random float32 pairs); codes
    // are the lowest-index argmin per (vector, subspace); the ADC lookup
    // recomputes each table entry from the query row with adcDistance's
    // per-term accumulation order and sums the 8 subspace terms
    // left-to-right like the Column reduce. MATERIALIZED hints stop
    // DuckDB re-inlining the shared frames (the e16 lesson).
    "e17_ivfpq_knn" -> {
      val cents = IvfIndex.Pretrained
      val rbooks = PqIndex.PretrainedResidual
      val sd = PqIndex.SubDim
      val distQ = IvfIndex.distListSql(cents, "q.qe")
      val distE = IvfIndex.distListSql(cents, "e")
      val centRows = cents.zipWithIndex.map { case (c, i) =>
        s"($i, CAST([${c.map(_.toDouble.toString).mkString(", ")}] AS REAL[]))"
      }.mkString(",\n    ")
      val bookRows = (for {
        j <- 0 until PqIndex.SubSpaces
        (b, i) <- rbooks(j).zipWithIndex
      } yield s"($j, $i, CAST([${b.map(_.toDouble.toString).mkString(", ")}] AS REAL[]))")
        .mkString(",\n    ")
      val codeCols = (0 until PqIndex.SubSpaces)
        .map(j => s"max(CASE WHEN j = $j THEN i END) AS c$j").mkString(",\n    ")
      val adcSum = (0 until PqIndex.SubSpaces)
        .map(j => s"(SELECT d2 FROM lut WHERE lut.cid = codes.cid AND lut.j = $j AND lut.i = codes.c$j)")
        .mkString("\n      + ")
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
         |qd AS (SELECT $distQ AS d FROM q),
         |probes AS (
         |  SELECT CAST(i AS INTEGER) - 1 AS cid
         |  FROM qd, range(1, ${cents.length + 1}) t(i)
         |  ORDER BY d[CAST(i AS INTEGER)], cid LIMIT 6),
         |cv AS (SELECT * FROM (VALUES
         |    $centRows) t(cid, cv)),
         |bv AS (SELECT * FROM (VALUES
         |    $bookRows) t(j, i, bv)),
         |shifted AS MATERIALIZED (
         |  SELECT p.cid, b.j, b.i,
         |    list_transform(range(1, ${sd + 1}), k -> c.cv[b.j * $sd + k] + b.bv[k]) AS sv
         |  FROM probes p JOIN cv c USING (cid) CROSS JOIN bv b),
         |asg AS (
         |  SELECT vec_id, e, $distE AS d
         |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)),
         |cf AS MATERIALIZED (
         |  SELECT vec_id, e, cid FROM (
         |    SELECT vec_id, e,
         |      CAST(list_position(d, list_min(d)) - 1 AS INTEGER) AS cid
         |    FROM asg WHERE vec_id <> 0)
         |  WHERE cid IN (SELECT cid FROM probes)),
         |pc AS (
         |  -- bit-exact SQUARED distance for the code-assignment rank (the
         |  -- r13/r14 ADVICE convention, same as IvfIndex.distListSql): the
         |  -- earlier list_distance sqrt form was only argmin-monotone and
         |  -- a correctly-rounded sqrt can collapse distinct squared
         |  -- distances into a row_number tie.
         |  SELECT c.vec_id, c.cid, s.j, s.i,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(
         |      list_zip(c.e[s.j * $sd + 1 : (s.j + 1) * $sd], CAST(s.sv AS DOUBLE[])),
         |      zz -> (zz[1] - zz[2]) * (zz[1] - zz[2]))), (acc, x) -> acc + x) AS dd
         |  FROM cf c JOIN shifted s ON s.cid = c.cid),
         |code AS (
         |  SELECT vec_id, cid, j, i FROM (
         |    SELECT vec_id, cid, j, i,
         |      row_number() OVER (PARTITION BY vec_id, j ORDER BY dd, i) AS rn
         |    FROM pc)
         |  WHERE rn = 1),
         |lut AS MATERIALIZED (
         |  -- explicit left-to-right + chain, not list_sum: pins the IEEE
         |  -- accumulation order to adcDistance's Scala fold (same rule as
         |  -- PqIndex.adcKnnSql) — list_sum's summation strategy is not
         |  -- contractual and a pairwise rewrite would shift the shortlist
         |  -- boundary.
         |  SELECT s.cid, s.j, s.i,
         |    ${(1 to sd).map(k =>
             s"(q.qe[s.j * $sd + $k] - CAST(s.sv[$k] AS DOUBLE)) * (q.qe[s.j * $sd + $k] - CAST(s.sv[$k] AS DOUBLE))")
             .mkString("\n         |      + ").stripMargin} AS d2
         |  FROM shifted s, q),
         |codes AS (
         |  SELECT vec_id, cid,
         |    $codeCols
         |  FROM code GROUP BY vec_id, cid),
         |short AS (
         |  SELECT vec_id,
         |      $adcSum AS adc
         |  FROM codes
         |  ORDER BY adc, vec_id LIMIT 200)
         |SELECT vec_id, cos_sim FROM (
         |  SELECT e.vec_id,
         |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS cos_sim
         |  FROM embeddings e JOIN short USING (vec_id) CROSS JOIN q)
         |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin
    },

    // Every step CTE is AS MATERIALIZED: DuckDB inlines CTEs by
    // default, and the selK chain references selK-1 three times — an
    // inlined chain re-expands 3^K times (measured: the inlined form
    // exhausts file handles re-opening the parquet; materialized, the
    // whole oracle is 0.6 s).
    "e16_mmr_diversify" -> {
      val steps = (2 to MmrK).map { k =>
        s"""s$k AS MATERIALIZED (
           |  SELECT c.vec_id FROM cand c
           |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${k - 1})
           |  ORDER BY c.rel6 - (SELECT max(sim6) FROM sims
           |    WHERE a = c.vec_id AND b IN (SELECT vec_id FROM sel${k - 1})) DESC,
           |    c.vec_id
           |  LIMIT 1),
           |sel$k AS MATERIALIZED (SELECT * FROM sel${k - 1} UNION ALL SELECT vec_id, $k FROM s$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
         |cand AS MATERIALIZED (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         |    CAST(round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qe) * 1000000, 0) AS BIGINT) AS rel6
         |  FROM embeddings, q WHERE vec_id <> 0
         |  ORDER BY rel6 DESC, vec_id LIMIT $MmrShortlist),
         |sims AS MATERIALIZED (
         |  SELECT a.vec_id AS a, b.vec_id AS b,
         |    CAST(round(list_cosine_similarity(a.e, b.e) * 1000000, 0) AS BIGINT) AS sim6
         |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         |s1 AS (SELECT vec_id FROM cand ORDER BY rel6 DESC, vec_id LIMIT 1),
         |sel1 AS MATERIALIZED (SELECT vec_id, 1 AS rank FROM s1),
         |$steps
         |SELECT sel$MmrK.rank, sel$MmrK.vec_id, cand.rel6
         |FROM sel$MmrK JOIN cand USING (vec_id) ORDER BY rank""".stripMargin
    },

    // e15: the e1 oracle narrowed by the same metadata predicate.
    "e15_filtered_knn" ->
      """SELECT vec_id, label, cos_sim FROM (
        |  SELECT e.vec_id, e.label,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS cos_sim
        |  FROM embeddings e,
        |       (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) q
        |  WHERE e.vec_id <> 0 AND e.label % 3 = 1)
        |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin,

    // e13: both stages replayed — micro-unit prefix ranking over
    // e[1:MrlPrefixDim] with (pre6 DESC, vec_id) ties, then full-dim
    // rescore of the bounded shortlist.
    "e13_mrl_knn" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
         |short AS (
         |  SELECT vec_id, e FROM (
         |    SELECT e.vec_id, e.e,
         |      CAST(round(list_cosine_similarity(e.e[1:$MrlPrefixDim], q.qe[1:$MrlPrefixDim])
         |        * 1000000, 0) AS BIGINT) AS pre6
         |    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |          FROM embeddings WHERE vec_id <> 0) e, q)
         |  QUALIFY row_number() OVER (ORDER BY pre6 DESC, vec_id) <= $MrlShortlist)
         |SELECT vec_id, cos_sim FROM (
         |  SELECT s.vec_id,
         |    round(list_cosine_similarity(s.e, q.qe), 6) AS cos_sim
         |  FROM short s, q)
         |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin,

    // e14: two-level assignment and probe selection replayed from the
    // same derived constants — group argmin via list_position first-min,
    // within-group argmin over the member distance sublist (members
    // ascend, so first-min = lowest global cid, the kernel's rule), and
    // probe selection ordered (distance, id) at both levels.
    "e14_ivf2_knn" -> {
      val (gc, members) = ivf2
      val distGQ = IvfIndex.distListSql(gc, "q.qe")
      val distGE = IvfIndex.distListSql(gc, "e")
      val distQ = IvfIndex.distListSql(IvfIndex.Pretrained, "q.qe")
      val distE = IvfIndex.distListSql(IvfIndex.Pretrained, "e")
      // per-group argmin over the member distance sublist → global cid
      def memberArgmin(ms: Array[Int]): String = {
        val dl = ms.map(m => s"d[${m + 1}]").mkString("[", ", ", "]")
        val ml = ms.mkString("[", ", ", "]")
        s"CAST(($ml)[list_position($dl, list_min($dl))] AS INTEGER)"
      }
      val caseArms = members.indices
        .map(g => s"WHEN $g THEN ${memberArgmin(members(g))}")
        .mkString("\n         |      ")
      val memRows = members.zipWithIndex
        .flatMap { case (ms, g) => ms.map(c => s"($c, $g)") }.mkString(", ")
      s"""WITH q AS (
         |  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
         |qgd AS (SELECT $distGQ AS gd FROM q),
         |qg AS (
         |  SELECT CAST(i AS INTEGER) - 1 AS gid
         |  FROM qgd, range(1, ${gc.length + 1}) t(i)
         |  ORDER BY gd[CAST(i AS INTEGER)], gid LIMIT $Ivf2ProbeGroups),
         |qd AS (SELECT $distQ AS d FROM q),
         |mem AS (SELECT * FROM (VALUES $memRows) t(cid, gid)),
         |probes AS (
         |  SELECT m.cid FROM mem m JOIN qg USING (gid), qd
         |  ORDER BY qd.d[m.cid + 1], m.cid LIMIT $Ivf2ProbeCids),
         |base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |gasg AS (
         |  SELECT vec_id, e,
         |    CAST(list_position(gd, list_min(gd)) - 1 AS INTEGER) AS gid
         |  FROM (SELECT vec_id, e, $distGE AS gd FROM base)),
         |casg AS (
         |  SELECT vec_id, e,
         |    CASE gid
         |      $caseArms
         |    END AS cid
         |  FROM (SELECT vec_id, e, gid, $distE AS d FROM gasg))
         |SELECT vec_id, cid, cos_sim FROM (
         |  SELECT c.vec_id, c.cid,
         |    round(list_cosine_similarity(c.e, q.qe), 6) AS cos_sim
         |  FROM casg c, q
         |  WHERE c.vec_id <> 0 AND c.cid IN (SELECT cid FROM probes))
         |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin
    },

    // e12: replay probes (first-RecallProbes vectors), per-probe nearest
    // RecallNprobe centroids (same distance list + (d, cid) tie rule as
    // e5), first-min assignment, micro-unit cosines, per-probe ranks on
    // (cos6 DESC, vec_id), then count the truth∩approx overlap.
    "e12_ann_recall" -> {
      val distP = IvfIndex.distListSql(IvfIndex.Pretrained, "p.pe")
      val distE = IvfIndex.distListSql(IvfIndex.Pretrained, "e")
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |probes AS (SELECT vec_id AS probe_id, e AS pe FROM emb WHERE vec_id < $RecallProbes),
         |pd AS (SELECT probe_id, $distP AS d FROM probes p),
         |pc AS (
         |  SELECT probe_id, cid FROM (
         |    SELECT probe_id, CAST(i AS INTEGER) - 1 AS cid,
         |      row_number() OVER (PARTITION BY probe_id
         |        ORDER BY d[CAST(i AS INTEGER)], i) AS rn
         |    FROM pd, range(1, ${IvfIndex.Pretrained.length + 1}) t(i))
         |  WHERE rn <= $RecallNprobe),
         |asg AS (
         |  SELECT vec_id, e,
         |    CAST(list_position(d2, list_min(d2)) - 1 AS INTEGER) AS cid
         |  FROM (SELECT vec_id, e, $distE AS d2 FROM emb WHERE vec_id >= $RecallProbes)),
         |scored AS (
         |  SELECT p.probe_id, a.vec_id, a.cid,
         |    CAST(round(list_cosine_similarity(a.e, p.pe) * 1000000, 0) AS BIGINT) AS cos6
         |  FROM asg a, probes p),
         |truth AS (
         |  SELECT probe_id, vec_id FROM scored
         |  QUALIFY row_number() OVER (PARTITION BY probe_id
         |    ORDER BY cos6 DESC, vec_id) <= $RecallK),
         |approx AS (
         |  SELECT s.probe_id, s.vec_id FROM scored s
         |  JOIN pc ON s.probe_id = pc.probe_id AND s.cid = pc.cid
         |  QUALIFY row_number() OVER (PARTITION BY s.probe_id
         |    ORDER BY cos6 DESC, s.vec_id) <= $RecallK),
         |overlap AS (
         |  SELECT t.probe_id, count(*) AS h
         |  FROM truth t JOIN approx a
         |    ON t.probe_id = a.probe_id AND t.vec_id = a.vec_id
         |  GROUP BY t.probe_id)
         |SELECT p.probe_id,
         |  CAST(coalesce(o.h, 0) AS BIGINT) AS hits,
         |  CAST(coalesce(o.h, 0) AS DOUBLE) / $RecallK.0 AS recall
         |FROM probes p LEFT JOIN overlap o USING (probe_id)
         |ORDER BY probe_id""".stripMargin
    },

    // Replays the two Lloyd iterations CTE by CTE: assignment =
    // first-min over rounded distances (ORDER BY d, cid ≡ lowest-index
    // argmin), update = the EXACT fixed-point mean — sum of round(v·1e6)
    // BIGINTs, one terminal double division — init = the first k raw
    // vectors (float→double is exact, no rounding needed).
    "e10_kmeans_train" -> {
      // list_reduce, not list_sum (r16 review finding): list_sum's
      // accumulation order is unpinned (SIMD/pairwise — the IvfIndex.
      // distListSql note), while the Spark side folds sequentially; a
      // sum landing within an ulp of a 0.5e-6 rounding boundary would
      // flip the 6th decimal and the argmin. list_reduce is sequential
      // by contract — the same r13/r14 convention e5/e17 adopted, which
      // this CTE had missed (its centroids are relations, so it can't
      // reuse the literal-centroid distListSql builder).
      def assignCte(a: String, cSrc: String): String =
        s"""$a AS (
           |  SELECT vec_id, cid,
           |    round(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list_transform(range(1, ${Dim + 1}),
           |        i -> (v[i] - c[i]) * (v[i] - c[i]))),
           |      (acc, x) -> acc + x)), 6) AS d
           |  FROM e, $cSrc),
           |${a}r AS (
           |  SELECT vec_id, cid, d,
           |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
           |  FROM $a)"""
      def updateCte(cNext: String, aPrev: String): String =
        s"""$cNext AS (
           |  SELECT cid, list(c ORDER BY pos) AS c FROM (
           |    SELECT s.cid, t.i AS pos,
           |      CAST(sum(CAST(round(v[t.i] * 1000000, 0) AS BIGINT)) AS DOUBLE)
           |        / CAST(count(*) * 1000000 AS DOUBLE) AS c
           |    FROM e JOIN (SELECT vec_id, cid FROM ${aPrev}r WHERE rn = 1) s USING (vec_id),
           |         range(1, ${Dim + 1}) t(i)
           |    GROUP BY s.cid, t.i)
           |  GROUP BY cid)"""
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c0 AS (
         |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
         |  FROM embeddings WHERE vec_id < $KmeansK),
         |${assignCte("a0", "c0")},
         |${updateCte("c1", "a0")},
         |${assignCte("a1", "c1")},
         |${updateCte("c2", "a1")},
         |${assignCte("a2", "c2")}
         |SELECT vec_id, CAST(cid AS INTEGER) AS cid, d AS dist
         |FROM a2r WHERE rn = 1 ORDER BY vec_id""".stripMargin
    },

    // Replays the SQ8 quantize→decode→score pipeline with the identical
    // arithmetic (same operation order, same round, 1-based indexing).
    "e8_sq_knn" ->
      s"""WITH dims AS (
         |  SELECT t.i AS i,
         |    min(CAST(embedding[t.i] AS DOUBLE)) AS lo,
         |    max(CAST(embedding[t.i] AS DOUBLE)) AS hi
         |  FROM embeddings, range(1, ${Dim + 1}) t(i) GROUP BY t.i),
         |cons AS (SELECT list(lo ORDER BY i) AS los, list(hi ORDER BY i) AS his FROM dims),
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
         |dec AS (
         |  SELECT e.vec_id,
         |    list_transform(range(1, ${Dim + 1}), i ->
         |      los[i] + round((CAST(embedding[i] AS DOUBLE) - los[i]) * 255.0
         |                     / (his[i] - los[i])) * (his[i] - los[i]) / 255.0) AS de
         |  FROM embeddings e, cons WHERE e.vec_id <> 0)
         |SELECT vec_id, cos_sim FROM (
         |  SELECT vec_id, round(list_cosine_similarity(de, qe), 6) AS cos_sim
         |  FROM dec, q)
         |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin,
    // Replays PQ encoding from the pretrained codebook constants the
    // queries embed — static SQL, exact across scale factors.
    "e6_pq_codes" -> PqIndex.encodeSql(PqIndex.Pretrained),
    // e3: the same quantize-before-sum mean (micro-unit longs, one
    // terminal division) — never a bare avg(double).
    "e3_label_centroids" ->
      """SELECT label, CAST(i AS INTEGER) - 1 AS pos,
        |  round(CAST(sum(CAST(round(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000, 0) AS BIGINT)) AS DOUBLE)
        |    / CAST(count(*) * 1000000 AS DOUBLE), 6) AS c
        |FROM embeddings, range(1, 65) t(i)
        |GROUP BY label, i ORDER BY label, pos""".stripMargin,

    // e4: approximate BY CONSTRUCTION, deterministic BY CONSTANTS — the
    // oracle replays the 16-table bucketing from the same hyperplanes, so
    // the candidate set (and thus the top-20) matches exactly.
    "e4_knn_lsh" -> {
      val sameBucket = (0 until NumTables)
        .map(t => s"s.b$t = q.b$t").mkString(" OR ")
      s"""WITH sig AS (
         |  SELECT vec_id, embedding,
         |    ${bucketColsSql(NumTables)}
         |  FROM embeddings),
         |q AS (SELECT * FROM sig WHERE vec_id = 0)
         |SELECT vec_id, cos_sim FROM (
         |  SELECT s.vec_id,
         |    round(list_cosine_similarity(CAST(s.embedding AS DOUBLE[]),
         |                                 CAST(q.embedding AS DOUBLE[])), 6) AS cos_sim
         |  FROM sig s, q
         |  WHERE s.vec_id <> 0 AND ($sameBucket))
         |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin
    },

    // e5: the oracle replays assignment AND probe selection from the
    // same pretrained centroid constants; distListSql's squared form
    // ranks the kernel's exact values, and ties break lowest-index on
    // both sides.
    "e5_ivf_knn" -> {
      val distQ = IvfIndex.distListSql(IvfIndex.Pretrained, "q.qe")
      val distE = IvfIndex.distListSql(IvfIndex.Pretrained, "e")
      s"""WITH q AS (
         |  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
         |qd AS (SELECT $distQ AS d FROM q),
         |probes AS (
         |  SELECT CAST(i AS INTEGER) - 1 AS cid
         |  FROM qd, range(1, ${IvfIndex.Pretrained.length + 1}) t(i)
         |  ORDER BY d[CAST(i AS INTEGER)], cid LIMIT 6),
         |asg AS (
         |  SELECT vec_id, e, $distE AS d
         |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)),
         |cand AS (
         |  SELECT vec_id, e,
         |    CAST(list_position(d, list_min(d)) - 1 AS INTEGER) AS cid
         |  FROM asg)
         |SELECT vec_id, cid, cos_sim FROM (
         |  SELECT c.vec_id, c.cid,
         |    round(list_cosine_similarity(c.e, q.qe), 6) AS cos_sim
         |  FROM cand c, q
         |  WHERE c.vec_id <> 0 AND c.cid IN (SELECT cid FROM probes))
         |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin
    },

    // e7: codes replayed from the PQ codebook constants (same CTE as
    // e6's oracle), ADC lookup tables computed from the query row with
    // the same per-subspace accumulation order as PqIndex.adcDistance,
    // shortlist and re-rank with the same deterministic tie rules.
    "e7_pq_knn" -> PqIndex.adcKnnSql(PqIndex.Pretrained, shortlist = 200, k = 20),

    // e9: the oracle states the spec as the window formulation — same
    // micro-unit scores, same (cos6 DESC, vec_id) order, rn <= K — which
    // the bounded-heap aggregate must reproduce exactly.
    "e9_knn_batch" ->
      s"""WITH q AS (
         |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
         |  FROM embeddings WHERE vec_id < $BatchQueries),
         |c AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
         |  FROM embeddings WHERE vec_id >= $BatchQueries),
         |sc AS (
         |  SELECT q_id, vec_id,
         |    CAST(round(list_cosine_similarity(e, qe) * 1e6, 0) AS BIGINT) AS cos6
         |  FROM c, q),
         |r AS (
         |  SELECT q_id, vec_id, cos6,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos6 DESC, vec_id) AS INTEGER) AS rn
         |  FROM sc)
         |SELECT q_id, vec_id, CAST(cos6 AS DOUBLE) / 1000000.0 AS cos_sim, rn
         |FROM r WHERE rn <= $BatchK ORDER BY q_id, rn""".stripMargin
  )
}
