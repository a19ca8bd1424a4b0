package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.functions.{cosine_similarity, cosine_similarity_hof, lsh_bucket_codes}

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
    emb.withColumn("_buckets",
        lsh_bucket_codes(col("embedding"), typedLit(planes), PlanesPerTable))
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

    // e3: per-label centroids (the "coarse quantizer" of an IVF index) —
    // posexplode + groupBy(label, pos): partial aggregation makes this one
    // small shuffle regardless of corpus size.
    "e3_label_centroids" -> ((s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("v").cast("double")), 6).as("c"))
        .orderBy("label", "pos")),

    // e5: IVF ANN — k-means coarse quantizer (16 clusters, 3 iterations),
    // query probes its 6 nearest clusters, exact cosine re-score inside.
    // On this near-random corpus the true top-20 spread across 7 of 16
    // clusters (measured), so nprobe=2 recalls 0.75 and 6 recalls 0.85 —
    // clustered real-world embeddings concentrate far more, and nprobe is
    // the documented dial.
    // Assignment is the codegen'd nearest_centroid projection (no shuffle,
    // no row multiplication — see IvfIndex) and the query vector is an
    // array literal, so the probe query is scan → project → filter →
    // TakeOrderedAndProject: one pass over the corpus, no joins at all.
    // Approximate ⇒ rows-only driver check; RecallSpec gates recall@20.
    "e5_ivf_knn" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val centroids = IvfIndex.kmeans(s, emb, k = 16, iters = 3)
      val q = emb.where(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val probes = IvfIndex.probeCids(centroids, q, nprobe = 6)
      IvfIndex.assign(emb, centroids)
        .where(col("cid").isin(probes: _*) && col("vec_id") =!= 0)
        .select(col("vec_id"), col("cid"),
          round(cosine_similarity(col("embedding"), typedLit(q.toSeq)), 6).as("cos_sim"))
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
    // → TakeOrderedAndProject (re-rank). Approximate ⇒ rows-only check;
    // RecallSpec gates recall@20. Shortlist size is the recall dial.
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
    // with the query in ANY of the 4 tables; exact cosine re-score on the
    // deduped candidate set. Approximate ⇒ rows-only check (no SQL
    // oracle); determinism guaranteed by seeded hyperplanes.
    "e4_knn_lsh" -> ((s, dir) => {
      val sig = lshBuckets(s, Tables(s, dir, "embeddings"))
      val q = sig.where(col("vec_id") === 0)
        .select(col("table").as("qtable"), col("bucket").as("qbucket"),
          col("embedding").as("qe"))
      sig.where(col("vec_id") =!= 0)
        .join(broadcast(q),
          col("table") === col("qtable") && col("bucket") === col("qbucket"))
        .select(col("vec_id"), col("embedding"), col("qe"))
        .dropDuplicates("vec_id")
        .select(col("vec_id"),
          round(cosine_similarity(col("embedding"), col("qe")), 6).as("cos_sim"))
        .orderBy(desc("cos_sim"), col("vec_id"))
        .limit(20)
    })
  )

  private val knnOracle =
    """SELECT vec_id, cos_sim FROM (
      |  SELECT e.vec_id,
      |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS cos_sim
      |  FROM embeddings e,
      |       (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) q
      |  WHERE e.vec_id <> 0)
      |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin

  override def oracles: Map[String, String] = Map(
    "e1_knn_brute" -> knnOracle,
    "e2_knn_expr" -> knnOracle,
    // Replays PQ encoding from the pretrained codebook constants the
    // queries embed — static SQL, exact across scale factors.
    "e6_pq_codes" -> PqIndex.encodeSql(PqIndex.Pretrained),
    "e3_label_centroids" ->
      """SELECT label, CAST(i AS INTEGER) - 1 AS pos,
        |  round(avg(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)), 6) AS c
        |FROM embeddings, range(1, 65) t(i)
        |GROUP BY label, i ORDER BY label, pos""".stripMargin
    // e4_knn_lsh: intentionally no oracle — approximate operator.
  )
}
