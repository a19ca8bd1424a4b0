package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.functions.{cosine_similarity, cosine_similarity_hof}

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

  private val Dim = 64
  private val NumPlanes = 16

  /** Deterministic pseudo-Gaussian-free hyperplanes: sign pattern from a
    * per-(plane,dim) hash. Rademacher ±1 components are a standard LSH
    * choice (Charikar'02 uses Gaussians; ±1 preserves the cosine-LSH
    * property in expectation and is cheap + reproducible).
    */
  private def planeSign(plane: Int, d: Int): Float = {
    val h = scala.util.hashing.MurmurHash3.productHash((plane, d))
    if ((h & 1) == 0) 1.0f else -1.0f
  }

  private val PlanesPerTable = 4
  private val NumTables = NumPlanes / PlanesPerTable

  /** Multi-table LSH: NumTables independent hash tables of PlanesPerTable
    * hyperplanes each — candidates share a bucket in ANY table. One wide
    * table (2^16 buckets over a sparse corpus) has near-zero recall; 4
    * narrow tables (16 buckets each) give each query ~1/16 of the corpus
    * per table as candidates — the standard recall/selectivity dial (more
    * planes per table ⇒ fewer candidates; more tables ⇒ higher recall).
    */
  private def lshBuckets(s: SparkSession, emb: DataFrame): DataFrame = {
    val planes: Array[Array[Float]] =
      Array.tabulate(NumPlanes, Dim)((p, d) => planeSign(p, d))
    val planesCol = typedLit(planes.map(_.toSeq).toSeq)
    // sig bit p = sign(dot(embedding, plane_p)); all in one codegen'd
    // HOF expression, no UDF.
    val bits = transform(planesCol, p =>
      aggregate(zip_with(col("embedding"), p, (x, g) => x.cast("double") * g),
        lit(0.0), (acc, v) => acc + v))
    val buckets = (0 until NumTables).map { t =>
      (0 until PlanesPerTable).map { j =>
        when(element_at(bits, t * PlanesPerTable + j + 1) > 0, 1L << j)
          .otherwise(0L)
      }.reduce(_ + _)
    }
    emb.withColumn("_buckets", array(buckets: _*))
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
    // query probes its 2 nearest clusters, exact cosine re-score inside.
    // Approximate ⇒ rows-only check; see IvfIndex for the scale analysis.
    "e5_ivf_knn" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val centroids = IvfIndex.kmeans(s, emb, k = 16, iters = 3)
      val assigned = IvfIndex.assign(emb, centroids)
      val qe = emb.where(col("vec_id") === 0).select(col("embedding").as("qe"))
      // 2 nearest centroid ids for the query — k-row computation
      val probeCids = centroids.crossJoin(broadcast(qe))
        .select(col("cid"), IvfIndex.sqDist(col("centroid"), col("qe")).as("d"))
        .orderBy(col("d"), col("cid")).limit(2)
        .collect().map(_.getInt(0)).toSeq
      assigned
        .where(col("cid").isin(probeCids: _*) && col("vec_id") =!= 0)
        .crossJoin(broadcast(qe))
        .select(col("vec_id"), col("cid"),
          round(cosine_similarity(col("embedding"), col("qe")), 6).as("cos_sim"))
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
    "e3_label_centroids" ->
      """SELECT label, CAST(i AS INTEGER) - 1 AS pos,
        |  round(avg(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)), 6) AS c
        |FROM embeddings, range(1, 65) t(i)
        |GROUP BY label, i ORDER BY label, pos""".stripMargin
    // e4_knn_lsh: intentionally no oracle — approximate operator.
  )
}
