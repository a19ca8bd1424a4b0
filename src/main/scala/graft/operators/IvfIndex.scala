package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) index for ANN search: a k-means coarse quantizer
  * partitions the corpus into clusters; queries probe only the nearest
  * `nprobe` clusters and re-score exactly inside them. This is the
  * standard billion-vector ANN architecture (FAISS-style) expressed in
  * DataFrame ops:
  *
  *   - assignment = crossJoin(broadcast(centroids)) + min_by — the
  *     centroid table is k rows (config-bounded), so broadcast is free and
  *     the corpus streams through map-side with NO shuffle;
  *   - centroid update = posexplode + two-level groupBy — partial
  *     aggregation makes it one small shuffle of k×dim rows;
  *   - the driver-side collect per iteration is k centroids (k×dim
  *     floats, config-bounded, scale-independent) — the same reduce
  *     MLlib's KMeans does; it also truncates plan lineage across
  *     iterations.
  *
  * Determinism: init = first k vectors by id; min_by ties broken by
  * (distance, cid) struct ordering.
  */
object IvfIndex {

  private def dbl(c: Column): Column = c.cast("double")

  /** Squared euclidean distance between two float-array columns. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (dbl(x) - dbl(y)) * (dbl(x) - dbl(y))),
      lit(0.0), (acc, v) => acc + v)

  /** Lloyd's k-means over an `(vec_id, embedding)` frame → `(cid,
    * centroid)` table.
    */
  def kmeans(spark: SparkSession, emb: DataFrame, k: Int, iters: Int): DataFrame = {
    var centroids = emb.where(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assign(emb, centroids)
      val next = assigned
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos")).agg(avg(dbl(col("v"))).as("c"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
        .select(col("cid"),
          transform(col("pc"), x => x.getField("c").cast("float")).as("centroid"))
      // k rows to the driver: bounded by k, not by data — lineage reset.
      val rows = next.collect()
      centroids = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1), next.schema)
    }
    centroids
  }

  /** Assign every vector to its nearest centroid (deterministic ties). */
  def assign(emb: DataFrame, centroids: DataFrame): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .withColumn("_d", sqDist(col("embedding"), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(
        min_by(col("cid"), struct(col("_d"), col("cid"))).as("cid"),
        any_value(col("embedding")).as("embedding"))
}
