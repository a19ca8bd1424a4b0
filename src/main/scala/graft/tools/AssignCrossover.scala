package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** Measure the d12/e14 ASSIGNMENT crossover for real (SCALING.md §5):
  * at what centroid count does the two-level coarse tier
  * ([[IvfIndex.assignTwoLevelCol]], ~2√k·dim per row) actually beat the
  * flat k·dim [[IvfIndex.assign]]? The cost model says "as soon as the
  * when-chain constant is amortized"; this tool replaces the model with
  * measured points.
  *
  * A vectors-only synthetic keeps the measurement honest at sizes the
  * star-schema fixtures never reach: n deterministic pseudo-random
  * vectors (hash-derived — no RNG state, re-runs bit-identical) at
  * `dim` dims, k = ⌈n/512⌉ centroids (d12's own k ∝ n sizing) trained
  * nowhere — centroids are the first k vectors, exactly Lloyd's init,
  * because assignment cost does not care where centroids sit.
  *
  * Usage: runMain graft.tools.AssignCrossover n1[,n2,...] [dim] [mode]
  * mode = both (default) | flat | two — `two` lets the largest points
  * run without the flat baseline (flat is O(n·k) = O(n²/512): at n=16M
  * it costs hours, which is the finding, not a number worth waiting on).
  * Prints one JSON line per point:
  *   {"n":..,"k":..,"g":..,"dim":..,"flat_sec":..,"twolevel_sec":..}
  */
object AssignCrossover {

  def main(args: Array[String]): Unit = {
    val ns = args(0).split(",").map(_.trim.toLong)
    val dim = if (args.length > 1) args(1).toInt else 64
    val mode = if (args.length > 2) args(2) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    ns.foreach { n =>
      // Deterministic synthetic corpus: component i of vector v is a
      // xxhash64-derived value in [-1, 1) — uniform junk is the WORST
      // case for a coarse quantizer (no cluster structure to exploit),
      // so the timing is a conservative bound.
      val emb = spark.range(n).toDF("vec_id")
        .select(col("vec_id"),
          expr(s"""transform(sequence(0, ${dim - 1}),
            | i -> CAST((pmod(xxhash64(vec_id * $dim + i), 2000L) - 1000L)
            |      / 1000.0 AS FLOAT))""".stripMargin).as("embedding"))
        .repartition(cpus.toInt)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      emb.count() // materialize: time assignment, not generation

      val k = math.ceil(n / 512.0).toInt
      val cents: Array[Array[Float]] = emb.orderBy("vec_id").limit(k)
        .collect().map(_.getSeq[Float](1).toArray)
      val (gc, members) = IvfIndex.groupCentroids(cents,
        math.ceil(math.sqrt(k.toDouble)).toInt)

      def time(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      def run(df: org.apache.spark.sql.DataFrame): Double =
        // min of 2, noop sink: the cid column must actually be computed
        (1 to 2).map(_ => time(
          df.select(col("vec_id"), col("cid"))
            .write.format("noop").mode("overwrite").save())).min

      val flat =
        if (mode != "two") run(IvfIndex.assign(emb, cents)) else Double.NaN
      val twoLevel =
        if (mode != "flat") run(emb.withColumn("cid",
          IvfIndex.assignTwoLevelCol(col("embedding"), cents, gc, members)))
        else Double.NaN
      def fmt(v: Double) =
        if (v.isNaN) "null" else (math.rint(v * 1000) / 1000).toString
      println(s"""{"n":$n,"k":$k,"g":${gc.length},"dim":$dim,""" +
        s""""flat_sec":${fmt(flat)},"twolevel_sec":${fmt(twoLevel)}}""")
      emb.unpersist()
    }
    spark.stop()
  }
}
