package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.nearest_centroid

/** IVF (inverted-file) index for ANN search: a k-means coarse quantizer
  * partitions the corpus into clusters; queries probe only the nearest
  * `nprobe` clusters and re-score exactly inside them. This is the
  * standard billion-vector ANN architecture (FAISS-style) expressed in
  * DataFrame ops:
  *
  *   - assignment = the codegen'd [[graft.functions.NearestCentroid]]
  *     projection over a centroid-array literal — ZERO shuffle, zero row
  *     multiplication, a compiled k×dim loop fused into the scan. (The
  *     naive crossJoin(broadcast)+min_by formulation multiplies rows ×k
  *     and shuffles the whole corpus per iteration — r1 shipped that and
  *     its comment wrongly claimed otherwise; fixed in r2.)
  *   - centroid update = posexplode + groupBy(cid, pos) — partial
  *     aggregation means the shuffle carries ≤ k×dim rows per map task;
  *   - centroids live on the driver between iterations (k×dim floats,
  *     config-bounded, scale-independent — the same reduce MLlib's KMeans
  *     does), which also truncates plan lineage across iterations.
  *
  * Determinism: init = first k vectors by vec_id; argmin ties resolve to
  * the lowest centroid index; empty clusters keep their previous centroid.
  */
object IvfIndex {

  private def dbl(c: Column): Column = c.cast("double")

  /** The centroid table as an `ARRAY<ARRAY<FLOAT>>` literal column —
    * cluster id = array index.
    */
  def centroidsLit(centroids: Array[Array[Float]]): Column =
    typedLit(centroids.map(_.toSeq).toSeq)

  /** Driver-side squared euclidean distance (for probe selection — the
    * centroid table is driver-resident and tiny).
    */
  def sqDistLocal(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val t = a(i).toDouble - b(i).toDouble; d += t * t; i += 1 }
    d
  }

  /** The `nprobe` cluster ids nearest to a query vector (deterministic:
    * distance then index).
    */
  def probeCids(centroids: Array[Array[Float]], q: Array[Float], nprobe: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (c, i) => (sqDistLocal(c, q), i) }
      .sorted.take(nprobe).map(_._2).toSeq

  /** Lloyd's k-means over a `(vec_id, embedding)` frame. Returns the
    * centroid table as a driver-side array (cid = index).
    */
  def kmeans(spark: SparkSession, emb: DataFrame, k: Int, iters: Int): Array[Array[Float]] = {
    // init = the k most-senior vectors (TakeOrdered, no full sort). On a
    // dense-id frame this is exactly the `vec_id < k` prefix the e10
    // oracle replays; on a sampled frame (semAssign's bounded train set)
    // it is the sample's seniority prefix — deterministic either way.
    var centroids: Array[Array[Float]] = emb
      .orderBy("vec_id").select("embedding").limit(k)
      .collect().map(_.getSeq[Float](0).toArray)
    for (_ <- 0 until iters) {
      // One job per iteration: compiled assignment projection (no
      // shuffle), then a (cid, pos) mean whose shuffle is ≤ k×dim rows
      // per map task after partial agg. k×dim rows back to the driver.
      // The mean is e10's fixed-point form — each value quantizes to
      // integer micro-units BEFORE the cross-partition sum, so the
      // trained centroids are bit-identical at any partitioning (a bare
      // avg(double) depends on partial-aggregation merge order in ulps;
      // the .toFloat usually absorbs that, but "usually" is not the
      // discipline the rest of the engine holds itself to).
      val sums = assign(emb, centroids)
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(round(dbl(col("v")) * 1000000, 0).cast("long")).as("sq"),
          count(lit(1)).as("cnt"))
        .select(col("cid"), col("pos"),
          (col("sq").cast("double") / (col("cnt") * 1000000L).cast("double")).as("c"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat
      }
      centroids = next
    }
    centroids
  }

  /** Assign every vector to its nearest centroid — a pure projection.
    * The assignment is wrapped in [[graft.functions.eval_once]] (r18,
    * guide §4.4): consumers join/filter on `cid`, and the optimizer's
    * inferred predicates (`isnotnull(cid)`, join-key constraints)
    * otherwise push below this projection carrying a CLONE of the whole
    * k-way argmin — every corpus row paid the assignment twice (e24's
    * plan showed 4 evaluations per side). The inferred filters now sit
    * above the projection on the attribute, which costs nothing.
    */
  def assign(emb: DataFrame, centroids: Array[Array[Float]]): DataFrame =
    emb.withColumn("cid", graft.functions.eval_once(
      nearest_centroid(col("embedding"), centroidsLit(centroids))))

  private val servingLock = new Object
  private val servingRoot =
    s"${sys.props("java.io.tmpdir")}/graft-ivf-serving"

  /** Inverted-list SERVING layout (the FAISS list layout as a lake
    * layout): one cid-partitioned copy of the corpus, written ONCE per
    * (fixture contents, centroid set) and reused by every probe query.
    * e5/e17 serve from it, so their `cid IN (probes)` predicate becomes a
    * directory-level PartitionFilter — the scan READS ~nprobe/k of the
    * corpus from disk instead of scanning everything and filtering
    * post-assignment (PartitionPruningSpec pins the mechanism; PlanSpec
    * pins it on e5's actual serving plan; SCALING.md §6 carries the x30
    * A/B). At 100 TB this is the whole point of IVF: the index layout
    * turns nprobe selectivity into I/O savings, not just compute savings.
    *
    * Staleness is CONTENT-KEYED: the cache key folds every source file's
    * (path, length, mtime) with the centroid constants and a layout
    * version, so a regenerated fixture or retrained quantizer rebuilds
    * instead of serving stale assignments — the silent-wrong-answer mode
    * a path-keyed cache would have.
    *
    * In production this copy is the INDEX BUILD step — written by the
    * ingest pipeline when vectors land, amortized over every query that
    * follows; the lazy first-call build here keeps the library's
    * (spark, dir) query contract for the correctness/bench harness.
    */
  def servingCopy(spark: SparkSession, dir: String): DataFrame =
    contentKeyedCopy(spark, dir, "layout-v1",
      Pretrained.iterator.flatMap(_.iterator).map(java.lang.Float.toString)) {
      tmp =>
        assign(graft.Tables(spark, dir, "embeddings"), Pretrained)
          .write.partitionBy("cid").mode("overwrite").parquet(tmp)
    }

  /** Sign-code SERVING copy (the e20 "written at ingest" tier): one
    * `(vec_id, code)` parquet copy of the corpus where `code` is the
    * packed [[graft.functions.SignBits]] sign bitmap — 1 bit per
    * dimension, 32× narrower than the float32 embedding. The binary-
    * quantization shortlist pass (e20) scans THIS copy, so its xor+
    * popcount kernel reads 1/32nd of the embedding bytes from disk — an
    * I/O tier, not just a compute trick. Same content-keyed atomic
    * publish as [[servingCopy]]: the key folds every source file plus a
    * layout tag, so a regenerated fixture rebuilds instead of serving
    * stale codes. In production this copy is written by the ingest
    * pipeline next to the vectors, amortized over every query.
    */
  def signCodeCopy(spark: SparkSession, dir: String): DataFrame =
    contentKeyedCopy(spark, dir, "bq-codes-v1", Nil) { tmp =>
      graft.Tables(spark, dir, "embeddings")
        .select(col("vec_id"), graft.functions.sign_bits(col("embedding")).as("code"))
        .write.mode("overwrite").parquet(tmp)
    }

  /** Content-keyed, atomically-published derived copy of the embeddings
    * table. The fingerprint folds `layoutTag`, every source file's
    * (name, length, mtime), and `extraKey` (e.g. the centroid constants)
    * so staleness is impossible by construction; publication is
    * build-in-tmp + rename with the cross-JVM races handled below.
    */
  private def contentKeyedCopy(spark: SparkSession, dir: String,
      layoutTag: String, extraKey: IterableOnce[String])(
      build: String => Unit): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
    val srcFs = src.getFileSystem(hconf)
    val md = java.security.MessageDigest.getInstance("SHA-1")
    def fold(s: String): Unit =
      md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    fold(layoutTag)
    fold(src.toString)
    val it = srcFs.listFiles(src, true)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      entries += s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}"
    }
    entries.sorted.foreach(fold)
    extraKey.iterator.foreach(fold)
    val fp = md.digest().map("%02x".format(_)).mkString
    val dest = new org.apache.hadoop.fs.Path(s"$servingRoot/$fp")
    val destFs = dest.getFileSystem(hconf)
    servingLock.synchronized {
      if (!destFs.exists(new org.apache.hadoop.fs.Path(dest, "_SUCCESS"))) {
        // Publish ATOMICALLY: build in a private tmp dir, rename into
        // place. The lock only serializes THIS JVM — a concurrent bench
        // and test suite share servingRoot, and writing `dest` directly
        // (the pre-round-11 code) let one JVM list the other's
        // half-written overwrite: silently wrong k-NN, the exact failure
        // the content-keyed cache exists to prevent. rename() refuses an
        // existing dest, so whichever JVM lands second just discards its
        // build and reads the winner's (bit-identical by construction —
        // same fingerprint = same inputs + same deterministic assign).
        val tmp = new org.apache.hadoop.fs.Path(
          s"$servingRoot/.tmp-$fp-${java.util.UUID.randomUUID}")
        build(tmp.toString)
        // Cross-JVM race: check for an existing winner BEFORE renaming —
        // RawLocalFileSystem's rename falls back to FileUtil.copy when
        // File.renameTo fails against an existing dest, which would COPY
        // tmp INTO dest (as dest/.tmp-*) and return true, leaking the
        // losing build nested where the top-level .tmp-* sweep can't see
        // it. Then re-check after: if tmp still exists for any reason
        // (lost the window between the check and the rename), delete it
        // unconditionally — the winner's copy is bit-identical.
        if (destFs.exists(dest) || !destFs.rename(tmp, dest)) destFs.delete(tmp, true)
        if (destFs.exists(tmp)) destFs.delete(tmp, true)
        // residual window: if the other JVM renamed between our exists()
        // and rename(), the copy-fallback may have nested our build as
        // dest/.tmp-* (deleting tmp itself) — sweep any such nested dirs
        destFs.listStatus(dest)
          .filter(_.getPath.getName.startsWith(".tmp-"))
          .foreach(s => destFs.delete(s.getPath, true))
        // sweep abandoned build dirs (a crashed JVM's .tmp-*): anything
        // older than an hour can't belong to a live build. Published
        // fingerprint dirs are NOT swept — another JVM may be serving an
        // older fixture's fp right now, and in production this copy is
        // the ingest-owned index build whose retention is a deliberate
        // operational policy, not a cache eviction.
        val cutoff = System.currentTimeMillis() - 3600L * 1000
        destFs.listStatus(new org.apache.hadoop.fs.Path(servingRoot))
          .filter(s => s.getPath.getName.startsWith(".tmp-")
            && s.getModificationTime < cutoff)
          .foreach(s => destFs.delete(s.getPath, true))
      }
    }
    spark.read.parquet(dest.toString)
  }

  /** Two-level coarse quantization (FAISS IMI / IVF-tree shape): cluster
    * the CENTROID TABLE into g groups driver-side, assign a vector by
    * nearest group then nearest member centroid within that group —
    * ~(g + k/g)·dim work per vector instead of k·dim, the flat-assignment
    * fix SCALING.md §5 names for k beyond ~32 k centroids. Pure Scala
    * k-means over k×dim floats (k is config-bounded — never corpus data),
    * deterministic: init = first g centroids, (distance, lowest-index)
    * argmin ties, empty groups dropped with stable reindexing.
    * Returns (groupCentroids, members) where members(g) lists the GLOBAL
    * centroid ids of group g in ascending order.
    */
  def groupCentroids(centroids: Array[Array[Float]], g: Int,
      iters: Int = 3): (Array[Array[Float]], Array[Array[Int]]) = {
    require(g >= 1 && g <= centroids.length, s"g=$g out of range")
    val dim = centroids.head.length
    var gc: Array[Array[Float]] = centroids.take(g).map(_.clone())
    def assignAll(): Array[Int] = centroids.map { c =>
      var best = 0; var bestD = Double.PositiveInfinity
      var i = 0
      while (i < gc.length) {
        val d = sqDistLocal(c, gc(i))
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      best
    }
    for (_ <- 0 until iters) {
      val asg = assignAll()
      gc = gc.indices.map { gi =>
        val mine = asg.zipWithIndex.collect { case (`gi`, ci) => centroids(ci) }
        if (mine.isEmpty) gc(gi)
        else Array.tabulate(dim)(d => (mine.map(_(d).toDouble).sum / mine.length).toFloat)
      }.toArray
    }
    val fin = assignAll()
    val keep = gc.indices.filter(gi => fin.contains(gi))
    (keep.map(gc).toArray,
      keep.map(gi => fin.zipWithIndex.collect { case (`gi`, ci) => ci }.sorted.toArray).toArray)
  }

  /** The two-level assignment as a compiled column over `vec`: nearest
    * group, then nearest member within the chosen group, mapped back to
    * the GLOBAL centroid id — one [[graft.functions.NearestCentroidTwoLevel]]
    * kernel call per row. Member lists ascend, so the lowest-index tie
    * rule composes to lowest-global-cid — the rule the oracles replay.
    * Approximation contract: differs from flat [[assign]] exactly when a
    * vector's nearest centroid lies outside its nearest group (the IMI
    * trade; e14's RecallSpec gate measures the cost).
    *
    * Until round 11 this was a g-branch `when` chain; the AssignCrossover
    * measurement caught the chain super-linear (281 s at n=4M/g=89 vs the
    * cost model's ~115 s — expression-tree size grows with g, and past
    * codegen's limits the repeated group-argmin subexpression stops being
    * eliminated). The kernel is constant-size generated code at any g;
    * see the expression's scaladoc for the measured before/after.
    */
  def assignTwoLevelCol(vec: Column, centroids: Array[Array[Float]],
      groupCents: Array[Array[Float]], members: Array[Array[Int]]): Column = {
    import org.apache.spark.sql.functions.typedLit
    // eval_once: same §4.4 rationale as [[assign]] — e14 filters the
    // assignment with `isin(probes)`, which otherwise clones the
    // two-level kernel below the projection (measured: 2 evaluations
    // per corpus row in e14's plan).
    graft.functions.eval_once(graft.functions.nearest_centroid_two_level(
      vec,
      centroidsLit(groupCents),
      typedLit(members.map(_.map(centroids).map(_.toSeq).toSeq).toSeq),
      typedLit(members.map(_.toSeq).toSeq)))
  }

  /** Pretrained coarse quantizer ([[kmeans]] k=16, iters=3 on the sf0.01
    * embeddings sample) — train once on a bounded sample, serve at any
    * scale, exactly like [[PqIndex.Pretrained]]. Serving from constants
    * keeps query time free of training jobs AND makes the probe query a
    * deterministic function of the corpus, so it is hash-checked against
    * a DuckDB oracle that replays the same constants.
    */
  val Pretrained: Array[Array[Float]] = IvfPretrainedData.centroids

  /** Render a centroid table as the Scala source for IvfPretrainedData. */
  def scalaSource(centroids: Array[Array[Float]]): String =
    centroids.map(c =>
      "    Array(" + c.map(v => v.toString + "f").mkString(", ") + ")")
      .mkString(",\n")

  /** DuckDB SQL fragment: the list of SQUARED distances from a DOUBLE[]
    * expression `e` to every centroid — the IDENTICAL values the compiled
    * kernels compute ([[graft.functions.NearestCentroid]]/[[graft.functions.NearestCentroids]]:
    * left-to-right double accumulation of `(a-b)*(a-b)`), so both engines
    * rank the same bits and tie resolution cannot diverge. Name it once in
    * a CTE, then `list_position(d, list_min(d)) - 1` is the 0-based
    * assignment — first minimum, the kernels' lowest-index tie rule.
    *
    * Replayed bit-exactly (r13 ADVICE: the earlier `list_distance` form
    * was only argmin-monotone — a correctly-rounded sqrt can collapse
    * distinct squared distances into a tie). Three measured DuckDB
    * pitfalls this form avoids: bare numeric literals parse as
    * DECIMAL→DOUBLE (off by 1 ulp — string CAST is correctly rounded);
    * `list_sum` accumulates SIMD/pairwise, not sequentially
    * (`list_reduce` is sequential by contract); and the fold seeds with
    * `0.0` exactly like the kernels' accumulator.
    */
  def distListSql(centroids: Array[Array[Float]], e: String): String =
    centroids.map { c =>
      val lit = c.map(v => s"'${v.toDouble.toString}'").mkString(", ")
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(
         |        list_zip($e, CAST([$lit] AS DOUBLE[])),
         |        s -> (s[1] - s[2]) * (s[1] - s[2]))), (acc, x) -> acc + x)""".stripMargin
    }.mkString("[\n      ", ",\n      ", "\n    ]")
}
