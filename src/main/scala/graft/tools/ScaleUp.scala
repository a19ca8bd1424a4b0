package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Fixture scaler: writes an sfN-equivalent dataset as `factor`
  * statistically-independent replicas of a source fixture, so the
  * scaling curve (SCALING.md) can be MEASURED instead of argued. The
  * engine itself does the writing — Spark-written parquet, the layout
  * the r9 A/B already showed scans at full speed.
  *
  * Replica construction preserves each table's per-replica statistics
  * while keeping replicas independent of each other — naive duplication
  * would instead make every row a 10-way exact/near dup and turn the
  * dedup-family benchmarks into a qualitatively different (all-clique)
  * workload:
  *
  *   - `events`: ids and user_ids offset per replica (key cardinality
  *     grows linearly, per-user volume constant); timestamps kept, so
  *     the same time window carries `factor`× the event density — the
  *     realistic shape of the same pipeline ingesting more traffic.
  *   - `documents`: doc_ids offset; replica 0 is the original; replicas
  *     k>0 get a deterministic per-doc word shuffle (seeded by (k,
  *     doc_id)) — token/length/unigram/stopword statistics are
  *     preserved (so quality/langid behave identically), while 3-gram
  *     shingles and substrings decorrelate (so each replica contributes
  *     its own planted dup structure: dup DENSITY constant, dup count
  *     linear — the correct scaling shape for d3/d7/d13/d14).
  *   - `embeddings`: vec_ids offset; replica k applies one fixed
  *     dimension permutation to every vector (seeded by k, identity for
  *     k=0) — norms and all intra-replica cosines are preserved exactly
  *     (e-family recall structure intact per replica), cross-replica
  *     cosines decorrelate.
  *   - all other tables copied verbatim (the scale-sensitive families
  *     under measurement don't read them; relational queries stay
  *     comparable at the source scale).
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <factor> [nFiles] [tables]
  * (nFiles > 1 writes each scaled table as a directory of part files —
  * the realistic lake layout; see `write`. The optional comma-separated
  * `tables` filter scales/copies ONLY the named tables — the x10000-class
  * points only exercise one table's queries and the untouched events
  * replica would dominate the write cost 4:1.)
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val (srcDir, dstDir, factor, nFiles, tables) = args match {
      case Array(s, d, f) => (s, d, f.toInt, 1, Tables.all.toSet)
      case Array(s, d, f, n) => (s, d, f.toInt, n.toInt, Tables.all.toSet)
      case Array(s, d, f, n, t) =>
        (s, d, f.toInt, n.toInt, t.split(",").map(_.trim).toSet)
      case _ => sys.error("usage: ScaleUp <srcDir> <dstDir> <factor> [nFiles] [tables]")
    }
    require(factor >= 1, s"factor must be >= 1, got $factor")
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    // A typo'd table name would otherwise be silently ignored and the
    // destination would be missing the intended table while the success
    // line still prints (r12 ADVICE).
    val unknown = tables -- Tables.all.toSet
    require(unknown.isEmpty,
      s"unknown tables: ${unknown.toSeq.sorted.mkString(",")} " +
        s"(known: ${Tables.all.mkString(",")})")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(dstDir))

    writeScaled(spark, srcDir, dstDir, factor, nFiles, tables)

    Tables.all.filter(tables)
      .filterNot(Set("events", "documents", "embeddings")).foreach { t =>
        Files.copy(Paths.get(s"$srcDir/$t.parquet"), Paths.get(s"$dstDir/$t.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }
    println(s"[scaleup] wrote $dstDir at ${factor}x $srcDir")
    spark.stop()
  }

  def writeScaled(spark: SparkSession, srcDir: String, dstDir: String,
      factor: Int, nFiles: Int = 1,
      tables: Set[String] = Set("events", "documents", "embeddings")): Unit = {
    val ks = spark.range(factor).toDF("k")

    // events: offset ids and users per replica, keep the time window
    if (tables("events")) {
    val ev = Tables.raw(spark, srcDir, "events")
    val evN = ev.agg(max("event_id"), max("user_id")).head()
    val (evMax, userMax) = (evN.getLong(0) + 1, evN.getLong(1) + 1)
    write(ev.crossJoin(ks).select(
      (col("event_id") + col("k") * evMax).as("event_id"),
      col("ts"),
      (col("user_id") + col("k") * userMax).as("user_id"),
      col("event_type"), col("value"), col("props")),
      dstDir, "events", nFiles)
    }

    // documents: per-replica deterministic word shuffle (k=0 identity)
    if (tables("documents")) {
    val docs = Tables.raw(spark, srcDir, "documents")
    val docMax = docs.agg(max("doc_id")).head().getLong(0) + 1
    val shuffleWords = udf { (text: String, seed: Long) =>
      if (seed == 0L || text == null) text
      else {
        val ws = text.split(" ", -1)
        val rnd = new scala.util.Random(seed)
        var i = ws.length - 1
        while (i > 0) {
          val j = rnd.nextInt(i + 1)
          val t = ws(i); ws(i) = ws(j); ws(j) = t
          i -= 1
        }
        ws.mkString(" ")
      }
    }
    write(docs.crossJoin(ks).select(
      (col("doc_id") + col("k") * docMax).as("doc_id"),
      shuffleWords(col("text"),
        when(col("k") === 0, 0L).otherwise(col("k") * 1000003L + col("doc_id")))
        .as("text"),
      col("lang"), col("source"), col("n_chars")),
      dstDir, "documents", nFiles)
    }

    // embeddings: per-replica fixed dimension permutation (k=0 identity)
    if (tables("embeddings")) {
    val emb = Tables(spark, srcDir, "embeddings")
    val vecMax = emb.agg(max("vec_id")).head().getLong(0) + 1
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val perms: Array[Array[Int]] = (0 until factor).map { k =>
      if (k == 0) (0 until dim).toArray
      else new scala.util.Random(k * 7919L).shuffle((0 until dim).toList).toArray
    }.toArray
    val bPerms = spark.sparkContext.broadcast(perms)
    val permute = udf { (v: Seq[Float], k: Int) =>
      val p = bPerms.value(k)
      Array.tabulate(p.length)(i => v(p(i)))
    }
    write(emb.crossJoin(ks).select(
      (col("vec_id") + col("k") * vecMax).as("vec_id"),
      permute(col("embedding"), col("k").cast("int")).as("embedding"),
      col("label")),
      dstDir, "embeddings", nFiles)
    }
  }

  /** nFiles == 1: single-file `<name>.parquet`, the driver-fixture
    * layout (note: one file IS one input split whenever it is smaller
    * than `maxPartitionBytes` — SCALING.md §6 finding 1). nFiles > 1:
    * `<name>.parquet` as a DIRECTORY of part files, the realistic lake
    * layout that keeps map parallelism at any split threshold.
    */
  private def write(df: DataFrame, dstDir: String, name: String,
      nFiles: Int): Unit =
    if (nFiles == 1) {
      val staging = s"$dstDir/.staging_$name"
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file under $staging"))
      Files.move(part.toPath, Paths.get(s"$dstDir/$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      new java.io.File(staging).listFiles().foreach(_.delete())
      Files.deleteIfExists(Paths.get(staging))
    } else {
      // Multi-file layout: `<name>.parquet` as a DIRECTORY of nFiles part
      // files — what a real lake table looks like (no one serves 100 TB
      // from one file), and what keeps a map stage's input splits small
      // enough that explode-heavy operators (d14's ~90× window fan-out)
      // don't funnel tens of millions of rows into ONE task's shuffle
      // sorter: SCALING.md §7's x100 finding was a 53 MB single docs file
      // — under the 128 MB maxPartitionBytes default that is ONE split,
      // one task, and a 4 GB heap OOM. repartition(id) keeps the replica
      // blocks interleaved so each file is a uniform sample.
      df.repartition(nFiles).write.mode("overwrite")
        .parquet(s"$dstDir/$name.parquet")
    }
}
