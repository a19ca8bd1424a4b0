package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.{SparkEntry, SparkSuite, Tables}

/** The ingestion encoding contract: `events.ts` must be accepted in every
  * timestamp flavor a real lake contains — int64 nanos (read as long via
  * the legacy flag), naive TIMESTAMP(MICROS) (Spark TIMESTAMP_NTZ),
  * UTC-adjusted TIMESTAMP(MICROS) (Spark TIMESTAMP), and INT96 — and every
  * flavor must produce BIT-IDENTICAL query results. This is the
  * reference's defensive-parse philosophy
  * (data-plane/internal/projection/signal.go:147-153: RFC3339 parse with
  * 0-fallback so odd inputs degrade instead of failing) applied to
  * parquet.
  *
  * Round-8 regression this pins: the driver regenerated fixtures from
  * TIMESTAMP(NANOS) to naive TIMESTAMP(MICROS); a LongType-only shim let
  * NTZ pass through un-normalized (24 queries crashed at analysis) and the
  * streaming reader's hardcoded nanos divisor shrank every timestamp
  * 1000× (3 silent wrong answers). This spec fails if either fix is
  * reverted: the NTZ variant crashes `unix_micros(ts)` under the old
  * Tables, and the long-nanos variant breaks s2's window count under a
  * unit-blind eventsStream.
  */
class EncodingContractSpec extends SparkSuite {

  private val srcDir = "/root/testdata/sf0.001"

  /** Write as a single FILE named events.parquet (like the driver fixture)
    * — the streaming source's pathGlobFilter matches file names, so a
    * directory-shaped events.parquet would stream zero rows.
    */
  private def writeVariant(df: DataFrame, dir: String): Unit = {
    val staging = s"$dir/.staging"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file written under $staging"))
    Files.createDirectories(java.nio.file.Paths.get(dir))
    Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    new java.io.File(staging).listFiles().foreach(_.delete())
    Files.deleteIfExists(java.nio.file.Paths.get(staging))
  }

  /** tmp dirs, one per encoding, each holding just events.parquet. */
  private lazy val variants: Map[String, String] = {
    val base = Tables(spark, srcDir, "events")  // normalized: ts is LTZ micros
    val root = Files.createTempDirectory("graft-enc-").toFile.getAbsolutePath

    // int64 nanos-as-long: what TIMESTAMP(NANOS) reads back as under
    // spark.sql.legacy.parquet.nanosAsLong (Spark cannot WRITE nanos, so
    // the raw-long column reproduces the read-side type exactly).
    writeVariant(
      base.withColumn("ts", expr("unix_micros(ts) * 1000L")),
      s"$root/nanos_long")

    // naive micros → parquet TIMESTAMP(isAdjustedToUTC=false, MICROS),
    // reads back TIMESTAMP_NTZ. Session tz is UTC, so the NTZ wall-clock
    // carries the same micros value.
    writeVariant(
      base.withColumn("ts", col("ts").cast(TimestampNTZType)),
      s"$root/micros_ntz")

    // UTC-adjusted micros → TIMESTAMP(isAdjustedToUTC=true, MICROS),
    // reads back TIMESTAMP (LTZ): the normal form, passthrough branch.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    writeVariant(base, s"$root/micros_utc")

    // INT96: the legacy Hive/Impala encoding still common in old lakes.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    writeVariant(base, s"$root/int96")
    spark.conf.unset("spark.sql.parquet.outputTimestampType")

    Map(
      "nanos_long" -> s"$root/nanos_long",
      "micros_ntz" -> s"$root/micros_ntz",
      "micros_utc" -> s"$root/micros_utc",
      "int96"      -> s"$root/int96")
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("Tables normalizes every encoding to the same TimestampType frame") {
    val frames = variants.map { case (enc, dir) =>
      val t = Tables(spark, dir, "events")
      assert(t.schema("ts").dataType === TimestampType,
        s"$enc: ts must normalize to TIMESTAMP, got ${t.schema("ts").dataType}")
      enc -> canon(t.select("event_id", "ts", "user_id", "event_type", "value"))
    }
    val baseline = frames("micros_utc")
    frames.foreach { case (enc, rows) =>
      assert(rows === baseline, s"$enc: normalized rows differ from micros_utc")
    }
  }

  test("normalized ts has the LTZ external type (java.sql.Timestamp) under every encoding") {
    // The r8 NTZ passthrough crashed typed-row consumers with
    // `java.time.LocalDateTime cannot be cast to java.sql.Timestamp`
    // (s5/s8) — schema equality alone does not pin the EXTERNAL type
    // Row.get hands back, so assert it directly on every flavor.
    variants.foreach { case (enc, dir) =>
      val v = Tables(spark, dir, "events")
        .select("ts").na.drop().head().get(0)
      assert(v.isInstanceOf[java.sql.Timestamp],
        s"$enc: external ts type is ${v.getClass.getName}, not java.sql.Timestamp")
    }
  }

  test("batch queries are encoding-invariant (a12 window, q1 top-k)") {
    for (q <- Seq("a12_tumbling_window", "q1_topk_by_time")) {
      val fn = SparkEntry.queries(q)
      val expect = canon(fn(spark, srcDir))
      assert(expect.nonEmpty, s"$q: baseline produced no rows")
      variants.foreach { case (enc, dir) =>
        assert(canon(fn(spark, dir)) === expect, s"$q over $enc encoding")
      }
    }
  }

  test("embedding element type is normalized: float64 file, identical ANN results") {
    // Same insurance as ts, for vectors: a pandas-float64 regeneration
    // flips embedding to array<double>; Tables must hand the kernels the
    // canonical array<float>. Values here are widened f32 → f64, so the
    // truncation back is lossless and results must be BIT-identical.
    val root = Files.createTempDirectory("graft-encv-").toFile.getAbsolutePath
    val base = Tables(spark, srcDir, "embeddings")
    assert(base.schema("embedding").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true))
    base.withColumn("embedding",
        col("embedding").cast("array<double>"))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/stage")
    val part = new java.io.File(s"$root/stage").listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.move(part.toPath, java.nio.file.Paths.get(s"$root/embeddings.parquet"))

    val norm = Tables(spark, root, "embeddings")
    assert(norm.schema("embedding").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true))
    for (q <- Seq("e1_knn_brute", "e5_ivf_knn")) {
      val fn = SparkEntry.queries(q)
      val expect = canon(fn(spark, srcDir))
      assert(expect.nonEmpty, s"$q: baseline produced no rows")
      assert(canon(fn(spark, root)) === expect, s"$q over float64-encoded embeddings")
    }
  }

  test("type scan absorbs odd encodings on NEW columns of ANY table with no code change") {
    // The r8 failure mode, generalized: normalization used to be a
    // per-table column map ("events" -> "ts"), so a regeneration that
    // added a timestamp or vector column to ANOTHER table bypassed it
    // entirely. Now normalization is a schema type scan — a documents
    // table that grows an NTZ timestamp AND a float64 vector column (a
    // table/columns Tables has never heard of) must come back normalized.
    val root = Files.createTempDirectory("graft-encg-").toFile.getAbsolutePath
    val docs = Tables(spark, srcDir, "documents")
      .withColumn("crawled_at",
        expr("timestamp_micros(doc_id * 1000000L)").cast(TimestampNTZType))
      .withColumn("doc_vec",
        array(col("doc_id").cast("double"), (col("doc_id") * 2).cast("double")))
    writeVariant(docs, root) // writes $root/events.parquet — rename below
    Files.move(java.nio.file.Paths.get(s"$root/events.parquet"),
      java.nio.file.Paths.get(s"$root/documents.parquet"))

    val norm = Tables(spark, root, "documents")
    assert(norm.schema("crawled_at").dataType === TimestampType,
      "new NTZ column on a non-events table must normalize to TIMESTAMP")
    assert(norm.schema("doc_vec").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true),
      "new float64 vector column must normalize to array<float>")
    // and the values are the same instants / same numbers
    val row = norm.where(col("doc_id") === 7)
      .select(expr("unix_micros(crawled_at)"), col("doc_vec")).head()
    assert(row.getLong(0) === 7000000L)
    assert(row.getSeq[Float](1) === Seq(7.0f, 14.0f))
  }

  test("ambiguous long magnitude fails loudly instead of silently shrinking 1000x") {
    // A raw int64 epoch-MICROS column (~1e15 for modern dates) reads back
    // as LongType exactly like TIMESTAMP(NANOS) under the legacy flag; a
    // unit-blind `div 1000` would silently shrink it 1000× — the r8 bug
    // class. The nanos carve-out refuses values below the 1e17 nanos
    // plausibility floor.
    val root = Files.createTempDirectory("graft-encm-").toFile.getAbsolutePath
    val base = Tables(spark, srcDir, "events")
    writeVariant(
      base.withColumn("ts", expr("unix_micros(ts)")), // micros-as-long: ambiguous
      s"$root/micros_long")
    val e = intercept[Exception] {
      Tables(spark, s"$root/micros_long", "events").select("ts").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("too small for epoch-nanos")),
      s"expected the magnitude-guard message, got: ${messages(e).mkString(" | ")}")
    // the 0-fallback (reference signal.go:147-153) still passes through
    val zeros = base.withColumn("ts", lit(0L))
    writeVariant(zeros, s"$root/zeros")
    val z = Tables(spark, s"$root/zeros", "events").select("ts").na.drop().head()
    assert(z.getTimestamp(0).getTime === 0L)
  }

  test("streaming window (s2) is encoding-invariant") {
    // The streaming reader takes an explicit schema, so it is the most
    // encoding-fragile path — pin the two flavors that differ physically
    // (int64-nanos vs micros-NTZ) against the batch truth.
    val fn = SparkEntry.queries("s2_stream_window")
    val expect = canon(fn(spark, srcDir))
    assert(expect.nonEmpty, "s2 baseline produced no rows")
    for (enc <- Seq("nanos_long", "micros_ntz")) {
      assert(canon(fn(spark, variants(enc))) === expect, s"s2 over $enc encoding")
    }
  }
}
