package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{ArrayType, DataType, DateType, DoubleType, FloatType, LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver-generated star schema
  * (see TESTDATA.md / FIXTURES.md §4).
  *
  * Scale note: `spark.read.parquet` gives Spark's vectorized columnar
  * reader with predicate pushdown + column pruning; at cluster scale the
  * same call splits into `spark.sql.files.maxPartitionBytes`-sized tasks,
  * so nothing here is local-mode-specific.
  *
  * == Encoding robustness (SCHEMA-DRIVEN) ==
  *
  * A real lake contains parquet written by many writers with every
  * timestamp flavor: INT96, TIMESTAMP(MILLIS/MICROS/NANOS), adjusted-to-UTC
  * ("instant" semantics → Spark TIMESTAMP_LTZ) and naive
  * (isAdjustedToUTC=false → Spark TIMESTAMP_NTZ). The engine must not care
  * which one a given writer chose — the reference applies the same
  * philosophy to its text input, parsing RFC3339 defensively with a
  * 0-fallback (data-plane/internal/projection/signal.go:147-153) so odd
  * encodings degrade instead of failing.
  *
  * Normalization is driven by a TYPE SCAN over the schema the reader
  * actually produced — NOT by a per-table column list — so a fixture
  * regeneration that adds a timestamp/date/vector column to ANY table (or
  * renames one) is normalized with zero code change:
  *
  *   - `TimestampNTZType`   — naive micros/millis. Cast to session-tz
  *     TIMESTAMP; with `spark.sql.session.timeZone=UTC` (every entrypoint
  *     pins it) this is a pure reinterpretation of the same micros value.
  *   - `TimestampType`      — tz-adjusted micros/millis or INT96:
  *     already the normal form, passthrough.
  *   - `DateType`           — midnight-UTC cast, for completeness.
  *   - `ArrayType(DoubleType)` — vector column written with pandas'
  *     float64 default; cast to the canonical `array<float>` the
  *     similarity kernels compile for (vectors never appear in query
  *     OUTPUT columns, so the cast cannot cause an oracle dtype
  *     mismatch — verified over all verify dumps).
  *
  * The ONE encoding a type scan cannot see is TIMESTAMP(NANOS) read via
  * the `spark.sql.legacy.parquet.nanosAsLong` flag: it surfaces as plain
  * `LongType`, indistinguishable from an ordinary int64 id/count column.
  * That carve-out stays an explicit per-table opt-in ([[nanosLongCols]]),
  * and the conversion carries a loud magnitude guard: epoch-NANOS for any
  * plausible date (≥ ~1973) is ≥ 1e17, while epoch-micros (~1e15) and
  * epoch-millis (~1e12) are orders of magnitude smaller — a long whose
  * magnitude is in the ambiguous band fails the query with a clear
  * message instead of silently shrinking 1000×, the exact silent-unit bug
  * class the r8 regression was about.
  *
  * The DuckDB oracles read the same file as naive-UTC
  * (`CAST(ts AS TIMESTAMP)` / `epoch_us`), so all flavors hash identically
  * downstream. EncodingContractSpec pins the write-paths end-to-end,
  * including a no-code-change table and the ambiguous-magnitude failure.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The nanos-as-long carve-out: LongType columns that are
    * TIMESTAMP(NANOS) under the legacy flag. Everything else is found by
    * the type scan in [[apply]].
    */
  private val nanosLongCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  /** Raw read: `ts` keeps whatever type the writer's encoding dictates
    * (LongType under the nanos legacy flag, TIMESTAMP_NTZ for naive
    * micros, TIMESTAMP for tz-adjusted). Streaming reuses this schema so
    * batch and stream agree on the file's physical encoding.
    */
  def raw(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Nanos plausibility floor: 1e17 ns ≈ 1973-03-03. Epoch-micros for the
    * same era is ~1e14 and epoch-millis ~1e11, so a nonzero long below
    * this floor is NOT nanos and must not be divided by 1000.
    */
  private val NanosFloor = 100000000000000000L // 1e17

  /** The normalization expression for one column of a given source type —
    * shared by batch and streaming so the two paths cannot drift.
    *
    * The LongType branch (nanos carve-out) guards against the silent-unit
    * bug: a nonzero value whose magnitude says micros/millis rather than
    * nanos raises instead of shrinking 1000×. 0 is the engine's own
    * unparseable-timestamp fallback (the reference's 0-fallback,
    * signal.go:147-153) and passes through.
    */
  def normalizeTsExpr(c: String, dt: DataType): Column = dt match {
    case LongType => expr(
      s"""CASE WHEN $c IS NULL OR $c = 0 OR abs($c) >= ${NanosFloor}L
         |  THEN timestamp_micros($c div 1000)
         |  ELSE raise_error(concat('column $c: long value ', CAST($c AS STRING),
         |    ' is too small for epoch-nanos (>=1e17 expected); refusing the',
         |    ' silent 1000x shrink — if this column is epoch-micros/millis,',
         |    ' write it as parquet TIMESTAMP(MICROS/MILLIS) instead'))
         |END""".stripMargin)
    case TimestampNTZType  => col(c).cast(TimestampType)
    case TimestampType     => col(c)
    case DateType          => col(c).cast(TimestampType)
    case other => throw new IllegalArgumentException(
      s"column $c: unsupported timestamp encoding $other")
  }

  /** Normalize one timestamp column to session-tz TimestampType. */
  def normalizeTs(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, normalizeTsExpr(c, df.schema(c).dataType))

  /** Normalize one vector column to the canonical `array<float>`. */
  def normalizeVec(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case ArrayType(FloatType, _)  => df
      case ArrayType(DoubleType, _) => df.withColumn(c, col(c).cast(ArrayType(FloatType)))
      case other => throw new IllegalArgumentException(
        s"column $c: unsupported embedding encoding $other")
    }

  /** Fan-out for CPU-dense per-row pipelines over fixture-shaped inputs
    * (r18 optimization; guide §2.5 "input skew: one huge unsplittable
    * file"): the driver fixtures are single-row-group parquet files, so
    * a scan stage is ONE task regardless of session width, and an
    * expensive per-row map chain (JSON decode, shingling, the text
    * canon) serializes on one core while the rest idle. When the scan
    * cannot reach a quarter of the session's parallelism from file
    * splits alone, shuffle the rows once (round-robin — deterministic
    * under sortBeforeRepartition) so the map chain runs at session
    * width; any production-shaped input (many files / row groups) makes
    * this a NO-OP — the condition reads the plan's actual scan split
    * count, never a constant. Applied ONLY where measured (CPU ≫
    * bytes): fanning a cheap map chain loses more to the payload
    * shuffle than the parallelism buys (measured at sf0.1/local[32]:
    * p1-style JSON decode 1.27→0.91 s, the canon front 0.68→0.48 s; a
    * plain tokenize+count REGRESSES 0.24→0.39 s — which is why this is
    * a per-call-site choice, not a [[apply]] default).
    */
  def fanIfSerial(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 4 <= p) df.repartition(p) else df
  }

  /** Load + normalize by TYPE SCAN: every NTZ/Date column → session-UTC
    * timestamp, every `array<double>` → `array<float>`, plus the explicit
    * nanos-as-long carve-out. New columns with odd encodings in ANY table
    * are absorbed with no code change.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = raw(spark, dir, name)
    val nanos = nanosLongCols.getOrElse(name, Nil)
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case TimestampNTZType | DateType          => normalizeTs(acc, f.name)
        case LongType if nanos.contains(f.name)   => normalizeTs(acc, f.name)
        case ArrayType(DoubleType, _)             => normalizeVec(acc, f.name)
        case _                                    => acc
      }
    }
  }
}
