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
  * == Timestamp-encoding robustness ==
  *
  * A real lake contains parquet written by many writers with every
  * timestamp flavor: INT96, TIMESTAMP(MILLIS/MICROS/NANOS), adjusted-to-UTC
  * ("instant" semantics → Spark TIMESTAMP_LTZ) and naive
  * (isAdjustedToUTC=false → Spark TIMESTAMP_NTZ), plus raw int64 epoch
  * columns. The engine must not care which one a given writer chose — the
  * reference applies the same philosophy to its text input, parsing
  * RFC3339 defensively with a 0-fallback
  * (data-plane/internal/projection/signal.go:147-153) so odd encodings
  * degrade instead of failing.
  *
  * So normalization here dispatches on the type the reader actually
  * produced, not on an assumed encoding:
  *
  *   - `LongType`           — TIMESTAMP(NANOS) read via the
  *     `spark.sql.legacy.parquet.nanosAsLong` flag (Spark's vectorized
  *     reader otherwise rejects nanos). Truncate to micros with exact
  *     integer division (`div 1000` — a double roundtrip would lose
  *     precision above 2^53).
  *   - `TimestampNTZType`   — naive micros/millis. Cast to session-tz
  *     TIMESTAMP; with `spark.sql.session.timeZone=UTC` (every entrypoint
  *     pins it) this is a pure reinterpretation of the same micros value.
  *   - `TimestampType`      — tz-adjusted micros/millis or INT96:
  *     already the normal form, passthrough.
  *   - `DateType`           — midnight-UTC cast, for completeness.
  *
  * The DuckDB oracles read the same file as naive-UTC
  * (`CAST(ts AS TIMESTAMP)` / `epoch_us`), so all flavors hash identically
  * downstream. EncodingContractSpec pins all three write-paths end-to-end.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Timestamp columns to normalize, per table. */
  private val tsCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  /** Raw read: `ts` keeps whatever type the writer's encoding dictates
    * (LongType under the nanos legacy flag, TIMESTAMP_NTZ for naive
    * micros, TIMESTAMP for tz-adjusted). Streaming reuses this schema so
    * batch and stream agree on the file's physical encoding.
    */
  def raw(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** The normalization expression for one column of a given source type —
    * shared by batch and streaming so the two paths cannot drift.
    */
  def normalizeTsExpr(c: String, dt: DataType): Column = dt match {
    case LongType          => expr(s"timestamp_micros($c div 1000)")
    case TimestampNTZType  => col(c).cast(TimestampType)
    case TimestampType     => col(c)
    case DateType          => col(c).cast(TimestampType)
    case other => throw new IllegalArgumentException(
      s"column $c: unsupported timestamp encoding $other")
  }

  /** Normalize one timestamp column to session-tz TimestampType. */
  def normalizeTs(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, normalizeTsExpr(c, df.schema(c).dataType))

  /** Embedding columns to normalize, per table — same insurance as ts but
    * for the vector element type. The fixture stores float32 today; a
    * regeneration with pandas' float64 default would flip the column to
    * `array<double>` and every similarity kernel bound to
    * `ArrayType(FloatType)` would crash at analysis, exactly like the r8
    * ts flip. Canonical internal type is float32 (what the kernels
    * compile for; vectors never appear in query OUTPUT columns, so the
    * cast cannot cause an oracle dtype mismatch — verified over all 137
    * verify dumps).
    */
  private val vecCols: Map[String, Seq[String]] = Map("embeddings" -> Seq("embedding"))

  /** Normalize one vector column to `array<float>`. */
  def normalizeVec(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case ArrayType(FloatType, _)  => df
      case ArrayType(DoubleType, _) => df.withColumn(c, col(c).cast(ArrayType(FloatType)))
      case other => throw new IllegalArgumentException(
        s"column $c: unsupported embedding encoding $other")
    }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val withTs = tsCols.getOrElse(name, Nil).foldLeft(raw(spark, dir, name))(normalizeTs)
    vecCols.getOrElse(name, Nil).foldLeft(withTs)(normalizeVec)
  }
}
