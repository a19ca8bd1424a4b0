package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver-generated star schema
  * (see TESTDATA.md / FIXTURES.md §4).
  *
  * Scale note: `spark.read.parquet` gives Spark's vectorized columnar
  * reader with predicate pushdown + column pruning; at cluster scale the
  * same call splits into `spark.sql.files.maxPartitionBytes`-sized tasks,
  * so nothing here is local-mode-specific.
  *
  * Nanosecond timestamps: `events.ts` is parquet TIMESTAMP(NANOS), which
  * Spark's reader rejects. We read it as raw nanos
  * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to micros
  * (`ts div 1000` — exact integer division; a double roundtrip would lose
  * precision above 2^53). Oracle SQL mirrors this with
  * `CAST(ts AS TIMESTAMP)` (TIMESTAMP_NS → micros truncation in DuckDB).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val nanoCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    nanoCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType == LongType)
        d.withColumn(c, expr(s"timestamp_micros($c div 1000)"))
      else d
    }
  }
}
