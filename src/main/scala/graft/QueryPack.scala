package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries. Each query has a Spark
  * implementation and, where SQL-expressible, a DuckDB oracle over the same
  * parquet tables (table name = file basename). Column names/aliases MUST
  * match between the two — the driver sorts columns by name before hashing.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** Subset of `queries` keys that have an exact ANSI-SQL oracle. */
  def oracles: Map[String, String]
}
