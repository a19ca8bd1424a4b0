package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{CurationPipeline, DedupPack, DerivedSignalLog, MultimodalPack, SamplingPack, SignalParityPack, SimilarityPack, TextPack}
import graft.analytics.{ExtrasPack, RelationalPack}
import graft.projection.SignalStore
import graft.streaming.StreamingPack

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized in [[QueryPack]]s:
  *   - [[SignalParityPack]]  — reference operators P1-P8 / Q1-Q8
  *   - [[RelationalPack]]    — joins/aggs/windows/set-ops/sessionization
  * Every key in `oracleSql` has an exactly-matching DuckDB formulation
  * (column names aligned; money math in DECIMAL for cross-engine equality).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    SignalParityPack,
    RelationalPack,
    ExtrasPack,
    TextPack,
    DedupPack,
    SimilarityPack,
    MultimodalPack,
    SamplingPack,
    CurationPipeline,
    StreamingPack)

  /** Flagship: the reference's `GET /signals` — newest-first top-50 from
    * the LWW-projected materialized view (smoke-checked on sf0.001).
    */
  def entry(spark: SparkSession): DataFrame =
    new SignalStore(DerivedSignalLog.signals(spark, "/root/testdata/sf0.001"))
      .listByCreatedAt(0, 49)

  /** One entry per implemented operator from SURVEY.md §2. A duplicate
    * key across packs would silently shadow a query (Map.++ keeps the
    * last) and the driver would grade the wrong code — fail loudly.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    uniq(packs.flatMap(_.queries), "queries")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    uniq(packs.flatMap(_.oracles), "oracles")

  private def uniq[V](kvs: Seq[(String, V)], what: String): Map[String, V] = {
    val dups = kvs.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate $what keys across packs: ${dups.toSeq.sorted.mkString(", ")}")
    kvs.toMap
  }
}
