package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.projection.SignalProjection

/** Deterministic signal-shaped event log derived from the driver's `events`
  * table, so that every reference-parity operator (SURVEY §2.2/§2.3) is
  * checkable against a DuckDB oracle over the very same parquet input.
  *
  * Mapping (mirrored verbatim by [[DerivedSignalLog.SQL_CTE]]):
  *   - seq        := event_id            (log order — Kafka-offset stand-in)
  *   - id         := user_id as string   (the signal key)
  *   - action     := error→deleted, signup→created, else updated
  *   - delete events carry ONLY {action,id} — all other fields null,
  *     exactly like the reference's 2-field delete payload
  *     (control-plane/nexus/core/tests.py:134-139)
  *   - priority   := value<5→Low, value<15→Medium, else High
  *   - author     := "user-" + user_id   (write-time denormalization, Q8)
  *   - created_at/updated_at := ts
  */
object DerivedSignalLog {

  def log(spark: SparkSession, dir: String): DataFrame =
    logWithEventTime(spark, dir).drop("ets")

  /** [[log]] plus `ets` — the ENVELOPE event time (epoch micros of the
    * source `ts`), the Kafka-record-timestamp analog: present for every
    * event INCLUDING deletes, whose 2-field payloads carry no
    * `updated_at`. This is what makes timestamp-LWW (s12) well-defined
    * for tombstones — real CDC wires carry the envelope time even when
    * the payload is bare.
    */
  def logWithEventTime(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    val isDel = col("event_type") === "error"
    val action = when(isDel, "deleted")
      .when(col("event_type") === "signup", "created")
      .otherwise("updated")
    def unlessDel(c: Column): Column = when(isDel, lit(null)).otherwise(c)
    e.select(
      col("event_id").as("seq"),
      unix_micros(col("ts")).as("ets"),
      col("user_id").cast("string").as("id"),
      action.as("action"),
      unlessDel(concat(lit("evt-"), col("event_id").cast("string"))).as("title"),
      unlessDel(col("props")).as("content"),
      unlessDel(
        when(col("value") < 5, "Low")
          .when(col("value") < 15, "Medium")
          .otherwise("High")).as("priority"),
      unlessDel(concat(lit("user-"), col("user_id").cast("string"))).as("author"),
      unlessDel(col("ts")).as("created_at"),
      unlessDel(col("ts")).as("updated_at"))
  }

  /** LWW-folded view, tombstones still visible (operator P3). */
  def view(spark: SparkSession, dir: String): DataFrame =
    SignalProjection.latestByKey(log(spark, dir))

  /** Projected view: fold + tombstone filter (P3+P4) — what the read API
    * serves.
    */
  def signals(spark: SparkSession, dir: String): DataFrame =
    SignalProjection.project(log(spark, dir))

  /** The log derivation as a standalone SELECT (DuckDB). */
  private val LOG_SELECT: String =
    """SELECT event_id AS seq,
      |    CAST(user_id AS VARCHAR) AS id,
      |    CASE WHEN event_type = 'error' THEN 'deleted'
      |         WHEN event_type = 'signup' THEN 'created'
      |         ELSE 'updated' END AS action,
      |    CASE WHEN event_type = 'error' THEN NULL
      |         ELSE 'evt-' || CAST(event_id AS VARCHAR) END AS title,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE props END AS content,
      |    CASE WHEN event_type = 'error' THEN NULL
      |         WHEN value < 5 THEN 'Low'
      |         WHEN value < 15 THEN 'Medium'
      |         ELSE 'High' END AS priority,
      |    CASE WHEN event_type = 'error' THEN NULL
      |         ELSE 'user-' || CAST(user_id AS VARCHAR) END AS author,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE CAST(ts AS TIMESTAMP) END AS created_at,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE CAST(ts AS TIMESTAMP) END AS updated_at
      |  FROM events""".stripMargin

  /** [[LOG_SELECT]] + the envelope event time (epoch micros), mirroring
    * [[logWithEventTime]] — the s12 timestamp-LWW oracle's log source.
    */
  private[graft] val LOG_SELECT_ETS: String =
    """SELECT event_id AS seq,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ets,
      |    CAST(user_id AS VARCHAR) AS id,
      |    CASE WHEN event_type = 'error' THEN 'deleted'
      |         WHEN event_type = 'signup' THEN 'created'
      |         ELSE 'updated' END AS action,
      |    CASE WHEN event_type = 'error' THEN NULL
      |         ELSE 'evt-' || CAST(event_id AS VARCHAR) END AS title,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE props END AS content,
      |    CASE WHEN event_type = 'error' THEN NULL
      |         WHEN value < 5 THEN 'Low'
      |         WHEN value < 15 THEN 'Medium'
      |         ELSE 'High' END AS priority,
      |    CASE WHEN event_type = 'error' THEN NULL
      |         ELSE 'user-' || CAST(user_id AS VARCHAR) END AS author,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE CAST(ts AS TIMESTAMP) END AS created_at,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE CAST(ts AS TIMESTAMP) END AS updated_at
      |  FROM events""".stripMargin

  private def cte(logSources: String): String =
    s"""WITH $logSources,
       |signal_view AS (
       |  SELECT l.* FROM signal_log l
       |  JOIN (SELECT id, max(seq) AS mseq FROM signal_log GROUP BY id) m
       |    ON l.id = m.id AND l.seq = m.mseq),
       |signals AS (SELECT * FROM signal_view WHERE action <> 'deleted')
       |""".stripMargin

  /** DuckDB mirror of [[log]]/[[view]]/[[signals]]. The fold is expressed
    * as a max-seq join-back (equivalent to Spark's `max_by(struct, seq)`
    * because `seq` is unique).
    */
  val SQL_CTE: String = cte(s"signal_log AS (\n  $LOG_SELECT)")

  /** [[SQL_CTE]] with the log RESTRICTED by `pred` — the oracle form for
    * partial replays (as-of / time-travel reads fold only the events the
    * replay had consumed by that point).
    */
  def sqlCteFiltered(pred: String): String =
    cte(s"signal_log AS (\n  SELECT * FROM ($LOG_SELECT) WHERE $pred)")

  /** Same pipeline over the log unioned with itself (idempotency oracle,
    * reference projection/signal_test.go:132-151).
    */
  val SQL_CTE_DOUBLED: String = cte(
    s"""signal_log0 AS (
       |  $LOG_SELECT),
       |signal_log AS (SELECT * FROM signal_log0 UNION ALL SELECT * FROM signal_log0)""".stripMargin)
}
