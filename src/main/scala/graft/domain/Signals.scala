package graft.domain

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Write-model event for the signal domain.
  *
  * Mirrors the reference's JSON event on topic `nexus.signals`
  * (data-plane/internal/domain/signal.go:15-24; producer payload
  * control-plane/nexus/core/signals.py:37-55). Delete events carry only
  * `{action, id}` (signals.py:83-86), hence every other field is optional.
  */
case class SignalEvent(
    action: String,
    id: String,
    title: Option[String] = None,
    content: Option[String] = None,
    priority: Option[String] = None,
    author: Option[String] = None,
    created_at: Option[String] = None,
    updated_at: Option[String] = None)

/** Read-model record served by the query API — all strings, like the
  * reference's Redis-hash-backed view (domain/signal.go:47-55). The engine
  * keeps typed columns internally and renders strings at the edge.
  */
case class Signal(
    id: String,
    title: String,
    content: String,
    priority: String,
    author: String,
    created_at: String,
    updated_at: String)

object SignalSchema {
  val Created = "created"
  val Updated = "updated"
  val Deleted = "deleted"
  val actions: Seq[String] = Seq(Created, Updated, Deleted)

  /** Flat event schema; `from_json` in PERMISSIVE mode reproduces the
    * reference's tolerance exactly: unknown JSON fields are dropped,
    * missing fields become null (domain/signal_test.go:71-82,
    * data-plane/README.md:166).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("action", StringType),
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("content", StringType),
    StructField("priority", StringType),
    StructField("author", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType)))
}

/** Priority label <-> score codec.
  *
  * Reference: projection score map {Low:1, Medium:2, High:3}, unknown -> 0
  * (data-plane/internal/projection/signal.go:21-25); inverse display map in
  * the control plane (control-plane/nexus/core/models.py:16-19).
  * Pure `when` chains — codegen'd, stays inside WholeStageCodegen.
  */
object PriorityCodec {
  def score(c: Column): Column =
    when(c === "Low", 1).when(c === "Medium", 2).when(c === "High", 3).otherwise(0)

  def label(c: Column): Column =
    when(c === 1, "Low").when(c === 2, "Medium").when(c === 3, "High")
}

/** Timestamp codec.
  *
  * Reference emits RFC3339 with offset (signals.py:53-54) and parses with a
  * 0-fallback: an unparsable `created_at` scores 0 so the record sorts
  * oldest instead of being dropped (projection/signal.go:147-153).
  * `try_to_timestamp` (ANSI-safe) handles ISO-8601 with offsets.
  */
object TimeCodec {
  def parseRfc3339(c: Column): Column = try_to_timestamp(c)

  def unixSecondsOrZero(c: Column): Column =
    coalesce(try_to_timestamp(c).cast("long"), lit(0L))
}
