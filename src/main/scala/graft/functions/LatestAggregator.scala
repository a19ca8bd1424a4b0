package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed event row for the Dataset API (timestamps as java.sql.Timestamp
  * so encoders map them to TimestampType).
  */
case class EvRow(
    seq: Long, id: String, action: String,
    title: Option[String], content: Option[String], priority: Option[String],
    author: Option[String],
    created_at: Option[java.sql.Timestamp],
    updated_at: Option[java.sql.Timestamp])

/** The LWW fold as a typed `Aggregator` (the engine's UDAF surface): keeps
  * the row with the highest seq. Semantically identical to the untyped
  * `max_by(struct, seq)` fold — `p2_typed_latest` proves it against the
  * same DuckDB oracle. Associative+commutative, so Spark runs it
  * partial+final like any aggregate.
  *
  * Trade-off vs the untyped fold: compile-time row typing, at the cost of
  * encoder (de)serialization per row — prefer `max_by` in hot paths; this
  * exists for typed pipelines and as the template for custom aggregations
  * (sketches, top-k buffers) that can't be expressed declaratively.
  */
object LatestAggregator extends Aggregator[EvRow, EvRow, EvRow] {
  private val sentinel =
    EvRow(Long.MinValue, "", "", None, None, None, None, None, None)

  /** Later-of-two with a DETERMINISTIC tiebreak: seq decides, and an
    * equal-seq pair (impossible on a real log, where seq is the offset —
    * but "impossible" is not a merge law) resolves by an explicit
    * field-tuple total ordering, so merge is genuinely commutative at any
    * partitioning. The tuple key is injective (timestamps compared as
    * (getTime, getNanos), which determine the instant exactly) — unlike a
    * toString comparison, where two distinct rows whose string fields
    * contain ", " can render identically and break commutativity in
    * exactly the adversarial case this tiebreak exists to close. The
    * plain-String fields go through Option(_) because the encoder CAN
    * deserialize null into them (a malformed event's from_json yields
    * null struct fields) — a bare String.compareTo would NPE inside the
    * aggregate task on precisely the adversarial equal-seq pair, where
    * the old toString comparison was at least total.
    */
  private val rowOrd: Ordering[EvRow] = Ordering.by { r: EvRow =>
    (r.seq, Option(r.id), Option(r.action),
      r.title, r.content, r.priority, r.author,
      r.created_at.map(t => (t.getTime, t.getNanos)),
      r.updated_at.map(t => (t.getTime, t.getNanos)))
  }

  private def later(x: EvRow, y: EvRow): EvRow =
    if (rowOrd.gteq(x, y)) x else y

  override def zero: EvRow = sentinel
  override def reduce(b: EvRow, a: EvRow): EvRow = later(b, a)
  override def merge(x: EvRow, y: EvRow): EvRow = later(x, y)
  override def finish(r: EvRow): EvRow = r
  override def bufferEncoder: Encoder[EvRow] = Encoders.product[EvRow]
  override def outputEncoder: Encoder[EvRow] = Encoders.product[EvRow]
}
