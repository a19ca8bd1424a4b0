package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.domain.SignalSchema

/** Low-latency alternative to the foreachBatch+parquet projection
  * (SURVEY §7.1-4): per-key state held by Spark's own state store via
  * `flatMapGroupsWithState`, emitting the new materialized row (or a
  * tombstone marker) on every update.
  *
  * Trade-off vs [[StreamingProjection]]: sub-second serving freshness and
  * no external table management, but state lives in the streaming
  * checkpoint (RocksDB/HDFS state store at scale) and is only queryable
  * through the output stream — the bucketed parquet store remains the
  * batch-queryable source of truth. Both fold with identical LWW-by-seq
  * semantics.
  */
object LiveProjection {

  case class KeyedEvent(
      seq: Long, action: String, id: String,
      title: Option[String], content: Option[String], priority: Option[String],
      author: Option[String], created_at: Option[String], updated_at: Option[String])

  case class LiveRow(
      id: String, seq: Long, action: String,
      title: Option[String], content: Option[String], priority: Option[String],
      author: Option[String], created_at: Option[String], updated_at: Option[String],
      deleted: Boolean)

  private def toRow(e: KeyedEvent): LiveRow = LiveRow(
    e.id, e.seq, e.action, e.title, e.content, e.priority,
    e.author, e.created_at, e.updated_at,
    deleted = e.action == SignalSchema.Deleted)

  /** LWW fold for one key: keep the event with the highest seq ever seen
    * (state survives across batches); emit the resulting row.
    *
    * Equal-seq tie-break: the LATER-reduced event wins intra-batch
    * (`b.seq >= a.seq` keeps b), matching the cross-batch rule where an
    * equal-seq incoming event replaces state (`cur.filter(_.seq > in.seq)`)
    * — one direction for both paths, so convergence cannot depend on
    * whether duplicates land in one micro-batch or two (r16 review
    * finding; the old intra-batch reduce kept the FIRST copy). Every
    * production wire carries unique seqs (Kafka offsets / the compound
    * (partition, offset) seq), so ties are only reachable from a
    * misbehaving producer — and then the batch-split-invariant rule is
    * the defensible one; with equal seqs Spark's reduce pairing order is
    * itself unspecified, which is exactly why both paths must at least
    * agree on the direction.
    */
  def foldKey(
      id: String,
      events: Iterator[KeyedEvent],
      state: GroupState[KeyedEvent]): Iterator[LiveRow] = {
    val incoming = events.reduceOption((a, b) => if (b.seq >= a.seq) b else a)
    val current = state.getOption
    (incoming, current) match {
      case (Some(in), cur) =>
        val next = cur.filter(_.seq > in.seq).getOrElse(in)
        state.update(next)
        Iterator.single(toRow(next))
      case (None, _) => Iterator.empty
    }
  }

  /** Wire a decoded event stream into the keyed live fold. */
  def apply(spark: SparkSession, decoded: DataFrame): Dataset[LiveRow] = {
    import spark.implicits._
    decoded.as[KeyedEvent]
      .groupByKey(_.id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(foldKey)
  }
}
