package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.functions.{md5Prefix60, tokens}

/** Corpus-assembly operators for training-data pipelines: deterministic
  * mixture sampling (domain re-weighting) and fixed-token-budget sequence
  * packing — the two steps between "curated documents" and "training
  * shards".
  *
  * Both are hash/prefix-sum dataflows with NO RNG: rerunning at any
  * partitioning, scale, or cluster size reproduces the same sample and the
  * same shard layout (the property that makes training runs resumable and
  * ablations comparable).
  */
object SamplingPack extends QueryPack {

  /** Per-mille keep rates by source group (sources src0-src19; group =
    * index div 5). Stand-in for the per-domain mixture weights of a real
    * run (e.g. up-weight books/wiki, down-weight crawl).
    */
  private val Rates = Seq(1000, 500, 250, 750)

  /** Tokens per packed training sequence (x2). */
  private val Budget = 2048
  /** Documents per prefix-sum bucket (x2) — see the scale note there. */
  private val Chunk = 256

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // x1: stratified mixture sampling — keep each document iff a salted
    // content-independent hash of its id falls under its source's
    // per-mille rate; emit the inverse-rate importance weight. Pure
    // projection + filter: no shuffle, no RNG, embarrassingly parallel,
    // and the sample is a deterministic function of (id, rate table) —
    // stable under reshuffling, retries, and scale-out.
    "x1_mixture_sample" -> ((s, dir) => {
      val h = pmod(md5Prefix60(concat(lit("mix:"), col("doc_id").cast("string"))), lit(1000))
      val grp = expr("CAST(substring(source, 4) AS INT) div 5")
      val permille = Rates.zipWithIndex.tail
        .foldLeft(when(grp === 0, Rates.head)) { case (c, (r, i)) => c.when(grp === i, r) }
        .otherwise(Rates.last)
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), h.as("bucket"),
          (lit(1000).cast("double") / permille).as("weight"))
        .where(col("bucket") < permille)
        .orderBy("doc_id")
    }),

    // x2: sequence packing — concatenate the corpus in doc_id order and
    // chop into Budget-token shards: each document gets the shard id and
    // intra-shard offset where its tokens start (documents may straddle a
    // boundary, as in real packed pre-training).
    //
    // The global prefix sum is two-level so it scales: (1) a window
    // partitioned by a coarse doc_id bucket computes within-bucket running
    // sums in parallel; (2) bucket totals — one row per Chunk documents,
    // ~4M rows even at 1B docs — take a single tiny window pass and
    // broadcast-join back. No stage ever single-partitions the corpus
    // (a bare Window.orderBy over the full table would).
    "x2_pack_sequences" -> ((s, dir) => {
      val t = Tables(s, dir, "documents")
        .select(col("doc_id"), size(tokens(col("text"))).as("n_tokens"))
        .withColumn("bucket", expr(s"doc_id div $Chunk"))
      val inBucket = Window.partitionBy("bucket").orderBy("doc_id")
      val offsets = t.groupBy("bucket").agg(sum(col("n_tokens")).as("btot"))
        .withColumn("boff",
          sum(col("btot")).over(Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("btot"))
        .select(col("bucket"), col("boff"))
      t.join(broadcast(offsets), "bucket")
        .withColumn("cum_before",
          col("boff") + sum(col("n_tokens")).over(inBucket) - col("n_tokens"))
        .select(col("doc_id"), col("n_tokens"),
          expr(s"cum_before div $Budget").as("shard_id"),
          (col("cum_before") % Budget).as("offset_in_shard"))
        .orderBy("doc_id")
    })
  )

  override def oracles: Map[String, String] = Map(
    "x1_mixture_sample" -> {
      val cases = Rates.zipWithIndex
        .map { case (r, i) => s"WHEN $i THEN $r" }.mkString(" ")
      s"""WITH p AS (
         |  SELECT doc_id, source,
         |    CAST(concat('0x', substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS bucket,
         |    CASE CAST(substr(source, 4) AS INTEGER) // 5 $cases ELSE ${Rates.last} END AS permille
         |  FROM documents)
         |SELECT doc_id, source, bucket, CAST(1000 AS DOUBLE) / permille AS weight
         |FROM p WHERE bucket < permille ORDER BY doc_id""".stripMargin
    },

    "x2_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS cum_before
         |  FROM t)
         |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
         |  cum_before // $Budget AS shard_id,
         |  cum_before % $Budget AS offset_in_shard
         |FROM c ORDER BY doc_id""".stripMargin
  )
}
