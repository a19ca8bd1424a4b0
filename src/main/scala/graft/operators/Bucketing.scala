package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed (pre-shuffled) tables — the co-located join capability.
  *
  * At 100 TB the fact-fact join (lineitem ⋈ orders on orderkey) is the
  * dominant shuffle of any TPC-H-shaped workload: both sides move over
  * the wire every time the join runs. Bucketing both tables by the join
  * key at WRITE time pays that shuffle once, at ingest: the bucketed
  * scan re-exposes the hash-partitioning to Catalyst, so SortMergeJoin
  * runs with ZERO Exchange on the query path (pinned by BucketingSpec).
  * The same pre-partitioning is reused by every downstream join or
  * aggregation keyed on the bucket column — one write, every query wins.
  *
  * Bucket-count discipline at scale: both sides must agree (Spark joins
  * bucketed tables shuffle-free only when bucket counts match or divide
  * evenly); size buckets so one bucket ≈ one task's worth of data at the
  * target SF — too few buckets caps parallelism, too many makes small
  * files.
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed (and bucket-sorted) by `key`.
    * Sorting within buckets lets the merge join skip its Sort when Spark
    * can prove the scan order (and makes min/max row-group pruning on the
    * key exact).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
