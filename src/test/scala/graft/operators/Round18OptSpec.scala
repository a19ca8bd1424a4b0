package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** r18 OPTIMIZATION-round invariants — each pins an internals change
  * whose RESULTS must be bit-identical (the oracle gate re-proved that
  * end-to-end at both SFs; these pin the mechanisms so a refactor
  * cannot silently drop them):
  *
  *  - [[Tables.fanIfSerial]] fans a single-split scan to the session's
  *    parallelism and is a strict NO-OP (same object, no plan change)
  *    once the input already reaches a quarter of it — the guard that
  *    makes the fan safe at production layouts.
  *  - [[SamplingPack.statsFromDraw]] over the pinned draw frame equals
  *    [[SamplingPack.uniqueTokensWithRate]]'s second corpus scan row
  *    for row — the d1 kept-row == group-max invariant the x16/x19/x20
  *    single-scan fusion rides on.
  *  - [[TextPack.trainPocket]] restores the caller's AQE conf on every
  *    exit path — the scoped toggle must not leak into the rest of the
  *    query (x20's realization stages keep AQE on deliberately).
  */
class Round18OptSpec extends SparkSuite {

  test("fanIfSerial: single-split scan fans to session parallelism; parallel input is a no-op") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val p = spark.sparkContext.defaultParallelism
    assert(docs.rdd.getNumPartitions == 1,
      "fixture premise: single-row-group file scans as one split")
    val fanned = Tables.fanIfSerial(docs)
    assert(fanned.rdd.getNumPartitions == p)
    // row set unchanged (round-robin moves rows, never makes/drops them)
    assert(fanned.count() == docs.count())
    assert(fanned.agg(sum(col("doc_id"))).head().getLong(0) ==
      docs.agg(sum(col("doc_id"))).head().getLong(0))
    // already-parallel input: returned AS-IS — no second exchange ever
    val wide = docs.repartition(p)
    assert(Tables.fanIfSerial(wide) eq wide)
  }

  test("statsFromDraw over the pin equals the uniqueTokensWithRate scan row for row") {
    val dir = sf("sf0.001")
    val fromPin = SamplingPack.statsFromDraw(SamplingPack.drawFrame(spark, dir))
      .orderBy("source").collect().toSeq
    val fromScan = SamplingPack.uniqueTokensWithRate(spark, dir)
      .orderBy("source").collect().toSeq
    assert(fromPin == fromScan)
  }

  test("trainPocket restores the caller's AQE conf on success and on failure") {
    val key = "spark.sql.adaptive.enabled"
    spark.conf.set(key, "true")
    val feats = TextPack.trainFrame(spark, sf("sf0.001"))
    TextPack.trainPocket(feats)
    assert(spark.conf.get(key) == "true", "restored after a clean run")
    // failure path: a frame without the feature columns throws inside
    // the loop; the finally must still restore
    val bogus = feats.select(col("doc_id"))
    intercept[Throwable] { TextPack.trainPocket(bogus) }
    assert(spark.conf.get(key) == "true", "restored after a failed run")
  }
}
