package graft

import graft.SparkSuite

/** Driver-contract invariants + a smoke run of every registered query at
  * sf0.001 (value-level correctness is the DuckDB crosscheck's job —
  * here we assert the contract shape and that every plan executes).
  */
class EntrySpec extends SparkSuite {

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("query names are unique across packs") {
    // Map construction would silently drop duplicates; catch them here.
    val packs = Seq(
      graft.operators.SignalParityPack, graft.analytics.RelationalPack,
      graft.analytics.ExtrasPack,
      graft.operators.TextPack, graft.operators.DedupPack,
      graft.operators.SimilarityPack, graft.operators.MultimodalPack,
      graft.operators.SamplingPack,
      graft.operators.CurationPipeline, graft.streaming.StreamingPack)
    val names = packs.flatMap(_.queries.keys)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.queries.size == names.size)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, sf("sf0.001"))
      assert(df.columns.nonEmpty)
      df.write.format("noop").mode("overwrite").save()
    }
  }

  test("every query output column is named in its oracle SQL") {
    // The driver compares by sorting columns on NAME: a Spark alias the
    // oracle doesn't declare hash-fails even when values are identical.
    // Textual containment is a heuristic, but it catches the real
    // failure class (renamed/missing aliases) at spec time.
    for ((name, sql) <- SparkEntry.oracleSql) {
      val cols = SparkEntry.queries(name)(spark, sf("sf0.001")).columns
      val missing = cols.filterNot(c => sql.toLowerCase.contains(c.toLowerCase))
      assert(missing.isEmpty,
        s"$name: oracle SQL never mentions column(s) ${missing.mkString(", ")}")
    }
  }
}
