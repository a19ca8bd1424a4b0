package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.SparkSuite

/** SQL-callability of the custom expressions.
  *
  * Note: `withExtensions` only takes effect on a brand-new session, and the
  * test JVM shares one session across suites — so the SQL round-trip is
  * asserted via the runtime registration path (`functions.registerAll`),
  * and `GraftExtensions` wiring is exercised directly against a fresh
  * `SparkSessionExtensions` (what `--conf spark.sql.extensions` applies).
  */
class ExtensionsSpec extends SparkSuite {

  test("cosine_similarity is SQL-callable after registerAll") {
    graft.functions.registerAll(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(
        |  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c""".stripMargin)
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("every custom expression is SQL-callable after registerAll") {
    graft.functions.registerAll(spark)
    val fp = spark.sql("SELECT winnow_fingerprints('abcdefghijkl') AS f")
      .collect().head.getSeq[Long](0)
    assert(fp.nonEmpty)
    val cid = spark.sql(
      """SELECT nearest_centroid(
        |  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |  CAST(array(array(0.0, 1.0), array(1.0, 0.0)) AS ARRAY<ARRAY<FLOAT>>)) AS c""".stripMargin)
      .collect().head.getInt(0)
    assert(cid === 1)
    val sh = spark.sql("SELECT shingle_hashes('a b c d', 3) AS h")
      .collect().head.getSeq[Long](0)
    assert(sh.length === 2)
    val bc = spark.sql(
      """SELECT lsh_bucket_codes(
        |  CAST(array(1.0, -1.0) AS ARRAY<FLOAT>),
        |  CAST(array(array(1.0, 1.0), array(1.0, -1.0)) AS ARRAY<ARRAY<FLOAT>>),
        |  1) AS b""".stripMargin)
      .collect().head.getSeq[Int](0)
    assert(bc.length === 2)
    // decode of (1,0) between lo=0,hi=2: code=round(127.5)=128 (half-up),
    // de=(128*2/255, 0) — colinear with the query, so cosine is exactly 1.
    val sq = spark.sql(
      """SELECT sq8_cosine(
        |  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |  CAST(array(0.0, 0.0) AS ARRAY<DOUBLE>),
        |  CAST(array(2.0, 2.0) AS ARRAY<DOUBLE>),
        |  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c""".stripMargin)
      .collect().head.getDouble(0)
    assert(math.abs(sq - 1.0) < 1e-12)
  }

  test("GraftExtensions injects without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("the extensions path and registerAll expose the same function names") {
    // Both paths consume functions.sqlFunctions, so this pins the shared
    // table itself: every expression function name registerAll creates
    // must be in the table (the pre-refactor extensions list silently
    // lacked five names — the drift this spec now makes impossible to
    // miss), and every table entry must be resolvable after registerAll.
    graft.functions.registerAll(spark)
    val names = graft.functions.sqlFunctions.map(_._1)
    assert(names.distinct.length === names.length, "duplicate SQL names")
    names.foreach { n =>
      assert(
        spark.sessionState.functionRegistry
          .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n)),
        s"$n missing from the session registry after registerAll")
    }
    assert(names.toSet === Set(
      "cosine_similarity", "winnow_fingerprints", "nearest_centroid",
      "shingle_hashes", "shingle_hashes_bag", "count_in", "bpe_token_count",
      "bloom_hits", "bigram_context_hashes", "lsh_bucket_codes", "sq8_cosine",
      "sign_bits", "scrub_spans", "alpha_word_count", "nearest_centroids",
      "repetition_stats", "c4_lines"))
  }

  test("kmv_distinct is SQL-callable as an aggregate after registerAll") {
    graft.functions.registerAll(spark)
    // 3 distinct values, below K=64 ⇒ the sketch is exact
    val r = spark.sql(
      """SELECT kmv_distinct(h) AS d FROM VALUES (1L), (2L), (2L), (3L) t(h)""")
      .collect().head.getDouble(0)
    assert(r === 3.0)
  }

  test("hash_sample is SQL-callable and returns a sortable ARRAY<BIGINT>") {
    graft.functions.registerAll(spark)
    // 3 distinct hashes below K=128 ⇒ the sample is the full set, in
    // hash order, with the min-payload tie rule on the duplicated hash;
    // array_sort proves SQL consumers get a real array, not a kryo blob
    val r = spark.sql(
      """SELECT array_sort(hash_sample(h, x)) AS s
        |FROM VALUES (5L, 50L), (1L, 30L), (1L, 10L), (9L, 20L) t(h, x)""".stripMargin)
      .collect().head.getSeq[Long](0)
    assert(r == Seq(10L, 20L, 50L), s"got $r")
  }
}
