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

  test("GraftExtensions injects without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
