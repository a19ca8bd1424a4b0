package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[EvalOnce]] is a semantics-free barrier: values and nulls must be the
  * child's exactly (both eval paths), and its one behavioral promise —
  * the optimizer evaluates the wrapped expression ONCE, never cloning it
  * into a pushed-down filter — must hold on the p1 shape it was built for.
  */
class EvalOnceSpec extends SparkSuite {
  import spark.implicits._

  private val rows = Seq(
    (0L, """{"k": 7}"""),          // corrupted lane (id % 97 == 0)
    (1L, """{"k": 42}"""),         // clean long
    (2L, """{"k": "12"}"""),       // quoted scalar: unquotes, casts
    (3L, """{"k": 1.5}"""),        // non-integer: try_cast nulls
    (4L, """{"j": 9}"""),          // missing key: extract nulls
    (5L, null: String)             // null payload
  )

  private def decode =
    expr("try_cast(get_json_object(" +
      "CASE WHEN event_id % 97 = 0 THEN '{broken ' || props ELSE props END" +
      ", '$.k') AS LONG)")

  test("eval_once is value- and null-transparent (codegen and interpreted)") {
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val df = rows.toDF("event_id", "props")
        val bare = df.select(col("event_id"), decode.as("k"))
          .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
        val wrapped = df.select(col("event_id"), eval_once(decode).as("k"))
          .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
        assert(wrapped.toSeq === bare.toSeq)
        // the fixture exercises every null lane: corrupted, non-integer,
        // missing key, null payload
        assert(wrapped.count(_._2 == null) === 4)
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("a filter on an eval_once projection references the attribute, not a clone") {
    // A real file source, not a LocalRelation: ConvertToLocalRelation
    // folds Filter-over-LocalRelation at optimization time, which would
    // hide exactly the pushdown this test pins.
    val dir = java.nio.file.Files.createTempDirectory("evalonce").toString
    rows.toDF("event_id", "props").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).repartition(4)

    // Without the barrier: filter pushdown clones the decode below the
    // exchange (the regression this expression exists to prevent — if
    // Catalyst ever stops doing that, the barrier can be retired).
    val bare = df.select(col("event_id"), decode.as("k"))
      .where(col("k").isNotNull)
    val barePushed = bare.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.exists(_.condition.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.GetJsonObject]))
    assert(barePushed, "expected the unbarriered filter to carry a decode clone")

    // With the barrier: exactly one decode in the optimized plan, and
    // every filter condition is attribute-only (AQE wraps the physical
    // plan, so the pin is on the optimized logical plan).
    val once = df.select(col("event_id"), eval_once(decode).as("k"))
      .where(col("k").isNotNull)
    val plan = once.queryExecution.optimizedPlan
    val decodes = plan.flatMap(_.expressions.flatMap(_.collect {
      case g: org.apache.spark.sql.catalyst.expressions.GetJsonObject => g
    })).size
    assert(decodes === 1, s"expected exactly one decode in the plan, got $decodes")
    plan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.foreach { f =>
      assert(!f.condition.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.GetJsonObject]),
        "filter must reference the projected attribute, not re-decode")
    }
    assert(once.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }
}
