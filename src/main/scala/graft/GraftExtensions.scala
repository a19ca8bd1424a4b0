package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers ALL the engine's custom
  * expressions as SQL functions, so `spark.sql("SELECT
  * cosine_similarity(a, b) ...")` works in any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`. Consumes the SAME
  * [[graft.functions.sqlFunctions]] table as
  * `graft.functions.registerAll` (the runtime path for an already-built
  * session) — one list, two registration surfaces, drift impossible by
  * construction (a hand-maintained copy here once silently lacked five
  * functions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit =
    graft.functions.sqlFunctions.foreach { case (name, cls, build) =>
      e.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), build))
    }
}
