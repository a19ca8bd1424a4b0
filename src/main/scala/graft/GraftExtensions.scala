package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{CosineSimilarity, WinnowFingerprints}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions, so `spark.sql("SELECT
  * cosine_similarity(a, b) ...")` works in any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_fingerprints"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WinnowFingerprints(exprs.head)))
  }
}
