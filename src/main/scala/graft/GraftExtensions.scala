package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, LshBucketCodes, NearestCentroid, ShingleHashes, Sq8Cosine, WinnowFingerprints}

/** SparkSessionExtensions entry point: registers ALL the engine's custom
  * expressions as SQL functions, so `spark.sql("SELECT
  * cosine_similarity(a, b) ...")` works in any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`. Mirrors
  * `graft.functions.registerAll` (the runtime path for an already-built
  * session); ExtensionsSpec keeps the two lists in sync.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def inject(
      e: SparkSessionExtensions,
      name: String,
      cls: Class[_],
      build: Seq[Expression] => Expression): Unit =
    e.injectFunction(
      (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), build))

  override def apply(e: SparkSessionExtensions): Unit = {
    inject(e, "cosine_similarity", classOf[CosineSimilarity],
      exprs => CosineSimilarity(exprs.head, exprs(1)))
    inject(e, "winnow_fingerprints", classOf[WinnowFingerprints],
      exprs => WinnowFingerprints(exprs.head))
    inject(e, "nearest_centroid", classOf[NearestCentroid],
      exprs => NearestCentroid(exprs.head, exprs(1)))
    inject(e, "shingle_hashes", classOf[ShingleHashes],
      exprs => ShingleHashes(exprs.head, exprs(1)))
    inject(e, "lsh_bucket_codes", classOf[LshBucketCodes],
      exprs => LshBucketCodes(exprs.head, exprs(1), exprs(2)))
    inject(e, "sq8_cosine", classOf[Sq8Cosine],
      exprs => Sq8Cosine(exprs.head, exprs(1), exprs(2), exprs(3)))
  }
}
