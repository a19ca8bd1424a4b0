package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for t23's measured super-linearity (SCALING §3c round 12):
  * is the scrub volume itself growing faster than the corpus because the
  * ABSOLUTE df threshold (df > 2) admits ever more naturally-common
  * 3-grams as the corpus grows? Prints, per fixture: total gram
  * occurrences, hot-gram count, hot occurrences (= pre-explode covered
  * volume), and their ratios.
  *
  * Usage: runMain graft.tools.T23Diag <sfDir> [dfCap]
  */
object T23Diag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val dfCap = if (args.length > 1) args(1).toLong else 2L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.shingle_hashes_bag
    val docs = graft.Tables(spark, dir, "documents")
    val nDocs = docs.count()
    val grams = docs
      .where(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), explode(shingle_hashes_bag(col("text"), 3)).as("g"))
    grams.persist()
    val totalOcc = grams.count()
    val df = grams.select("doc_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("df"))
    df.persist()
    val distinctGrams = df.count()
    val hot = df.where(col("df") > dfCap)
    val hotRow = hot.agg(count(lit(1)).as("n_hot"), sum("df").as("hot_doc_pairs")).head()
    val hotOcc = grams.join(hot.select("g"), "g").count()
    println(s"[t23diag] dir=$dir dfCap=$dfCap nDocs=$nDocs totalOcc=$totalOcc " +
      s"distinctGrams=$distinctGrams nHot=${hotRow.getLong(0)} " +
      s"hotDocPairs=${hotRow.get(1)} hotOcc=$hotOcc " +
      f"hotOccFrac=${hotOcc.toDouble / totalOcc}%.4f")
    spark.stop()
  }
}
