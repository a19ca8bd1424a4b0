package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.{IvfIndex, PqIndex}

/** One-shot generator for [[graft.operators.ResidualPretrainedData]]:
  * trains e17's residual PQ codebooks (PqIndex.trainResidual against the
  * pretrained IVF centroids on the sf0.01 sample) and prints the Scala
  * source to paste into the constants file. Run when training data or
  * parameters change; serving never trains.
  *
  * Usage: runMain graft.tools.TrainIvfPq /root/testdata/sf0.01
  */
object TrainIvfPq {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val books = PqIndex.trainResidual(
      Tables(spark, sfDir, "embeddings"), IvfIndex.Pretrained)
    println("// paste into ResidualPretrainedData.codebooks:")
    println(PqIndex.scalaSource(books))
    spark.stop()
  }
}
