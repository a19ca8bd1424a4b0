package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Verify}

/** Dev-loop helper: run a SUBSET of SparkEntry.queries (comma-separated
  * names) against a fixture dir through [[Verify.dump]] — the exact loop
  * the driver-facing Verify main runs — so `tools/crosscheck.py` can
  * check just the queries being iterated on instead of the whole surface.
  *
  * Usage: runMain graft.tools.RunSome <sfDir> <outDir> q1,q2,...
  */
object RunSome {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val wanted = names.split(",").map(_.trim).filter(_.nonEmpty).toSet
    val missing = wanted.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries: ${missing.toSeq.sorted.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Verify.dump(spark, sfDir, outDir, only = Some(wanted))
    spark.stop()
  }
}
