package graft

import org.apache.spark.sql.SparkSession

/** Smoke runner for the driver's flagship-entry contract: builds the same
  * kind of session the driver does, calls `SparkEntry.entry`, prints the
  * row count (driver checks rows > 0) and the first rows.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    df.show(5, truncate = false)
    require(n > 0, "entry() must return rows on sf0.001")
    spark.stop()
  }
}
