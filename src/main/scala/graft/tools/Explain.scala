package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named queries — the dev-loop
  * plan audit (`.explain("formatted")`) the scale review runs after each
  * operator lands, as a runnable main so it works from a bare classpath.
  *
  * Usage: runMain graft.tools.Explain <sfDir> q1[,q2,...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.split(",").map(_.trim).foreach { n =>
      println(s"==== $n ====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
