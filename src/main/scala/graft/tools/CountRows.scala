package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Row-count capture for scaling records (SCALING.md §3f): run named
  * queries against a fixture and print one JSON line per query with its
  * output row count — the "candidate-pair count" evidence the slope
  * tables cite (a timing row alone can't show sub-quadratic pair
  * growth). count() lets Catalyst prune computed columns, so the number
  * is the CARDINALITY only — timings come from the slope harness, never
  * from here.
  *
  * Usage: runMain graft.tools.CountRows <sfDir> <q1,q2,...>
  */
object CountRows {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SP", sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")))
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_CONF").foreach { kvs =>
      kvs.split(",").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => sys.error(s"SPARK_GRAFT_CONF entry '$kv' is not k=v")
        }
      }
    }
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { q =>
      require(SparkEntry.queries.contains(q), s"unknown query: $q")
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      val sec = math.rint((System.nanoTime() - t0) / 1e6) / 1000
      println(s"""{"tool":"count_rows","query":"$q","sf":"$sfDir","rows":$n,"count_sec":$sec}""")
    }
    spark.stop()
  }
}
