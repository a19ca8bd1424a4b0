package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall times over
  * SPARK_GRAFT_SF_DIR. A small untimed warmup absorbs one-time session
  * costs (codegen compiler, parquet footer reads) so per-query numbers
  * measure the queries, not JVM startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table once (schema + a tiny codegen'd action)
    Tables.all.foreach { t =>
      try Tables(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => () }
    }
    // min of 2 runs per query: steady-state timing, resistant to the
    // ~2x inflation concurrent JVMs on this box cause (observed in
    // BENCH_r02 vs local reruns of the same commit).
    //
    // The action is a noop-format WRITE, not count(): count() lets
    // Catalyst prune every computed column a query projects but never
    // filters/sorts on, so per-row operators (token stats, fingerprints,
    // redaction) would be timed as bare scans. The noop sink consumes
    // every output column — the number measures what the query computes.
    // Dev-loop filter: SPARK_GRAFT_QUERIES=s1_stream_replay,s5_... times
    // only the named queries (the driver never sets it — full run).
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable =>
          if (!failed.contains(name)) failed ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // "value" (the total) BEFORE the per-query map: the driver captures a
    // bounded tail of stdout, and with 80+ queries the map alone can
    // overflow it — the headline number must survive any truncation
    // window. The full line is also written to BENCH.local.json so a
    // truncated capture never loses the per-query breakdown.
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","failed":$failedJson,"queries":$qs}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH.local.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH.local.json: ${e.getMessage}")
    }
    println(line)
    spark.stop()
  }
}
