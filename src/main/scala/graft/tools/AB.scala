package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved same-JVM A/B for runtime SQL confs (optimization-round
  * measurement): cross-process bench comparisons on this box carry
  * ±0.2 s of session noise (hypervisor steal, JIT, page cache), which
  * drowns sub-second per-query effects. Running A and B reps
  * interleaved in ONE session isolates the conf's effect; min-of-reps
  * per arm mirrors Bench's discipline.
  *
  * Usage: runMain graft.tools.AB <sfDir> <q1,q2,..> <reps> <k=v[,k=v]...>
  * Arm A = session defaults, arm B = the given confs (restored after
  * each B rep).
  */
object AB {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names, repsS, confS) = args
    val reps = repsS.toInt
    val confs = confS.split(",").map(_.trim).filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.all.foreach { t =>
      try graft.Tables(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => () }
    }
    val all = graft.SparkEntry.queries
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      run(name) // warm rep, discarded
      val a = Array.fill(reps)(0.0)
      val b = Array.fill(reps)(0.0)
      (0 until reps).foreach { i =>
        a(i) = run(name)
        val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        b(i) = run(name)
        saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
      def f(x: Double) = String.format(java.util.Locale.ROOT, "%.3f", x: java.lang.Double)
      println(s"AB $name A_min=${f(a.min)} B_min=${f(b.min)} " +
        s"A=[${a.map(f).mkString(",")}] B=[${b.map(f).mkString(",")}]")
    }
    spark.stop()
  }
}
