package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): split each query's
  * wall into its three phases so the fix targets the phase that actually
  * costs —
  *
  *   - `cons`: DataFrame CONSTRUCTION — everything `fn(spark, dir)` runs
  *     before returning (streaming replays, driver-side fills, bounded
  *     collects, trainer loops). For the streaming family this is the
  *     replay itself; the returned frame is just the state read.
  *   - `plan`: Catalyst analysis + optimization + physical planning of
  *     the RETURNED frame (forced via queryExecution.executedPlan).
  *   - `exec`: the noop-sink write of the planned frame — the same timed
  *     action as Bench.
  *
  * Also counts Spark jobs and sums task time per phase, so "many tiny
  * jobs" (per-micro-batch machinery, per-epoch aggregates) is visible
  * against "one big job".
  *
  * Usage: runMain graft.tools.Profile <sfDir> <q1,q2,...|all> [reps]
  * Emits one JSON line per (query, rep) to stdout, prefixed PROFILE.
  */
object Profile {
  private final class Counter extends SparkListener {
    val jobs = new AtomicInteger
    val taskMs = new AtomicLong
    val tasks = new AtomicInteger
    override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      if (t.taskMetrics != null) {
        taskMs.addAndGet(t.taskMetrics.executorRunTime)
        tasks.incrementAndGet()
      }
      ()
    }
    def snap: (Int, Long, Int) = (jobs.get(), taskMs.get(), tasks.get())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val namesArg = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
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
    val wanted =
      if (namesArg == "all") all.keys.toSeq.sorted
      else namesArg.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val c = new Counter
    spark.sparkContext.addSparkListener(c)
    def ms3(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", x: java.lang.Double)
    wanted.foreach { name =>
      val fn = all(name)
      (1 to reps).foreach { rep =>
        val s0 = c.snap
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val s1 = c.snap
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        val s2 = c.snap
        println(s"""PROFILE {"q":"$name","rep":$rep,""" +
          s""""cons":${ms3((t1 - t0) / 1e9)},"plan":${ms3((t2 - t1) / 1e9)},""" +
          s""""exec":${ms3((t3 - t2) / 1e9)},""" +
          s""""cons_jobs":${s1._1 - s0._1},"cons_taskms":${s1._2 - s0._2},""" +
          s""""exec_jobs":${s2._1 - s1._1},"exec_taskms":${s2._2 - s1._2},""" +
          s""""exec_tasks":${s2._3 - s1._3}}""")
      }
    }
    spark.stop()
  }
}
