package graft.tools

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Executor-loss chaos capture (SCALING.md §8): run a query on the
  * tools/cluster.sh multi-JVM standalone cluster, `kill -9` one executor
  * PROCESS while its tasks are mid-flight, and assert the query still
  * completes with a result hash identical to the calm run — the
  * reference's retry-not-crash operational stance
  * (data-plane/internal/consumer/consumer.go:56-67: on failure, retry
  * until success, never lose the record) demonstrated on Spark's own
  * recovery machinery (task retry + stage resubmission on FetchFailed +
  * standalone master relaunching the lost executor) instead of merely
  * inherited from its documentation.
  *
  * The kill is real (`kill -9` on a CoarseGrainedExecutorBackend pid —
  * the JVM gets no chance to flush or hand off shuffle blocks), timed
  * mid-query (armed only after the victim has RUNNING tasks), and
  * verified to have happened (the driver must observe an
  * ExecutorRemoved for the victim; a run where the kill missed fails
  * the capture rather than silently passing as a calm run).
  *
  * Usage:
  *   tools/cluster.sh start 2 8 10g
  *   runMain graft.tools.ChaosKill <master> <sfDir> <query> [jar]
  */
object ChaosKill {

  /** Order-insensitive FNV-1a-combined hash of every row (the query's
    * own output order is not part of the contract under retry — Spark
    * only guarantees set semantics for an unsorted collect).
    */
  private def resultHash(spark: SparkSession, sfDir: String, query: String): (Long, Long) = {
    val rows = SparkEntry.queries(query)(spark, sfDir).collect()
    var acc = 0L
    rows.foreach { r =>
      var h = 0xcbf29ce484222325L
      r.toString.foreach { c => h ^= c; h *= 0x100000001b3L }
      acc += h // commutative combine: row order must not matter
    }
    (acc, rows.length.toLong)
  }

  private def executorPids(): Seq[Int] = {
    val self = ProcessHandle.current().pid()
    import scala.jdk.CollectionConverters._
    ProcessHandle.allProcesses().iterator().asScala
      .filter(p => p.pid() != self && p.info().commandLine().map[Boolean](
        (cl: String) => cl.contains("CoarseGrainedExecutorBackend")).orElse(false))
      .map(_.pid().toInt).toSeq.sorted
  }

  def main(args: Array[String]): Unit = {
    val master = args(0)
    val sfDir = args(1)
    val query = args(2)
    require(SparkEntry.queries.contains(query), s"unknown query: $query")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "8g"))
    if (args.length > 3) builder.config("spark.jars", args(3))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CONF: same contract as Bench — runtime confs applied
    // before the runs, so operator knobs (e.g. graft.scrub.dfShards)
    // can be chaos-tested in the exact configuration they ship in.
    sys.env.get("SPARK_GRAFT_CONF").foreach { kvs =>
      kvs.split(",").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => sys.error(s"SPARK_GRAFT_CONF entry '$kv' is not k=v")
        }
      }
    }

    // ---- calm run: the oracle-side hash ----
    val t0 = System.nanoTime()
    val (calmHash, calmRows) = resultHash(spark, sfDir, query)
    val calmSec = (System.nanoTime() - t0) / 1e9
    println(f"[chaos] calm run: $calmRows rows, hash=$calmHash%016x, $calmSec%.1f s")

    // ---- chaos run: arm a killer that fires once tasks are running ----
    val runningTasks = new AtomicInteger
    val killed = new AtomicBoolean(false)
    val removedSeen = new AtomicBoolean(false)
    val retriedTasks = new AtomicLong
    val listener = new SparkListener {
      override def onTaskStart(ts: SparkListenerTaskStart): Unit =
        runningTasks.incrementAndGet()
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        runningTasks.decrementAndGet()
        if (te.taskInfo != null && te.taskInfo.attemptNumber > 0)
          retriedTasks.incrementAndGet()
      }
      override def onExecutorRemoved(er: SparkListenerExecutorRemoved): Unit =
        removedSeen.set(true)
    }
    spark.sparkContext.addSparkListener(listener)

    val killer = new Thread(() => {
      // wait until the query is genuinely mid-flight on the cluster
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (runningTasks.get() < 4 && System.nanoTime() < deadline)
        Thread.sleep(50)
      Thread.sleep(sys.env.getOrElse("SPARK_GRAFT_KILL_DELAY_MS", "2000").toLong)
      val pids = executorPids()
      pids.headOption match {
        case Some(pid) =>
          println(s"[chaos] kill -9 executor pid $pid (of ${pids.size} executors, ${runningTasks.get()} tasks in flight)")
          new ProcessBuilder("kill", "-9", pid.toString).start().waitFor()
          killed.set(true)
        case None =>
          println("[chaos] no executor pid found — kill NOT performed")
      }
    }, "chaos-killer")
    killer.setDaemon(true)
    killer.start()

    val t1 = System.nanoTime()
    val (chaosHash, chaosRows) = resultHash(spark, sfDir, query)
    val chaosSec = (System.nanoTime() - t1) / 1e9
    killer.join(5000)

    println(f"[chaos] chaos run: $chaosRows rows, hash=$chaosHash%016x, $chaosSec%.1f s (calm $calmSec%.1f s)")
    println(s"[chaos] killed=${killed.get()} executorRemovedObserved=${removedSeen.get()} retriedTasks=${retriedTasks.get()}")

    val ok = killed.get() && removedSeen.get() &&
      chaosHash == calmHash && chaosRows == calmRows
    println(s"""{"chaos_query":"$query","sf":"$sfDir","calm_sec":${math.rint(calmSec * 1000) / 1000},"chaos_sec":${math.rint(chaosSec * 1000) / 1000},"rows":$calmRows,"hash_match":${chaosHash == calmHash},"executor_killed":${killed.get()},"executor_removed_observed":${removedSeen.get()},"retried_tasks":${retriedTasks.get()},"ok":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
