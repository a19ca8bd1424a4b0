package graft.tools

import java.lang.management.ManagementFactory
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.streaming.StreamingProjection

/** Sustained-stream throughput capture (SCALING.md §9): replay a
  * multi-million-event synthetic signal log through the production
  * ingest paths over many micro-batches and record the steady-state
  * events/s plus state-store growth — the measurement behind the
  * "fixed per-batch cost amortizes to ~0 per event" claim the replay
  * benches (s1/s6/s13) could only assert at fixture scale.
  *
  * Two modes, the two ingest edges the engine ships:
  *
  *  - `project`: the reference's core data-plane loop (consumer →
  *    decode → LWW fold → materialized state;
  *    data-plane/internal/consumer/consumer.go:25-73) as
  *    [[StreamingProjection]] over a JSON-lines log of `nEvents` events
  *    on `nKeys` keys in `nBatches` micro-batches. State is the live
  *    key set — the run reports the store's on-disk size and view rows
  *    so growth is visible, not asserted.
  *  - `gate`: s21's streaming decontamination gate — the frozen Bloom
  *    bitmap (built once, off the clock, like any deployed artifact)
  *    probed by a stateless map+filter over a document stream
  *    replicated to `nEvents` docs.
  *
  * Log synthesis is off the measured clock (it is the topic's existing
  * bytes, not query work — the stagedEventLog discipline). Timing comes
  * from the engine's own `StreamingQueryProgress` (per-batch
  * triggerExecution + numInputRows); steady state drops the first two
  * batches (source listing + codegen warmup). Output: one JSON line,
  * load-labeled like the bench (min-of-2 is the caller's job — one JVM
  * per capture via the shell).
  *
  * Usage: runMain graft.tools.StreamThroughput project <nEvents> <nKeys> <nBatches>
  *        runMain graft.tools.StreamThroughput gate <nDocs> <sfDir> <nBatches>
  */
object StreamThroughput {

  private final case class BatchObs(batchId: Long, rows: Long, ms: Long)

  private def dirBytes(path: java.io.File): Long =
    if (path.isFile) path.length()
    else Option(path.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    require(mode == "project" || mode == "gate", s"unknown mode $mode")
    val n = args(1).toLong
    val nBatches = args(3).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    def load1: Double = ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val load1Start = load1

    // SPARK_GRAFT_MASTER / SPARK_GRAFT_JARS: same contract as Bench —
    // point the SAME capture at the tools/cluster.sh standalone cluster
    // so the sustained-throughput loop crosses real process boundaries
    // (SCALING §9's cluster row; §8 prices the per-batch RPC it adds).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      // micro-batch-sized shuffles: the tunedChild discipline
      // (StreamingPack.scala) — small state width, AQE off (pure
      // per-batch planning overhead at micro-batch volumes).
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_JARS").foreach(builder.config("spark.jars", _))
    sys.env.get("SPARK_GRAFT_EXECUTOR_MEM")
      .foreach(builder.config("spark.executor.memory", _))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-stream-tp-").toString
    val inDir = s"$root/in"

    // ---- fixture synthesis (off the clock) ----
    val genT0 = System.nanoTime()
    val nKeys = if (mode == "project") args(2).toLong else 0L
    if (mode == "project") {
      // Deterministic synthetic signal log with the production event
      // shape (SignalSchema.eventSchema): ~6% deletes, realistic field
      // sizes, keys hashed uniformly over nKeys.
      val r = spark.range(n).withColumnRenamed("id", "i")
      val key = concat(lit("sig-"), pmod(xxhash64(col("i")), lit(nKeys)))
      val ts = date_format(
        timestamp_seconds(lit(1700000000L) + pmod(col("i"), lit(86400L))),
        "yyyy-MM-dd'T'HH:mm:ssXXX")
      r.select(col("i").as("seq"),
          to_json(struct(
            when(pmod(col("i"), lit(17L)) === 0, lit("deleted"))
              .when(pmod(col("i"), lit(3L)) === 0, lit("created"))
              .otherwise(lit("updated")).as("action"),
            key.as("id"),
            concat(lit("title for event "), col("i")).as("title"),
            concat(lit("content payload body for synthetic event number "),
              col("i"), lit(" carrying a realistically sized message")).as("content"),
            when(pmod(col("i"), lit(3L)) === 0, "Low")
              .when(pmod(col("i"), lit(3L)) === 1, "Medium")
              .otherwise("High").as("priority"),
            concat(lit("author-"), pmod(col("i"), lit(97L))).as("author"),
            ts.as("created_at"),
            ts.as("updated_at"))).as("value"))
        .repartition(nBatches)
        .write.json(inDir)
    } else {
      // Replicate the documents table to nDocs rows with distinct ids;
      // text is unchanged, so per-doc gate work matches production.
      val sfDir = args(2)
      val docs = graft.Tables(spark, sfDir, "documents").select("doc_id", "text")
      val base = docs.count()
      val rep = math.max(1L, (n + base - 1) / base)
      docs.crossJoin(spark.range(rep).withColumnRenamed("id", "r"))
        .select((col("doc_id") * rep + col("r")).as("doc_id"), col("text"))
        .where((col("doc_id") % (base * rep)) < n)
        .repartition(nBatches)
        .write.parquet(inDir)
    }
    val genSec = (System.nanoTime() - genT0) / 1e9

    // ---- instrumented replay ----
    val obs = new ConcurrentLinkedQueue[BatchObs]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.numInputRows > 0)
          obs.add(BatchObs(p.batchId, p.numInputRows,
            p.durationMs.getOrDefault("triggerExecution", 0L)))
      }
    })

    val wallT0 = System.nanoTime()
    var stateBytes = 0L
    var stateRows = 0L
    var maxGen = 0L
    if (mode == "project") {
      val proj = new StreamingProjection(spark, s"$root/state")
      val q = proj.runFileStream(inDir, s"$root/chk", maxFilesPerTrigger = 1)
      q.awaitTermination()
      stateBytes = dirBytes(new java.io.File(s"$root/state"))
      stateRows = proj.view.count()
      maxGen = proj.store.currentMaxGen
    } else {
      val sfDir = args(2)
      val bitmap = graft.operators.DedupPack.bloomBitmap(spark, sfDir)
      val docSchema = spark.read.parquet(inDir).schema
      val q = spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(inDir)
        .select(col("doc_id"),
          graft.functions.bloom_hits(
            graft.functions.shingle_hashes(col("text"), 3),
            bitmap, graft.operators.DedupPack.BloomK).as("n_bloom_hits"))
        .where(col("n_bloom_hits") > 0)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$root/chk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", s"$root/out")
        .start()
      q.awaitTermination()
      stateRows = spark.read.parquet(s"$root/out").count() // flagged docs
    }
    val wallSec = (System.nanoTime() - wallT0) / 1e9

    import scala.jdk.CollectionConverters._
    val batches = obs.asScala.toSeq.sortBy(_.batchId)
    val steady = batches.drop(2)
    val steadyRows = steady.map(_.rows).sum
    val steadyMs = steady.map(_.ms).sum.max(1L)
    val eps = steadyRows * 1000.0 / steadyMs
    val wallEps = batches.map(_.rows).sum / wallSec
    val msSorted = batches.map(_.ms).sorted
    val p50 = if (msSorted.isEmpty) 0L else msSorted(msSorted.size / 2)

    def r3(x: Double): Double = math.rint(x * 1000) / 1000
    println(
      s"""{"tool":"stream_throughput","mode":"$mode","events":$n""" +
      (if (mode == "project") s""","keys":$nKeys""" else "") +
      s""","batches":${batches.size},"gen_sec":${r3(genSec)}""" +
      s""","wall_sec":${r3(wallSec)},"wall_events_per_sec":${math.rint(wallEps)}""" +
      s""","steady_events_per_sec":${math.rint(eps)}""" +
      s""","first_batch_ms":${batches.headOption.map(_.ms).getOrElse(0L)}""" +
      s""","p50_batch_ms":$p50""" +
      s""","state_bytes":$stateBytes,"state_rows":$stateRows,"max_gen":$maxGen""" +
      s""","master":"$master"""" +
      s""","load1_start":${r3(load1Start)},"load1_end":${r3(load1)}}""")

    spark.stop()
    // best-effort scratch cleanup (multi-GB fixtures)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(root))
  }
}
