package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement scratch (r18): the driver fixtures are single-row-group
  * parquet, so scan-stage map work runs in ONE task. Quantify what a
  * post-read round-robin fan-out buys for a CPU-dense per-row pipeline
  * (p1's JSON decode) and what it costs a cheap aggregate (a1-like sum).
  *
  * Usage: runMain graft.tools.ScanFan <sfDir> [reps]
  */
object ScanFan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"SCANFAN $tag min=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def decode(fan: Boolean): Unit = {
      val e0 = graft.Tables(spark, sfDir, "events")
      val e = if (fan) e0.repartition(cpus.toInt) else e0
      val corrupted = when(col("event_id") % 97 === 0,
        concat(lit("{broken "), col("props"))).otherwise(col("props"))
      e.select(col("event_id"), get_json_object(corrupted, "$.k").as("ktext"))
        .select(col("event_id"), expr("try_cast(ktext AS LONG)").as("k"))
        .where(col("k").isNotNull)
        .orderBy("event_id")
        .write.format("noop").mode("overwrite").save()
    }
    def tok(fan: Boolean): Unit = {
      val d0 = graft.Tables(spark, sfDir, "documents")
      val d = if (fan) d0.repartition(cpus.toInt) else d0
      d.select(col("source"), size(split(col("text"), " ")).as("n"),
          md5(col("text").cast("binary")).as("fp"))
        .groupBy("source").agg(sum(col("n")), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    def cheap(fan: Boolean): Unit = {
      val l0 = graft.Tables(spark, sfDir, "lineitem")
      val l = if (fan) l0.repartition(cpus.toInt) else l0
      l.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("q"))
        .write.format("noop").mode("overwrite").save()
    }
    def canon(fan: Boolean): Unit = {
      val d0 = graft.Tables(spark, sfDir, "documents")
      val d = if (fan) d0.repartition(cpus.toInt) else d0
      graft.operators.TextPack.canonFeats(d)
        .repartition(4).localCheckpoint().unpersist(true)
      ()
    }
    canon(false); canon(true)
    time("canon_1task")(canon(false))
    time("canon_fan")(canon(true))
    decode(false); decode(true) // warm both paths
    time("decode_1task")(decode(false))
    time("decode_fan")(decode(true))
    tok(false); tok(true)
    time("tok_1task")(tok(false))
    time("tok_fan")(tok(true))
    cheap(false); cheap(true)
    time("cheap_1task")(cheap(false))
    time("cheap_fan")(cheap(true))
    spark.stop()
  }
}
