package graft.sources

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

import graft.{SparkEntry, SparkSuite, Tables}

/** Chaos round-trip: the driver has perturbed the fixture layout twice
  * (r8: TIMESTAMP(NANOS) → naive MICROS; r9: pyarrow 16.1 page layout).
  * This spec makes the THIRD perturbation a no-op by test: the events
  * table is rewritten under RANDOMIZED writer settings — dictionary
  * on/off, parquet page version v1/v2, compression codec, shuffled field
  * order, an added unknown column, and a random timestamp flavor — and
  * the full q1/a12/s2 surface must be bit-identical to the canonical
  * fixture every time. Seeds are fixed and logged, so a failure names its
  * exact writer configuration.
  */
class ChaosFixtureSpec extends SparkSuite {

  private val srcDir = "/root/testdata/sf0.001"

  /** One randomized writer configuration, fully determined by `seed`. */
  private case class Chaos(seed: Long) {
    private val rnd = new Random(seed)
    val dictionary: Boolean = rnd.nextBoolean()
    val pageVersion: String = if (rnd.nextBoolean()) "v1" else "v2"
    val compression: String = Seq("snappy", "gzip", "zstd", "none")(rnd.nextInt(4))
    // no millis flavor: fixture timestamps carry sub-second micros, so a
    // TIMESTAMP_MILLIS rewrite would be lossy by construction — not a
    // normalization bug, just a different (coarser) input.
    val tsFlavor: String =
      Seq("nanos_long", "ntz", "ltz_micros", "int96")(rnd.nextInt(4))
    val shuffleSeed: Long = rnd.nextLong()
    val addUnknownCol: Boolean = rnd.nextBoolean()
    override def toString: String =
      s"seed=$seed dictionary=$dictionary page=$pageVersion codec=$compression " +
        s"ts=$tsFlavor shuffledFields addUnknown=$addUnknownCol"
  }

  /** Write as the single FILE `events.parquet` (the driver-fixture shape;
    * the streaming source's pathGlobFilter matches file names).
    */
  private def writeEvents(df: DataFrame, dir: String, c: Chaos): Unit = {
    val staging = s"$dir/.staging"
    df.coalesce(1).write.mode("overwrite")
      .option("compression", c.compression)
      .option("parquet.enable.dictionary", c.dictionary.toString)
      .option("parquet.writer.version",
        if (c.pageVersion == "v2") "PARQUET_2_0" else "PARQUET_1_0")
      .parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file written under $staging"))
    Files.createDirectories(java.nio.file.Paths.get(dir))
    Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    new java.io.File(staging).listFiles().foreach(_.delete())
    Files.deleteIfExists(java.nio.file.Paths.get(staging))
  }

  private def chaosDir(c: Chaos): String = {
    val base = Tables(spark, srcDir, "events") // canonical: ts is LTZ micros
    val withTs = c.tsFlavor match {
      case "nanos_long" => base.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      case "ntz"        => base.withColumn("ts", col("ts").cast(TimestampNTZType))
      case _            => base // flavor applied via outputTimestampType below
    }
    val withExtra =
      if (c.addUnknownCol)
        withTs.withColumn("_chaos_extra",
          concat(lit("x"), col("event_id").cast("string")))
      else withTs
    val shuffled = withExtra.select(
      new Random(c.shuffleSeed).shuffle(withExtra.columns.toList).map(col): _*)

    val dir = Files.createTempDirectory(s"graft-chaos-${c.seed}-")
      .toFile.getAbsolutePath
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    c.tsFlavor match {
      case "ltz_micros" =>
        spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      case "ltz_millis" =>
        spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
      case "int96" =>
        spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      case _ => ()
    }
    try writeEvents(shuffled, dir, c)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None    => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    dir
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("q1/a12/s2 are invariant under randomized parquet writer settings") {
    val queries = Seq("q1_topk_by_time", "a12_tumbling_window", "s2_stream_window")
    val expect = queries.map { q =>
      val rows = canon(SparkEntry.queries(q)(spark, srcDir))
      assert(rows.nonEmpty, s"$q: baseline produced no rows")
      q -> rows
    }.toMap

    (1L to 4L).foreach { seed =>
      val c = Chaos(seed)
      info(s"chaos round: $c")
      val dir = chaosDir(c)
      queries.foreach { q =>
        assert(canon(SparkEntry.queries(q)(spark, dir)) === expect(q),
          s"$q differs under chaos config [$c]")
      }
    }
  }

}
