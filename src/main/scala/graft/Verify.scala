package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. The dump loop
  * is shared with the dev-loop subset runner ([[graft.tools.RunSome]]) so
  * the two can never drift in escaping or output format. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dump(spark, sfDir, outDir, only = None)
    spark.stop()
  }

  /** Run every query (or the `only` subset), dump each result to
    * `outDir/<name>/` parquet, and write the matching subset of
    * `oracleSql` as `outDir/oracle_sql.json`.
    */
  def dump(spark: SparkSession, sfDir: String, outDir: String,
      only: Option[Set[String]]): Unit = {
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Subset runs MERGE into an existing oracle_sql.json rather than
    // overwrite it: pointing RunSome at a directory holding a previous
    // full Verify dump must not silently truncate the oracle map (a later
    // full crosscheck against that dir would then compare only the
    // subset). Full runs (only=None) still rewrite from scratch.
    val existing: Map[String, String] =
      if (only.isDefined && Files.exists(Paths.get(s"$outDir/oracle_sql.json"))) {
        try {
          val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
          val node = mapper.readTree(Files.readString(Paths.get(s"$outDir/oracle_sql.json")))
          import scala.jdk.CollectionConverters._
          node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
        } catch { case _: Throwable => Map.empty }
      } else Map.empty
    val merged = existing ++ SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
    val json = merged
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
