package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DerivedSignalLog
import graft.projection.SignalStore

/** Serving shell (SURVEY §2.1 S7/S8): the reference's CLI surface —
  * `list [--priority P]`, `get <id>`, `health` — over the projected view,
  * with the reference's presentation ops (cmd/cli/main.go): ANSI color by
  * priority (:15-21,:144-155), 40-char title truncation with ellipsis
  * (:165-170), `yyyy-MM-dd HH:mm` time display (:157-163), hard top-50 cap
  * (handler/signal.go:45).
  *
  * Usage: runMain graft.Cli <sfDir> list [priority] | get <id> | health
  */
object Cli {
  private val Reset = "[0m"
  private def color(p: String): String = p match {
    case "High" => "[31m"   // red
    case "Medium" => "[33m" // yellow
    case "Low" => "[32m"    // green
    case _ => ""
  }

  private def truncate(s: String, n: Int = 40): String =
    if (s == null) "" else if (s.length <= n) s else s.take(n - 1) + "…"

  /** One CLI command against a store; lines go through `out`, the return
    * value is the process exit code. Extracted from `main` so `CliSpec`
    * drives the full command surface in-process (the reference's CLI has
    * equivalent handler-level tests, cmd/cli/main.go).
    */
  def run(store: SignalStore, args: Seq[String], out: String => Unit): Int =
    args match {
      case Seq("list", rest @ _*) if rest.size <= 1 =>
        val rows = (rest.headOption match {
          case Some(p) => store.listByPriority(p)
          case None => store.listByCreatedAt()
        })
          .select(col("id"), col("title"), col("priority"), col("author"),
            date_format(col("created_at"), "yyyy-MM-dd HH:mm").as("created"))
          .collect()
        printTable(rows, out)
        0
      case Seq("get", id) =>
        store.findById(id) match {
          case Some(r) => printDetail(r, out); 0
          case None => out(s"signal $id: not found"); 1
        }
      case Seq("health") =>
        if (store.health) { out("status: up"); 0 }
        else { out("status: down"); 1 }
      case other =>
        out(s"unknown command: ${other.mkString(" ")}")
        2
    }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Cli <sfDir> list [priority] | get <id> | health")
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val store = new SignalStore(DerivedSignalLog.signals(spark, sfDir))
    val code = run(store, args.drop(1).toSeq, println)
    spark.stop()
    if (code != 0) sys.exit(code)
  }

  private def printTable(rows: Array[Row], out: String => Unit): Unit = {
    out(f"${"ID"}%-12s ${"TITLE"}%-40s ${"PRIORITY"}%-10s ${"AUTHOR"}%-12s CREATED")
    rows.foreach { r =>
      val p = r.getAs[String]("priority")
      out(f"${r.getAs[String]("id")}%-12s ${truncate(r.getAs[String]("title"))}%-40s " +
        f"${color(p) + p + Reset}%-19s ${r.getAs[String]("author")}%-12s ${r.getAs[String]("created")}")
    }
    out(s"${rows.length} signal(s)")
  }

  private def printDetail(r: Row, out: String => Unit): Unit =
    r.schema.fieldNames.foreach { f =>
      out(f"$f%-12s ${Option(r.getAs[Any](f)).map(_.toString).getOrElse("")}")
    }
}
