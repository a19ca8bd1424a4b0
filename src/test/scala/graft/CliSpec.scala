package graft

import scala.collection.mutable.ArrayBuffer

import graft.operators.DerivedSignalLog
import graft.projection.SignalStore

/** The CLI command surface (SURVEY §2.1 S8) driven in-process — mirrors
  * the reference's CLI behaviors: list with top-50 cap + color-by-priority
  * + 40-char truncation, priority filter, point get with not-found exit 1,
  * health, unknown-command exit 2 (cmd/cli/main.go).
  */
class CliSpec extends SparkSuite {

  private lazy val store =
    new SignalStore(DerivedSignalLog.signals(spark, sf("sf0.001")).cache())

  private def runCli(args: String*): (Int, Seq[String]) = {
    val lines = ArrayBuffer.empty[String]
    val code = Cli.run(store, args, lines += _)
    (code, lines.toSeq)
  }

  test("list prints header, capped newest-first rows, and a count footer") {
    val (code, lines) = runCli("list")
    assert(code == 0)
    assert(lines.head.startsWith("ID"))
    assert(lines.last.matches("""\d+ signal\(s\)"""))
    val n = lines.last.takeWhile(_.isDigit).toInt
    assert(n == lines.size - 2)
    assert(n <= 50) // reference hard cap (handler/signal.go:45)
    // Newest-first: first data row is the store's newest signal.
    val newest = store.listByCreatedAt(0, 0).collect().head.getAs[String]("id")
    assert(lines(1).startsWith(newest))
  }

  test("list colors priorities with ANSI codes") {
    val (_, lines) = runCli("list")
    assert(lines.exists(l => l.contains("[31mHigh") || l.contains("[33mMedium")
      || l.contains("[32mLow")))
  }

  test("list with priority filter returns only that priority") {
    val (code, lines) = runCli("list", "High")
    assert(code == 0)
    lines.drop(1).dropRight(1).foreach(l => assert(l.contains("High"), l))
  }

  test("get prints every field of a present signal") {
    val id = store.listByCreatedAt(0, 0).collect().head.getAs[String]("id")
    val (code, lines) = runCli("get", id)
    assert(code == 0)
    assert(lines.exists(_.startsWith("id")))
    assert(lines.exists(_.startsWith("title")))
    assert(lines.exists(_.startsWith("priority")))
  }

  test("get of an absent id exits 1 with a not-found message") {
    val (code, lines) = runCli("get", "definitely-not-an-id")
    assert(code == 1)
    assert(lines == Seq("signal definitely-not-an-id: not found"))
  }

  test("health reports up with exit 0") {
    val (code, lines) = runCli("health")
    assert(code == 0)
    assert(lines == Seq("status: up"))
  }

  test("unknown command exits 2") {
    val (code, lines) = runCli("frobnicate")
    assert(code == 2)
    assert(lines.head.startsWith("unknown command"))
  }
}
