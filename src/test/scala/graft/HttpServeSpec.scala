package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.operators.DerivedSignalLog

/** End-to-end HTTP surface: the reference's three routes served over a
  * real socket, hit with a real HTTP client (mirrors the reference's
  * handler tests, handler/signal_test.go:16-200).
  */
class HttpServeSpec extends SparkSuite {

  private lazy val view = DerivedSignalLog.signals(spark, sf("sf0.001")).cache()
  private lazy val server = HttpServe.start(spark, view, port = 0)
  private lazy val base = s"http://127.0.0.1:${server.getAddress.getPort}"
  private val client = HttpClient.newHttpClient()

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("GET /signals returns newest-first JSON with Content-Type") {
    val r = get("/signals")
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Type").get == "application/json")
    assert(r.body().startsWith("["))
    // newest-first: the first id in the body is the newest signal
    val firstId = "\"id\": \"(\\d+)\"".r.findFirstMatchIn(r.body()).get.group(1)
    val newest = new graft.projection.SignalStore(view).listByCreatedAt(0, 0)
      .collect().head.getAs[String]("id")
    assert(firstId == newest)
  }

  test("GET /signals?priority=High filters") {
    val r = get("/signals?priority=High")
    assert(r.statusCode() == 200)
    assert(!r.body().contains("\"priority\": \"Low\""))
    assert(r.body().contains("\"priority\": \"High\""))
  }

  test("GET /signals/{id}: 200 for present, 404 for absent") {
    val id = view.select("id").collect().head.getString(0)
    val ok = get(s"/signals/$id")
    assert(ok.statusCode() == 200)
    assert(ok.body().contains(s""""id": "$id""""))
    // all-string read model with RFC3339 timestamps
    assert("\"created_at\": \"\\d{4}-\\d{2}-\\d{2}T.*".r.findFirstIn(ok.body()).isDefined)

    val missing = get("/signals/definitely-not-an-id")
    assert(missing.statusCode() == 404)
    assert(missing.body().contains("not found"))
  }

  test("GET /health is ok") {
    val r = get("/health")
    assert(r.statusCode() == 200)
    assert(r.body() == """{"status":"ok"}""")
  }

  test("request loop reuses one serving plan per route (no re-analysis per request)") {
    // A Dataset's QueryExecution is a lazy val; the serving memo hands the
    // SAME Dataset back for every request to a given listing route, so
    // Catalyst analysis/optimization/planning runs once. Assert it from
    // the outside: a QueryExecutionListener sees one QueryExecution
    // IDENTITY across repeated collect()s of the same route.
    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[org.apache.spark.sql.execution.QueryExecution]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, duration: Long): Unit =
        if (funcName == "collect") seen.add(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      (1 to 3).foreach { _ => assert(get("/signals?priority=High").statusCode() == 200) }
      // listener delivery is async — poll until the 3 collects arrive
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (seen.size() < 3 && System.nanoTime() < deadline) Thread.sleep(50)
      val qes = seen.toArray(Array.empty[org.apache.spark.sql.execution.QueryExecution])
      assert(qes.length >= 3, s"listener saw ${qes.length} collects")
      val last3 = qes.takeRight(3)
      assert(last3.forall(_ eq last3.head),
        "each request re-planned the identical priority listing instead of reusing the memoized plan")
    } finally spark.listenerManager.unregister(listener)
  }

  test("empty priority param must not poison the default listing's memo entry") {
    // Regression: the memo was keyed on priority.getOrElse(""), so a
    // client hitting /signals?priority= (empty value, matches no rows)
    // FIRST would cache [] under the same key as the default
    // newest-first listing, breaking /signals for the life of the JVM.
    val empty = get("/signals?priority=")
    assert(empty.statusCode() == 200)
    assert(empty.body() == "[]", s"priority= matches no rows: ${empty.body()}")
    val listing = get("/signals")
    assert(listing.statusCode() == 200)
    assert(listing.body() != "[]",
      "default listing returned [] — the empty-priority request aliased its memo entry")
  }

  test("priority route caps the response at MaxPageSize rows") {
    import spark.implicits._
    // A hot priority bigger than the cap: 1200 rows, all "High". The
    // reference would return them all; the rebuild's serving edge pages.
    val hot = (0 until 1200).map { i =>
      (f"hot-$i%04d", s"t$i", "c", "High", "a",
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    }.toDF("id", "title", "content", "priority", "author",
      "created_at", "updated_at")
    val hotServer = HttpServe.start(spark, hot, port = 0)
    try {
      val r = client.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${hotServer.getAddress.getPort}/signals?priority=High"))
          .GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200)
      val n = "\"id\": ".r.findAllIn(r.body()).size
      assert(n == graft.projection.SignalStore.MaxPageSize,
        s"expected capped response, got $n rows")
      // Deterministic page: the id-ordered prefix.
      assert(r.body().contains("\"id\": \"hot-0000\""))
      assert(!r.body().contains("\"id\": \"hot-1100\""))
    } finally hotServer.stop(0)
  }
}
