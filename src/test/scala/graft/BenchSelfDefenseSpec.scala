package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.Bench's capture self-defense (r14 verdict #5): the bounded
  * settle loop and the loud `"contended"` stamp. Pure-function specs —
  * the mains stay un-launched; the injected clock/load/sleep drive both
  * settle exits.
  */
class BenchSelfDefenseSpec extends AnyFunSuite {

  test("contended stamp: true at/above the threshold, false below") {
    assert(!Bench.isContended(0.0))
    assert(!Bench.isContended(2.99))
    assert(Bench.isContended(3.0))
    assert(Bench.isContended(4.86)) // the BENCH_r14.json launch load
  }

  test("loadJson fragment carries the stamp both ways") {
    val calm = Bench.loadJson(0.93, 1.2, 2)
    assert(calm.contains("\"contended\":false"))
    assert(calm.contains("\"load1_start\":0.93"))
    assert(calm.contains("\"reps\":2"))
    val hot = Bench.loadJson(4.86, 3.1, 2)
    assert(hot.contains("\"contended\":true"))
  }

  test("settle exits immediately on a calm box") {
    var slept = 0L
    val polls = Bench.settleUntilCalm(60000000000L, () => 0L,
      () => 0.5, ms => slept += ms)
    assert(polls == 0 && slept == 0L)
  }

  test("settle polls until the load drops, then stops") {
    // load: hot for 3 polls, then calm
    var reads = 0
    val loads = Seq(5.0, 4.0, 3.5, 1.0)
    var slept = 0L
    val polls = Bench.settleUntilCalm(60000000000L, () => 0L,
      () => { val l = loads(math.min(reads, loads.length - 1)); reads += 1; l },
      ms => slept += ms)
    assert(polls == 3)
    assert(slept == 15000L)
  }

  test("settle NEVER refuses: a never-calm box exits at the budget") {
    var t = 0L
    val polls = Bench.settleUntilCalm(20000000000L, () => t,
      () => 9.9, ms => t += ms * 1000000L)
    // 5 s sleeps against a 20 s budget: 4 polls, then deadline
    assert(polls == 4)
  }

  test("per-query suspect rule: starved wall under contended load, never self-load") {
    // r15's t11 episode: 31.56 s wall, mid-run spike starving the JVM
    // (wall burns, cpu doesn't) — the launch stamp said calm, the
    // per-query stamp would not have
    assert(Bench.suspectQuery(31.56, 3.2, 0.3))
    // a busy HEALTHY query raises load1 all by itself: measured d15
    // x1000m cell at load1 20.7 / cpu_wall 23.7 — self-load, not suspect
    assert(!Bench.suspectQuery(22.77, 20.68, 23.65))
    // calm queries and sub-floor walls are never suspects
    assert(!Bench.suspectQuery(31.56, 0.4, 0.3))
    assert(!Bench.suspectQuery(0.8, 9.9, 0.3))
    assert(!Bench.suspectQuery(1.99, 3.0, 0.3))
    // boundary: at the wall/load thresholds with a starved cpu ratio
    assert(Bench.suspectQuery(2.0, 3.0, 1.99))
    assert(!Bench.suspectQuery(2.0, 3.0, 2.0))
  }

  test("suspect fragment is empty when clean, capped at the slowest MaxSuspects when hot") {
    assert(Bench.suspectJsonFrag(Nil) == "")
    // under the cap: all suspects ride, name-ordered
    val two = Bench.suspectJsonFrag(Seq(
      ("zq", 5.0, (3.5, 0.4)), ("aq", 9.0, (4.0, 0.2))))
    assert(two.startsWith(""","suspect":{"""))
    assert(two.indexOf("\"aq\"") < two.indexOf("\"zq\""))
    assert(!two.contains("suspects_omitted"))
    // over the cap (the whole-run-hot regime): keep the SLOWEST 8 and
    // say how many were dropped — the stamp must never grow past the
    // driver's tail-capture budget (the BENCH_r02-r05 truncation bug)
    val many = (1 to 40).map(i => (f"q$i%02d", i.toDouble, (5.0, 0.3)))
    val frag = Bench.suspectJsonFrag(many)
    assert(frag.contains(""""suspects_omitted":32"""), frag)
    assert(frag.contains("\"q40\"") && frag.contains("\"q33\""), frag)
    assert(!frag.contains("\"q32\""), frag)
    assert(frag.length < 600, s"fragment too large: ${frag.length}")
  }

  test("queryEnvJson renders per-query load1 + cpu_wall machine-readably") {
    val j = Bench.queryEnvJson(Seq(
      "t11_bpe_tokens" -> (2.83, 0.41),
      "s2_stream_window" -> (0.55, 12.0)))
    assert(j ==
      """{"t11_bpe_tokens":{"load1":2.83,"cpu_wall":0.41},"s2_stream_window":{"load1":0.55,"cpu_wall":12.00}}""")
    // empty env renders an empty object, never a malformed fragment
    assert(Bench.queryEnvJson(Nil) == "{}")
  }
}
