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
    // per-query stamp would not have. Spread 1.0 = trigger (a) alone.
    assert(Bench.suspectQuery(31.56, 3.2, 0.3, 1.0))
    // a busy HEALTHY query raises load1 all by itself: measured d15
    // x1000m cell at load1 20.7 / cpu_wall 23.7 — self-load, not suspect
    assert(!Bench.suspectQuery(22.77, 20.68, 23.65, 1.0))
    // calm queries and sub-floor walls are never suspects
    assert(!Bench.suspectQuery(31.56, 0.4, 0.3, 1.0))
    assert(!Bench.suspectQuery(0.8, 9.9, 0.3, 1.0))
    assert(!Bench.suspectQuery(1.99, 3.0, 0.3, 1.0))
    // boundary: at the wall/load thresholds with a starved cpu ratio
    assert(Bench.suspectQuery(2.0, 3.0, 1.99, 1.0))
    assert(!Bench.suspectQuery(2.0, 3.0, 2.0, 1.0))
  }

  test("suspect trigger (b): rep spread + starvation trips the sub-threshold blind spot") {
    // The r16 driver capture's own episode (BENCH_r16.json, launched at
    // load1 2.9 — just under 3.0): t2_quality_score reported 2.72 s vs
    // its committed calm 0.20 s (cpu_wall 1.01) and t29 5.98 s vs 2.55 s
    // calm (cpu_wall 1.82), yet ZERO trips because end-of-query load1
    // read 2.2-2.4 < ContendedLoad. Starved reps disagree with each
    // other — the same external spike never taxes two reps equally — so
    // spread + a starved reported rep trips them with no load term.
    assert(Bench.suspectQuery(2.72, 2.4, 1.01, 2.5)) // the t2 pattern
    assert(Bench.suspectQuery(5.98, 2.2, 1.82, 2.1)) // the t29 pattern
    // committed-calm pattern: reps agree (spread ~1.0-1.3) — clean
    assert(!Bench.suspectQuery(2.72, 2.4, 1.01, 1.3))
    assert(!Bench.suspectQuery(0.20, 0.5, 18.0, 1.1))
    // COLD-FIRST-REP on a calm box: the r17 x19 x1000m slope cell read
    // spread 2.37 with the reported (warm) rep at cpu_wall 22.43 — a
    // first fixture touch, not contention; the cpu term keeps it clean
    assert(!Bench.suspectQuery(21.75, 6.66, 22.43, 2.37))
    // first-rep-only starvation: min-of-2 discarded the bad rep, the
    // reported rep is healthy — the reported NUMBER is valid, no stamp
    assert(!Bench.suspectQuery(2.2, 2.8, 8.0, 3.5))
    // ONCE-PER-PROCESS setup reps (s23 stages its pocket weights in
    // rep 1 by design — spread 4.7 on a calm box with the reported rep
    // the pure serve): min-of-2 discarded the setup rep; the 2 s floor
    // keeps the correct surviving number unstamped
    assert(!Bench.suspectQuery(1.12, 2.83, 1.61, 4.7))
    // full-tilt SELF-load: a healthy heavy query's reps still agree
    // (identical work back to back) — high load1 + high cpu_wall +
    // spread ~1 stays clean under BOTH triggers
    assert(!Bench.suspectQuery(22.77, 20.68, 23.65, 1.2))
    // boundaries: spread floor 2.0, wall floor 2 s, cpu ceiling 2.0
    assert(Bench.suspectQuery(2.0, 0.1, 1.9, 2.0))
    assert(!Bench.suspectQuery(1.99, 0.1, 1.9, 9.9))
    assert(!Bench.suspectQuery(2.0, 0.1, 1.9, 1.99))
    assert(!Bench.suspectQuery(2.0, 0.1, 2.0, 9.9))
    // trigger (a) still fires on its own when reps were EQUALLY starved
    // (spread blind, load + cpu starvation visible)
    assert(Bench.suspectQuery(31.56, 3.2, 0.3, 1.0))
  }

  test("repSpread: warm-only at reps >= 3, across both at reps = 2") {
    // reps=2: the spread still contains rep 1 — the setup/cold-touch
    // ambiguity is exactly why the floor stays 2 s there
    assert(Bench.repSpread(Seq(4.7, 1.0)) == 4.7)
    // reps=3: rep 1 dropped — s23's once-per-process staging pattern
    // (weights staged in rep 1 BY DESIGN) reads ~1.05 over its warm reps
    assert(Bench.repSpread(Seq(4.7, 1.0, 1.05)) == 1.05)
    // cold fixture first-touch at reps=3: same shape, same discard
    assert(Bench.repSpread(Seq(21.7, 9.2, 9.0)) == 1.02)
    // warm reps that DISAGREE are external by construction — survives
    assert(Bench.repSpread(Seq(1.0, 0.9, 2.1)) == 2.33)
    // guards: one rep, failed (zero) wall, empty
    assert(Bench.repSpread(Seq(5.0)) == 1.0)
    assert(Bench.repSpread(Seq(5.0, 0.0)) == 1.0)
    assert(Bench.repSpread(Nil) == 1.0)
  }

  test("trigger (b) floor drops to 0.5 s only when the spread is warm-only (reps >= 3)") {
    // r17 verdict next-#2: the 2 s floor existed because the reps=2
    // spread contains the setup-ambiguous first rep; warm-only spread
    // removes the ambiguity, so the floor can come down and the stated
    // sub-2 s blind spot closes.
    assert(Bench.spreadWallFloor(1) == 2.0)
    assert(Bench.spreadWallFloor(2) == 2.0)
    assert(Bench.spreadWallFloor(3) == 0.5)
    // s23's staging pattern at reps=3: warm spread ~1.05 — unstamped at
    // ANY wall even though rep 1 read 4.7x (the r17 floor rationale,
    // now handled by the spread itself instead of the floor)
    assert(!Bench.suspectQuery(1.12, 2.83, 1.61,
      Bench.repSpread(Seq(4.7, 1.0, 1.05)), 3))
    // the r16 t2/t29 episode still trips at reps=2 (the driver default)
    assert(Bench.suspectQuery(2.72, 2.4, 1.01, 2.5))
    assert(Bench.suspectQuery(5.98, 2.2, 1.82, 2.1))
    // the formerly-stated sub-2 s blind spot CLOSES at reps=3: a 1.9 s
    // version of the r16 t2 episode (warm reps disagree 2.3x, reported
    // rep starved) now trips...
    assert(Bench.suspectQuery(1.9, 2.4, 0.8, 2.33, 3))
    // ...where reps=2 stayed blind (the stated residual at the default)
    assert(!Bench.suspectQuery(1.9, 2.4, 0.8, 2.33, 2))
    // floor boundary at reps=3 is exactly 0.5 s
    assert(Bench.suspectQuery(0.5, 0.1, 1.9, 2.0, 3))
    assert(!Bench.suspectQuery(0.49, 0.1, 1.9, 9.9, 3))
    // healthy warm reps that agree stay clean at reps=3, any wall
    assert(!Bench.suspectQuery(0.9, 0.5, 1.2, 1.1, 3))
    // trigger (a) keeps its OWN 2 s floor at any reps (its rationale —
    // a sub-2 s wall can't carry a 39x story — is about the wall, not
    // the spread)
    assert(!Bench.suspectQuery(1.9, 9.9, 0.3, 1.0, 3))
    assert(Bench.suspectQuery(2.0, 3.0, 1.99, 1.0, 3))
  }

  test("suspect fragment is empty when clean, capped at the slowest MaxSuspects when hot") {
    assert(Bench.suspectJsonFrag(Nil) == "")
    // under the cap: all suspects ride, name-ordered
    val two = Bench.suspectJsonFrag(Seq(
      ("zq", 5.0, (3.5, 0.4, 1.0)), ("aq", 9.0, (4.0, 0.2, 2.5))))
    assert(two.startsWith(""","suspect":{"""))
    assert(two.indexOf("\"aq\"") < two.indexOf("\"zq\""))
    assert(!two.contains("suspects_omitted"))
    // over the cap (the whole-run-hot regime): keep the SLOWEST 8 and
    // say how many were dropped — the stamp must never grow past the
    // driver's tail-capture budget (the BENCH_r02-r05 truncation bug)
    val many = (1 to 40).map(i => (f"q$i%02d", i.toDouble, (5.0, 0.3, 1.0)))
    val frag = Bench.suspectJsonFrag(many)
    assert(frag.contains(""""suspects_omitted":32"""), frag)
    assert(frag.contains("\"q40\"") && frag.contains("\"q33\""), frag)
    assert(!frag.contains("\"q32\""), frag)
    assert(frag.length < 600, s"fragment too large: ${frag.length}")
  }

  test("queryEnvJson renders per-query load1 + cpu_wall + spread machine-readably") {
    val j = Bench.queryEnvJson(Seq(
      "t11_bpe_tokens" -> (2.83, 0.41, 1.05),
      "s2_stream_window" -> (0.55, 12.0, 2.5)))
    // Double.toString rendering, never a locale-sensitive formatter
    // (r16 ADVICE: f"%.2f" writes "0,41" under comma-decimal locales —
    // invalid JSON in the durable BENCH.local.json record)
    assert(j ==
      """{"t11_bpe_tokens":{"load1":2.83,"cpu_wall":0.41,"spread":1.05},"s2_stream_window":{"load1":0.55,"cpu_wall":12.0,"spread":2.5}}""")
    // empty env renders an empty object, never a malformed fragment
    assert(Bench.queryEnvJson(Nil) == "{}")
  }

  test("queryEnvJson stays locale-safe under a comma-decimal default locale") {
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.GERMANY)
    try {
      val j = Bench.queryEnvJson(Seq("q" -> (0.41, 0.41, 1.05)))
      assert(j == """{"q":{"load1":0.41,"cpu_wall":0.41,"spread":1.05}}""", j)
    } finally java.util.Locale.setDefault(prev)
  }
}
