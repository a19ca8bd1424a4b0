package graft.analytics

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** The binned range join must equal the brute-force O(n²) definition on
  * arbitrary event sets — including ties, bin-boundary timestamps, and
  * events with zero in-window neighbors (which must surface as
  * n_prior = 0, not disappear). Random timestamps cluster within a few
  * hours so windows and bins actually overlap.
  */
class RangeJoinProps extends SparkSuite {
  import spark.implicits._

  private val base = 1700000000L // fixed epoch anchor

  test("binned range join equals brute force on random event sets") {
    val genEvent = for {
      uid <- Gen.choose(0L, 3L)
      off <- Gen.oneOf(
        Gen.choose(0L, 4 * 3600L),         // spread
        Gen.choose(0L, 40L).map(_ * 900L), // exact bin boundaries
        Gen.const(3600L))                  // heavy tie
    } yield (uid, off)
    val graphs = Gen.listOfN(6, Gen.listOfN(80, genEvent))(
      Gen.Parameters.default, Seed(11L)).get
    graphs.foreach { raw =>
      val events = raw.zipWithIndex.map { case ((uid, off), i) =>
        (uid, i.toLong, new Timestamp((base + off) * 1000L))
      }
      val expected = events.map { case (uid, id, ts) =>
        val n = events.count { case (u2, _, t2) =>
          u2 == uid && t2.getTime > ts.getTime - 1800 * 1000L && t2.getTime < ts.getTime
        }
        id -> n.toLong
      }.toMap
      val got = RelationalPack.binnedPriorCount(
          events.toDF("user_id", "event_id", "ts"))
        .as[(Long, Long)].collect().toMap
      assert(got === expected)
    }
  }
}
