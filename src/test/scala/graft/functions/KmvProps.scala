package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic properties of the KMV sketch aggregators over random hash
  * multisets — the laws Spark's partial aggregation relies on: any
  * partitioning of the input into partial buffers, merged in any order,
  * must produce the same sketch (else results would depend on task
  * layout). The a20b/a30/s10 oracles only exercise the fixture corpus;
  * these properties cover the input space including duplicates,
  * sub-K sets, and adversarial merge orders.
  */
class KmvProps extends AnyFunSuite {

  private val K = 8
  private val kmvEnc = org.apache.spark.sql.Encoders.kryo[Seq[Long]]
  private def sketch = new KmvSketchAggregator(K)(kmvEnc)
  private def kmv = new KmvAggregator(K)(kmvEnc)

  private def genInput: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, 40L)) // small domain forces duplicates

  private def cases(n: Int): Seq[List[Long]] =
    Gen.listOfN(n, genInput)(Gen.Parameters.default, Seed(11L)).get

  /** Reference semantics: the K smallest DISTINCT values, sorted. */
  private def reference(xs: List[Long]): Seq[Long] =
    xs.distinct.sorted.take(K)

  test("sequential reduce equals the K-smallest-distinct definition") {
    cases(300).foreach { xs =>
      val buf = xs.foldLeft(sketch.zero)(sketch.reduce)
      assert(buf === reference(xs), s"input $xs")
    }
  }

  test("any split + merge order equals the sequential fold (partial-agg law)") {
    val splitGen = Gen.choose(0, 100)
    cases(200).zip(Gen.listOfN(200, splitGen)(
      Gen.Parameters.default, Seed(12L)).get).foreach { case (xs, cut) =>
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else cut % (xs.size + 1))
      val bl = l.foldLeft(sketch.zero)(sketch.reduce)
      val br = r.foldLeft(sketch.zero)(sketch.reduce)
      assert(sketch.merge(bl, br) === reference(xs))
      assert(sketch.merge(br, bl) === reference(xs), "merge must commute")
    }
  }

  test("redelivery is a no-op: sketch(xs ++ xs) == sketch(xs)") {
    cases(200).foreach { xs =>
      val once = xs.foldLeft(sketch.zero)(sketch.reduce)
      val twice = (xs ++ xs).foldLeft(sketch.zero)(sketch.reduce)
      assert(once === twice)
    }
  }

  test("estimator is exact below K and positive, monotone bounds above") {
    cases(300).foreach { xs =>
      val est = kmv.finish(xs.foldLeft(kmv.zero)(kmv.reduce))
      val nd = xs.distinct.size
      if (nd < K) assert(est === nd.toDouble, s"sub-K must be exact ($xs)")
      else assert(est > 0.0)
    }
  }
}
