package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite

/** Property tests for the compiled hash expressions against independent
  * in-memory reference folds, over random strings including unicode —
  * fixed seeds for reproducibility. These are the kernels every dedup /
  * fingerprint query rides on; the oracle only exercises them on the
  * fixture corpus, so the property pass covers the input space.
  */
class HashProps extends SparkSuite {

  private val genWord: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf("café", "ümläut", "naïve", "日本語", "", "a"))
  private val genText: Gen[String] =
    Gen.listOfN(20, genWord).map(_.mkString(" "))

  private def samples(n: Int): Seq[String] = {
    val gen = Gen.listOfN(n, genText)
    gen(org.scalacheck.Gen.Parameters.default, Seed(42L)).get
  }

  private def polyHash(s: String): Long =
    s.codePoints.toArray.foldLeft(0L)((acc, c) =>
      (acc * WinnowFingerprints.Base + c) % WinnowFingerprints.Mod)

  test("ShingleHashes ≡ hash of each joined shingle string (random texts)") {
    samples(200).foreach { t =>
      val words = t.split(" ", -1)
      val expect = (0 to words.length - 3)
        .map(i => polyHash(words.slice(i, i + 3).mkString(" ")))
        .distinct.sorted
      val got = ShingleHashes.hashes(UTF8String.fromString(t), 3)
        .toLongArray().toSeq
      assert(got == expect, s"text: $t")
    }
  }

  test("WinnowFingerprints ≡ naive gram-hash + window-min + distinct (random texts)") {
    samples(200).foreach { t =>
      val cps = t.codePoints.toArray
      val g = WinnowFingerprints.GramLen
      val ng = cps.length - g + 1
      val expect =
        if (ng <= 0) Seq.empty[Long]
        else {
          val h = (0 until ng).map(i => polyHash(new String(cps, i, g)))
          (0 until ng).map(i =>
            h.slice(i, math.min(i + WinnowFingerprints.WindowLen, ng)).min)
            .distinct.sorted
        }
      val got = WinnowFingerprints.javaWinnow(UTF8String.fromString(t))
        .toLongArray().toSeq
      assert(got == expect, s"text: $t")
    }
  }

  test("Sq8Cosine.kernel ≡ decode-then-cosine reference, total on degenerate dims") {
    // Reference implementation: materialize the decoded vector, then a
    // plain sequential cosine — structurally different from the fused
    // kernel, guarded division, provably no Inf/NaN intermediates.
    def reference(v: Array[Float], lo: Array[Double], hi: Array[Double],
        q: Array[Float]): Double = {
      val n = Seq(v.length, q.length, lo.length, hi.length).min
      val de = Array.tabulate(n) { i =>
        if (hi(i) > lo(i))
          lo(i) + Math.round((v(i).toDouble - lo(i)) * 255.0 / (hi(i) - lo(i))) *
            (hi(i) - lo(i)) / 255.0
        else lo(i)
      }
      val dot = (0 until n).map(i => de(i) * q(i).toDouble).sum
      val na = de.map(x => x * x).sum
      val nb = (0 until n).map(i => q(i).toDouble * q(i).toDouble).sum
      if (na == 0.0 || nb == 0.0) Double.NaN
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val genDim = Gen.chooseNum(-5.0, 5.0)
    val dims = 12
    val cases = Gen.listOfN(300,
      for {
        v <- Gen.listOfN(dims, Gen.chooseNum(-5.0f, 5.0f))
        q <- Gen.listOfN(dims, Gen.chooseNum(-5.0f, 5.0f))
        bounds <- Gen.listOfN(dims, for {
          a <- genDim; b <- genDim
          // ~1/3 of dims degenerate: hi == lo (incl. exactly 0.0)
          deg <- Gen.chooseNum(0, 2)
        } yield if (deg == 0) (math.min(a, b), math.min(a, b))
                else (math.min(a, b), math.max(a, b)))
      } yield (v.toArray, q.toArray, bounds.map(_._1).toArray, bounds.map(_._2).toArray)
    )(Gen.Parameters.default, Seed(99L)).get
    cases.foreach { case (v, q, lo, hi) =>
      val got = Sq8Cosine.kernel(v, lo, hi, q)
      val exp = reference(v, lo, hi, q)
      assert(
        (got.isNaN && exp.isNaN) || got == exp,
        s"v=${v.toSeq} lo=${lo.toSeq} hi=${hi.toSeq} q=${q.toSeq}: $got != $exp")
    }
    // fully-degenerate bounds with lo == 0 everywhere: zero decoded norm
    // must surface as the NaN->null contract, not an Inf/NaN artifact
    val z = Sq8Cosine.kernel(Array(1f, 2f), Array(0.0, 0.0), Array(0.0, 0.0),
      Array(1f, 1f))
    assert(z.isNaN)
  }

  test("NearestCentroid ≡ argmin of squared distances (random vectors)") {
    val genVec = Gen.listOfN(8, Gen.chooseNum(-10.0f, 10.0f))
    val vecs = Gen.listOfN(100, genVec)(Gen.Parameters.default, Seed(7L)).get
    val cents = Gen.listOfN(5, genVec)(Gen.Parameters.default, Seed(8L)).get
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val centArr = new GenericArrayData(
      cents.map(c => new GenericArrayData(c.toArray)).toArray[Any])
    vecs.foreach { v =>
      val expect = cents.zipWithIndex.map { case (c, i) =>
        (v.zip(c).map { case (x, y) =>
          (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum, i)
      }.min._2
      val got = NearestCentroid.nearest(
        new GenericArrayData(v.toArray), centArr)
      assert(got == expect, s"vec: $v")
    }
  }
}
