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
