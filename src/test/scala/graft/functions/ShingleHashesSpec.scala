package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite

class ShingleHashesSpec extends SparkSuite {
  import spark.implicits._

  /** Reference: build each shingle string exactly like the r1 HOF
    * pipeline (concat_ws over a word window) and Horner-hash it — the
    * formula the DuckDB oracle replays with list_reduce.
    */
  private def reference(text: String, w: Int): Seq[Long] = {
    val words = text.split(" ", -1)
    (0 to words.length - w).map { i =>
      val sh = words.slice(i, i + w).mkString(" ")
      sh.codePoints.toArray.foldLeft(0L)((acc, c) =>
        (acc * WinnowFingerprints.Base + c) % WinnowFingerprints.Mod)
    }.distinct.sorted
  }

  test("fused hash equals hash-of-joined-shingle-string") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d c d a b c",   // repeated shingles collapse
      "one two three",       // exactly one 3-shingle
      "just two",            // fewer words than w -> empty
      "döc wïth ünïcode wörds here")
    texts.foreach { t =>
      val got = ShingleHashes.hashes(UTF8String.fromString(t), 3)
        .toLongArray().toSeq
      assert(got == reference(t, 3), s"mismatch for: $t")
    }
  }

  test("codegen query path agrees with interpreted eval on real documents") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents").limit(100)
    val viaQuery = docs
      .select($"doc_id", shingle_hashes($"text", 3).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .foreach { case (id, t) =>
        val interp = ShingleHashes.hashes(UTF8String.fromString(t), 3)
          .toLongArray().toSeq
        assert(viaQuery(id) == interp, s"doc $id")
      }
  }

  test("hashes are sorted, distinct, in [0, Mod)") {
    val all = graft.Tables(spark, sf("sf0.001"), "documents")
      .select(shingle_hashes($"text", 3).as("hs"))
      .as[Seq[Long]].collect()
    all.foreach { a =>
      assert(a == a.sorted && a.distinct.size == a.size)
      assert(a.forall(v => v >= 0 && v < WinnowFingerprints.Mod))
    }
  }

  /** Bag reference: positional, duplicates kept — what t12's bigram
    * frequency model consumes.
    */
  private def bagReference(text: String, w: Int): Seq[Long] = {
    val words = text.split(" ", -1)
    (0 to words.length - w).map { i =>
      words.slice(i, i + w).mkString(" ")
        .codePoints.toArray.foldLeft(0L)((acc, c) =>
          (acc * WinnowFingerprints.Base + c) % WinnowFingerprints.Mod)
    }
  }

  test("bag variant keeps duplicates in document order") {
    val texts = Seq(
      "a b a b a b",          // "a b" ×3 and "b a" ×2, interleaved
      "one two three",
      "just",                 // fewer words than w -> empty
      "x x x x")              // one repeated shingle
    texts.foreach { t =>
      val got = ShingleHashes.bagHashes(UTF8String.fromString(t), 2)
        .toLongArray().toSeq
      assert(got == bagReference(t, 2), s"mismatch for: $t")
    }
    // and the set form is exactly sort+distinct of the bag
    texts.foreach { t =>
      assert(
        ShingleHashes.hashes(UTF8String.fromString(t), 2).toLongArray().toSeq ==
          bagReference(t, 2).distinct.sorted, s"set/bag drift for: $t")
    }
  }

  test("bag codegen query path agrees with interpreted eval") {
    val docs = graft.Tables(spark, sf("sf0.001"), "documents").limit(100)
    val viaQuery = docs
      .select($"doc_id", shingle_hashes_bag($"text", 2).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .foreach { case (id, t) =>
        assert(viaQuery(id) == bagReference(t, 2), s"doc $id")
      }
  }
}
