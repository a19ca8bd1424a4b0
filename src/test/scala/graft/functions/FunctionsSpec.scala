package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def vecsDf = Seq(
    (Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)), // identical
    (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)), // orthogonal
    (Array(1.0f, 2.0f, 3.0f), Array(-1.0f, -2.0f, -3.0f)) // opposite
  ).toDF("a", "b")

  test("CosineSimilarity expression: known geometries") {
    val out = vecsDf.select(cosine_similarity($"a", $"b").as("c"))
      .as[Double].collect().toSeq
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(1)) < 1e-12)
    assert(math.abs(out(2) + 1.0) < 1e-12)
  }

  test("expression and HOF formulations agree on real embeddings") {
    val emb = graft.Tables(spark, sf("sf0.001"), "embeddings").limit(50)
    val both = emb.crossJoin(
        emb.select($"embedding".as("e2"), $"vec_id".as("v2")).limit(5))
      .select(
        cosine_similarity($"embedding", $"e2").as("expr"),
        cosine_similarity_hof($"embedding", $"e2").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
    }
  }

  test("zero-norm and null inputs yield null") {
    val out = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f)),
      (null, Array(1.0f, 1.0f)))
      .toDF("a", "b")
      .select(cosine_similarity($"a", $"b").as("c"))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("md5 prefix hashes are stable") {
    val out = Seq("hello").toDF("s")
      .select(md5Prefix60($"s").as("h60"), md5Prefix16($"s").as("h16"))
      .collect().head
    // md5("hello") = 5d41402abc4b2a76b9719d911017c592
    assert(out.getLong(0) == java.lang.Long.parseLong("5d41402abc4b2a7", 16))
    assert(out.getInt(1) == Integer.parseInt("5d41", 16))
  }

  test("lsh_bucket_codes equals the per-plane sign formulation") {
    val planes = Seq(
      Seq(1f, -1f, 1f), Seq(-1f, -1f, 1f), Seq(1f, 1f, 1f), Seq(-1f, 1f, -1f))
    val df = Seq(
      Array(0.5f, -0.25f, 0.75f),
      Array(-1.0f, 2.0f, 0.0f),
      Array(0.0f, 0.0f, 0.0f)) // zero vector -> all dots 0 -> code 0
      .toDF("v")
    val fused = df.select(lsh_bucket_codes($"v", typedLit(planes), 2).as("c"))
      .as[Seq[Long]].collect()
    val expected = df.select($"v").as[Seq[Float]].collect().map { v =>
      val dots = planes.map(p => v.zip(p).map { case (x, g) =>
        x.toDouble * g.toDouble }.sum)
      Seq(0, 1).map { t =>
        (0 until 2).map(j => if (dots(t * 2 + j) > 0) 1L << j else 0L).sum
      }
    }
    assert(fused.toSeq == expected.toSeq)
  }

  test("wordShinglesOf produces distinct joined 3-grams") {
    val out = Seq("a b c d c d").toDF("t")
      .select(wordShinglesOf(split($"t", " "), 3).as("sh"))
      .as[Seq[String]].collect().head
    assert(out.toSet == Set("a b c", "b c d", "c d c", "d c d"))
    assert(out.length == 4)
  }

  test("count_in equals the filter+isin HOF formulation (duplicates counted)") {
    val markers = Seq("the", "and", "le", "la")
    val texts = Seq(
      "the cat and the dog and the bird", // dup markers count each time
      "no markers here at all",
      "the", "", "le le le la")
    val df = texts.toDF("t").select(split($"t", " ").as("ws"))
    val both = df.select(
        count_in($"ws", markers).as("compiled"),
        size(filter($"ws", w => w.isin(markers: _*))).as("hof"))
      .collect()
    assert(both.map(_.getInt(0)).toSeq == both.map(_.getInt(1)).toSeq)
    assert(both.head.getInt(0) == 5) // 3×the + 2×and
  }

  test("count_in ignores null tokens like isin") {
    val out = Seq(1).toDF("i")
      .select(count_in(
        array(lit("a"), lit(null.asInstanceOf[String]), lit("b"), lit("a")),
        Seq("a", "b")).as("c"))
      .collect().head.getInt(0)
    assert(out == 3)
  }

  test("bpe_token_count equals the per-word replace-chain HOF formulation") {
    val merges = Seq("a" -> "b", "ab" -> "c", "d" -> "d")
    val texts = Seq(
      "abc abd dd ddd abab",  // merge chains, non-overlap rule on "ddd"
      "",                      // no words
      "a",                     // single char word
      "  double  spaces  ",    // empty splits dropped
      "xyz unmergeable words",
      "abcabc dddd")
    val df = texts.toDF("text")
    // the exact r7 HOF formulation t18 used, as the executable reference
    val ws = filter(split($"text", " "), w => w =!= "")
    def bpeTokensHof(w: org.apache.spark.sql.Column) = {
      val seq0 = concat(lit(" "),
        concat_ws("  ", filter(split(w, ""), x => x =!= "")), lit(" "))
      val mergedSeq = merges.foldLeft(seq0) { case (c, (l, r)) =>
        replace(c, lit(s" $l  $r "), lit(s" $l$r "))
      }
      size(split(mergedSeq, "  "))
    }
    val both = df.select(
        bpe_token_count($"text", merges).as("compiled"),
        aggregate(transform(ws, w => bpeTokensHof(w)), lit(0), (a, x) => a + x)
          .as("hof"))
      .collect()
    assert(both.map(_.getInt(0)).toSeq == both.map(_.getInt(1)).toSeq,
      both.map(r => (r.getInt(0), r.getInt(1))).toSeq.toString)
    // "abc": a+b→ab, ab+c→abc ⇒ 1 token; "abd": →ab,d ⇒ 2; "dd"→1 ("d d"
    // merges); "ddd": leftmost non-overlap ⇒ dd+d ⇒ 2; "abab"→ab,ab ⇒ 2
    assert(both.head.getInt(0) == 1 + 2 + 1 + 2 + 2)
  }

  test("bloom_hits: zero false negatives, count matches a positional reference") {
    val m = 1 << 10
    val k = 3
    def positions(h: Long): Seq[Long] =
      (0 until k).map(i => (h % m + i * (1 + h % (m - 1))) % m)
    val inSet = Seq(17L, 999999937L, 123456789L, 42L)
    val bits = BloomHits.bitmap(m, inSet.flatMap(positions))
    // membership: every inserted hash hits; reference count for mixed arrays
    def refCount(hs: Seq[Long]): Int = hs.count { h =>
      positions(h).forall(p => (bits(p.toInt >>> 6) & (1L << (p & 63).toInt)) != 0)
    }
    val probes = Seq(
      inSet,                      // all inserted -> all hit
      Seq(5L, 6L, 7L, 8L, 9L),    // likely misses (reference decides)
      inSet ++ Seq(1000003L),     // mixed
      Seq.empty[Long])
    val df = probes.toDF("hs")
      .select(bloom_hits($"hs", bits, k).as("c")).as[Int].collect().toSeq
    assert(df == probes.map(refCount), s"got $df")
    assert(df.head == inSet.length) // no false negatives, ever
  }

  test("bpe_token_count agrees with the HOF formulation on real documents") {
    val merges = Seq("e" -> "r", "t" -> "h", "th" -> "e")
    val docs = graft.Tables(spark, sf("sf0.001"), "documents").limit(200)
    val ws = filter(split($"text", " "), w => w =!= "")
    def bpeTokensHof(w: org.apache.spark.sql.Column) = {
      val seq0 = concat(lit(" "),
        concat_ws("  ", filter(split(w, ""), x => x =!= "")), lit(" "))
      val mergedSeq = merges.foldLeft(seq0) { case (c, (l, r)) =>
        replace(c, lit(s" $l  $r "), lit(s" $l$r "))
      }
      size(split(mergedSeq, "  "))
    }
    val diff = docs.select(
        bpe_token_count($"text", merges).as("compiled"),
        aggregate(transform(ws, w => bpeTokensHof(w)), lit(0), (a, x) => a + x)
          .as("hof"))
      .where($"compiled" =!= $"hof").count()
    assert(diff == 0)
  }
}
