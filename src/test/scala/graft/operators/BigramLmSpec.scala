package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantic pins for t19's add-one bigram LM beyond the oracle hash:
  * the probability model must be internally consistent (bounds, counting
  * identity vs the tokenizer view) and must actually rank fluency —
  * repeated text scores above novel text.
  */
class BigramLmSpec extends SparkSuite {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("t19 probabilities are bounded and min <= avg") {
    val rows = TextPack.queries("t19_bigram_lm_score")(spark, dir)
      .select("doc_id", "n_trans", "min_p6", "avg_p6")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length === 500)
    rows.foreach { case (id, n, minP, avgP) =>
      assert(n >= 1, s"doc $id: no transitions")
      // add-one smoothing keeps every probability strictly inside (0, 1].
      assert(minP > 0L, s"doc $id: zero-probability transition under add-one smoothing")
      assert(avgP <= 1000000.0, s"doc $id: probability above 1")
      assert(minP.toDouble <= avgP, s"doc $id: min $minP > avg $avgP")
    }
  }

  test("t19 transition count is the tokenizer word count minus one") {
    // The bigram stream must see exactly the words the tokenizer sees —
    // a drift here means the two compiled passes split text differently.
    val trans = TextPack.queries("t19_bigram_lm_score")(spark, dir)
      .select("doc_id", "n_trans").as[(Long, Long)].collect().toMap
    val words = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(array_remove(split(col("text"), " "), "")).as("n_words"))
      .as[(Long, Int)].collect().toMap
    words.foreach { case (id, nw) =>
      assert(trans.get(id).contains(nw.toLong - 1),
        s"doc $id: n_trans ${trans.get(id)} != n_words - 1 = ${nw - 1}")
    }
  }

  test("t19 ranks repeated text above novel text") {
    // Score two synthetic docs THROUGH the corpus model by appending them
    // to the corpus: one repeats the corpus's own most frequent word
    // pair, one is gibberish no model has seen. The repetitive doc's
    // every transition is high-count; the novel doc survives on
    // smoothing alone.
    val tmp = java.nio.file.Files.createTempDirectory("graft-t19-").toString
    val docs = graft.Tables(spark, dir, "documents")
    val topPair = docs
      .select(explode(graft.functions.shingle_hashes_bag(col("text"), 2)).as("bh"))
      .groupBy("bh").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("bh")).limit(1)
    // Recover a concrete frequent bigram string by re-scanning with the
    // hash as the key (hash → string is not invertible; join back).
    val bigramStr = docs
      .select(explode(expr("filter(transform(sequence(1, size(split(text,' ')) - 1), " +
        "i -> concat(element_at(split(text,' '), i), ' ', element_at(split(text,' '), i+1))), x -> x is not null)")).as("g"))
      .withColumn("bh", graft.functions.shingle_hashes_bag(col("g"), 2)(0))
      .join(topPair, "bh").select("g").head().getString(0)
    val repeated = (bigramStr + " ") * 20 + bigramStr
    val novel = (1 to 41).map(i => s"zzqx${i}gibber${i * 7919}").mkString(" ")
    docs.select("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(Seq(
        (9001L, repeated, "xx", "synthetic", repeated.length.toLong),
        (9002L, novel, "xx", "synthetic", novel.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val scored = TextPack.queries("t19_bigram_lm_score")(spark, tmp)
      .select("doc_id", "avg_p6").as[(Long, Double)].collect().toMap
    // The margin is modest because half the repeated doc's transitions
    // are the REVERSE pair (w2 → w1, rare in the corpus) and the frequent
    // left word spreads its context mass over many continuations — 1.5×
    // still separates "predictable" from "never seen" decisively.
    assert(scored(9001L) > scored(9002L) * 1.5,
      s"repeated-text doc (${scored(9001L)}) must outscore novel doc (${scored(9002L)})")
  }

  test("pipeline5 curriculum: gate drops gibberish, phases are quality-ordered quartiles") {
    // The fixture corpus is uniform enough that nothing falls below the
    // half-mean gate — append gibberish so the fluent=0 path is real.
    val tmp = java.nio.file.Files.createTempDirectory("graft-p5-").toString
    val docs = graft.Tables(spark, dir, "documents")
    // Worst-case text for a bigram LM: novel continuations out of the
    // corpus's MOST FREQUENT context word — p(novel | frequent) has a
    // huge denominator, so the score lands far below the smoothing
    // floor a plain gibberish doc bottoms out at.
    val topWord = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("w")).head().getString(0)
    val novel = (1 to 60).map(i => s"$topWord qqzx${i}blurb${i * 7919}x").mkString(" ")
    docs.select("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(Seq((9002L, novel, "xx", "synthetic", novel.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val out = CurationPipeline.queries("pipeline5_curriculum")(spark, tmp)
      .select("doc_id", "fluent", "phase", "shard", "pos")
      .as[(Long, Int, Int, Long, Int)].collect()

    val dropped = out.filter(_._2 == 0)
    assert(dropped.map(_._1).contains(9002L), "gibberish doc must fail the fluency gate")
    dropped.foreach { case (id, _, phase, shard, pos) =>
      assert((phase, shard, pos) === ((0, -1L, 0)), s"doc $id: dropped rows carry sentinels")
    }

    val kept = out.filter(_._2 == 1)
    val byPhase = kept.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byPhase.keySet === Set(1, 2, 3, 4))
    // NTILE law: phase sizes differ by at most 1
    assert(byPhase.values.max - byPhase.values.min <= 1, s"phase sizes $byPhase")

    // quality ordering across phases: every phase-1 doc scores >= every
    // phase-4 doc (ranks are by avg_p6 DESC)
    val scores = TextPack.queries("t19_bigram_lm_score")(spark, tmp)
      .select("doc_id", "avg_p6").as[(Long, Double)].collect().toMap
    val p1Min = kept.filter(_._3 == 1).map(r => scores(r._1)).min
    val p4Max = kept.filter(_._3 == 4).map(r => scores(r._1)).max
    assert(p1Min >= p4Max, s"phase 1 min $p1Min < phase 4 max $p4Max")

    // positions are contiguous 1..n within each (phase, shard)
    kept.groupBy(r => (r._3, r._4)).foreach { case ((ph, sh), rows) =>
      val ps = rows.map(_._5).sorted
      assert(ps.toSeq === (1 to rows.length).toSeq, s"phase $ph shard $sh: $ps")
    }
  }
}
