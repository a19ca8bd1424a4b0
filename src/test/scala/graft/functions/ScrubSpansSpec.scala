package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite

class ScrubSpansSpec extends SparkSuite {
  import spark.implicits._

  private def run(text: String, starts: Seq[Int], w: Int = 3): (Long, Long, String) = {
    val r = ScrubSpans.scrub(UTF8String.fromString(text),
      new GenericArrayData(starts.toArray), w)
    (r.getLong(0), r.getLong(1), r.getUTF8String(2).toString)
  }

  test("no starts: text survives byte-identically, zero scrubbed") {
    assert(run("a b c d", Nil) == ((4L, 0L, "a b c d")))
    assert(run("", Nil) == ((1L, 0L, ""))) // split("") = [""], one empty word
  }

  test("one span covers w positions; survivors keep order and separators") {
    assert(run("a b c d e", Seq(1)) == ((5L, 3L, "a e")))
  }

  test("overlapping and duplicate starts count each position once") {
    // spans at 0 and 1 cover {0,1,2,3}; duplicate 0 adds nothing
    assert(run("a b c d e", Seq(0, 1, 0)) == ((5L, 4L, "e")))
  }

  test("full scrub yields empty string, not null (the coalesce contract)") {
    assert(run("a b c", Seq(0)) == ((3L, 3L, "")))
  }

  test("empty tokens from double spaces are positions too") {
    // "a  b" splits to [a, '', b]; span at 0 covers all three
    assert(run("a  b", Seq(0)) == ((3L, 3L, "")))
    // untouched doc re-joins to the original, double space preserved
    assert(run("a  b c d", Nil) == ((5L, 0L, "a  b c d")))
  }

  test("out-of-range starts are clamped, never throw or escape") {
    assert(run("a b c d", Seq(3, -1, 99)) == ((4L, 3L, "c"))) // 3 covers {3}, -1 covers {0,1}
  }

  test("query path (codegen) matches the relational round-11 formulation on the fixture") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, sf("sf0.001"), "documents").limit(200)
    // relational reference: posexplode words, cover via exploded sequences
    val grams = docs.where(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"),
        posexplode(shingle_hashes_bag(col("text"), 3)).as(Seq("start", "g")))
    val hot = grams.select("doc_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("df"))
      .where(col("df") > 2).select("g")
    val covered = grams.join(hot, "g")
      .select(col("doc_id"), explode(sequence(col("start"), col("start") + 2)).as("pos"))
      .distinct()
    val words = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val reference = words
      .join(covered.withColumn("cov", lit(1)), Seq("doc_id", "pos"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), count(col("cov")).as("n_scrubbed"),
        coalesce(expr("listagg(CASE WHEN cov IS NULL THEN w END, ' ') " +
          "WITHIN GROUP (ORDER BY pos)"), lit("")).as("clean_text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val starts = grams.join(hot, "g")
      .groupBy("doc_id").agg(collect_list(col("start")).as("starts"))
    val got = docs.join(starts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        scrub_spans(col("text"), coalesce(col("starts"), array().cast("array<int>")), 3).as("r"))
      .select(col("doc_id"), col("r.n_words"), col("r.n_scrubbed"), col("r.clean_text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == reference)
    assert(got.values.exists(_._2 > 0)) // the threshold bites on this corpus
  }
}
