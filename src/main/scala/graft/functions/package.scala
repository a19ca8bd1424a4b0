package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level function library for the engine's extension operators.
  * Everything here is either a codegen'd built-in composition or a native
  * Catalyst expression — no Scala/Python UDFs in any hot path.
  */
package object functions {

  import org.apache.spark.sql.graftshim.{columnOf, exprOf}

  /** Fused single-pass cosine similarity (native codegen expression). */
  def cosine_similarity(a: Column, b: Column): Column =
    columnOf(CosineSimilarity(exprOf(a), exprOf(b)))

  /** Cosine similarity via built-in higher-order functions — the
    * no-custom-code formulation, kept as a baseline/fallback. Allocates an
    * intermediate array per row; prefer [[cosine_similarity]].
    */
  def cosine_similarity_hof(a: Column, b: Column): Column = {
    def dbl(c: Column): Column = c.cast("double")
    val dot = aggregate(zip_with(a, b, (x, y) => dbl(x) * dbl(y)),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(a, lit(0.0), (acc, v) => acc + dbl(v) * dbl(v))
    val nb = aggregate(b, lit(0.0), (acc, v) => acc + dbl(v) * dbl(v))
    when(na =!= 0.0 && nb =!= 0.0, dot / (sqrt(na) * sqrt(nb)))
  }

  /** Winnowing fingerprints of a document (native codegen expression):
    * sorted distinct sliding-window minima of a Karp–Rabin rolling hash
    * over 8-char grams. See [[WinnowFingerprints]].
    */
  def winnow_fingerprints(text: Column): Column =
    columnOf(WinnowFingerprints(exprOf(text)))

  /** k-means/IVF assignment: 0-based index of the nearest centroid
    * (squared euclidean, ties to lowest index) as a compiled projection —
    * no shuffle, no row multiplication. See [[NearestCentroid]].
    */
  def nearest_centroid(vec: Column, centroids: Column): Column =
    columnOf(NearestCentroid(exprOf(vec), exprOf(centroids)))

  /** Two-level (coarse group, then member) centroid assignment returning
    * the GLOBAL centroid id — constant-size compiled kernel at any group
    * count. See [[NearestCentroidTwoLevel]].
    */
  def nearest_centroid_two_level(vec: Column, groupCents: Column,
      memberCents: Column, memberIds: Column): Column =
    columnOf(NearestCentroidTwoLevel(exprOf(vec), exprOf(groupCents),
      exprOf(memberCents), exprOf(memberIds)))

  /** The ONE table of SQL-callable custom expressions: name → builder.
    * Both registration paths consume it — [[registerAll]] for an
    * already-built session and [[graft.GraftExtensions]] for
    * `spark.sql.extensions` — so the two surfaces cannot drift
    * (previously each path listed functions by hand and the extensions
    * path silently lacked five of them).
    */
  val sqlFunctions: Seq[
      (String, Class[_], Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    ("cosine_similarity", classOf[CosineSimilarity],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs.head, exprs(1))),
    ("winnow_fingerprints", classOf[WinnowFingerprints],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WinnowFingerprints(exprs.head)),
    ("nearest_centroid", classOf[NearestCentroid],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NearestCentroid(exprs.head, exprs(1))),
    ("shingle_hashes", classOf[ShingleHashes],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShingleHashes(exprs.head, exprs(1))),
    ("shingle_hashes_bag", classOf[ShingleHashesBag],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShingleHashesBag(exprs.head, exprs(1))),
    ("count_in", classOf[CountIn],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CountIn(exprs.head, exprs(1))),
    ("bpe_token_count", classOf[BpeTokenCount],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BpeTokenCount(exprs.head, exprs(1), exprs(2))),
    ("bloom_hits", classOf[BloomHits],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BloomHits(exprs.head, exprs(1), exprs(2))),
    ("bigram_context_hashes", classOf[BigramContextHashes],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BigramContextHashes(exprs.head)),
    ("lsh_bucket_codes", classOf[LshBucketCodes],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        LshBucketCodes(exprs.head, exprs(1), exprs(2))),
    ("sq8_cosine", classOf[Sq8Cosine],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Sq8Cosine(exprs.head, exprs(1), exprs(2), exprs(3))),
    ("sign_bits", classOf[SignBits],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SignBits(exprs.head)),
    ("scrub_spans", classOf[ScrubSpans],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ScrubSpans(exprs.head, exprs(1), exprs(2))),
    ("alpha_word_count", classOf[AlphaWordCount],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        AlphaWordCount(exprs.head)),
    ("nearest_centroids", classOf[NearestCentroids],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NearestCentroids(exprs.head, exprs(1), exprs(2))),
    ("repetition_stats", classOf[RepetitionStats],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RepetitionStats(exprs.head)),
    ("c4_lines", classOf[C4Lines],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        C4Lines(exprs.head)))

  /** Register SQL-callable names for the custom expressions. */
  def registerAll(spark: SparkSession): Unit = {
    sqlFunctions.foreach { case (name, _, build) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, build, "scala_udf")
    }
    // Aggregate surface: the KMV distinct sketch as a SQL aggregate
    // (`SELECT kmv_distinct(h) FROM ... GROUP BY ...`) — the typed
    // Aggregator wrapped via functions.udaf, K=64 as in a20b/a30/s10.
    spark.udf.register("kmv_distinct",
      org.apache.spark.sql.functions.udaf(
        new KmvAggregator(64)(org.apache.spark.sql.Encoders.kryo[Seq[Long]]),
        org.apache.spark.sql.Encoders.scalaLong))
    // ... and the bottom-K-by-hash uniform sampler as its quantile-sketch
    // sibling (`SELECT hash_sample(h, x) FROM ... GROUP BY ...` returns
    // the sampled payloads in hash order as ARRAY<BIGINT> — session
    // implicit encoders, not kryo, so SQL consumers get a real array
    // column they can sort/index), K=128 as in a43/s16.
    spark.udf.register("hash_sample",
      org.apache.spark.sql.functions.udaf(
        new HashSampleAggregator(128)(
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]](),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong)))
  }

  /** Word tokens (single-space-separated corpus; see FIXTURES.md). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word w-shingles over a PRE-SPLIT token array column, e.g. 3-grams
    * joined by spaces. Codegen'd HOF pipeline: transform over an index
    * sequence. `distinct = false` skips the per-row set build — correct
    * whenever the consumer is duplicate-invariant (e.g. MinHash: min over
    * a bag == min over the set); keep `distinct = true` where set
    * semantics matter (Jaccard).
    *
    * Callers must project the token array into its own column first
    * (`.select(tokens(col("text")).as("toks"), ...)`): Catalyst does NOT
    * common-subexpression-eliminate across lambda boundaries, so passing
    * `tokens(text)` directly inlines the split into every `element_at` —
    * each of the w lookups per gram re-splits the whole text, turning an
    * O(tokens) projection into O(tokens²) (measured 4.4 s vs 0.6 s on
    * t12 at sf0.1).
    */
  def wordShinglesOf(ws: Column, w: Int, distinct: Boolean = true): Column = {
    // sequence(1, n) runs DESCENDING when n < 1 (a 2-token doc at w=3
    // yields [1, 0], and element_at(ws, 0) throws in every SQL mode) —
    // guard to an empty gram list so short documents mean "no shingles",
    // not a per-row crash the caller must pre-filter away.
    val grams = when(size(ws) >= w,
      transform(
        sequence(lit(1), size(ws) - lit(w - 1)),
        i => concat_ws(" ", (0 until w).map(o => element_at(ws, i + lit(o))): _*)))
      .otherwise(array().cast("array<string>"))
    if (distinct) array_distinct(grams) else grams
  }

  /** Fused SQ8 quantize→decode→cosine scoring (native codegen
    * expression). See [[Sq8Cosine]].
    */
  def sq8_cosine(vec: Column, los: Column, his: Column, q: Column): Column =
    columnOf(Sq8Cosine(exprOf(vec), exprOf(los), exprOf(his), exprOf(q)))

  /** Binary (sign) quantization to 32-bit-packed words. See [[SignBits]]. */
  def sign_bits(vec: Column): Column = columnOf(SignBits(exprOf(vec)))

  /** Multi-table LSH bucket codes in one fused pass. See
    * [[LshBucketCodes]].
    */
  def lsh_bucket_codes(vec: Column, planes: Column, planesPerTable: Int): Column =
    columnOf(LshBucketCodes(exprOf(vec), exprOf(planes), exprOf(lit(planesPerTable))))

  /** Distinct polynomial hashes of the word w-shingles of a document —
    * compiled shingle construction + hashing in one expression. See
    * [[ShingleHashes]].
    */
  def shingle_hashes(text: Column, w: Int): Column =
    columnOf(ShingleHashes(exprOf(text), exprOf(lit(w))))

  /** Positional (bag) w-shingle hashes — one per occurrence, document
    * order. For duplicate-counting consumers (t12's bigram frequencies).
    * See [[ShingleHashesBag]].
    */
  def shingle_hashes_bag(text: Column, w: Int): Column =
    columnOf(ShingleHashesBag(exprOf(text), exprOf(lit(w))))

  /** Per-transition (context-hash, bigram-hash) structs in document
    * order — one compiled pass for bigram-LM consumers (t19). See
    * [[BigramContextHashes]].
    */
  def bigram_context_hashes(text: Column): Column =
    columnOf(BigramContextHashes(exprOf(text)))

  /** Rebuild a document with its hot w-gram spans excised — one compiled
    * pass returning (n_words, n_scrubbed, clean_text). See [[ScrubSpans]].
    */
  def scrub_spans(text: Column, starts: Column, w: Int): Column =
    columnOf(ScrubSpans(exprOf(text), exprOf(starts), exprOf(lit(w))))

  /** Compiled count of space-separated words containing an ASCII letter
    * (the Gopher alpha-word rule). See [[AlphaWordCount]].
    */
  def alpha_word_count(text: Column): Column =
    columnOf(AlphaWordCount(exprOf(text)))

  /** All fifteen Gopher-A1.2 repetition counters of a document in one
    * compiled pass (lines/paragraphs/top- and dup-n-gram character
    * masses). See [[RepetitionStats]].
    */
  def repetition_stats(text: Column): Column =
    columnOf(RepetitionStats(exprOf(text)))

  /** C4 line-level cleaning in one compiled pass — kept-line rebuild plus
    * the page-gate signals. See [[C4Lines]].
    */
  def c4_lines(text: Column): Column =
    columnOf(C4Lines(exprOf(text)))

  /** The p nearest centroid indices, closest first — the multi-probe
    * assignment projection. See [[NearestCentroids]].
    */
  def nearest_centroids(vec: Column, centroids: Column, p: Int): Column =
    columnOf(NearestCentroids(exprOf(vec), exprOf(centroids), exprOf(lit(p))))

  /** Compiled bag-count of tokens appearing in a small literal word list
    * (marker/stopword counting). See [[CountIn]].
    */
  def count_in(ws: Column, words: Seq[String]): Column =
    columnOf(CountIn(exprOf(ws), exprOf(lit(words.toArray))))

  /** Compiled per-document BPE token count under a learned merge table
    * (priority-ordered (left, right) pairs). See [[BpeTokenCount]].
    */
  def bpe_token_count(text: Column, merges: Seq[(String, String)]): Column =
    columnOf(BpeTokenCount(exprOf(text),
      exprOf(lit(merges.map(_._1).toArray)),
      exprOf(lit(merges.map(_._2).toArray))))

  /** Compiled Bloom-filter probe count: how many hashes in the array pass
    * the k-probe filter carried by the literal bitmap. See [[BloomHits]].
    */
  def bloom_hits(hashes: Column, bits: Array[Long], k: Int): Column =
    columnOf(BloomHits(exprOf(hashes), exprOf(lit(bits)), exprOf(lit(k))))

  /** Evaluate-exactly-once barrier for an expensive projection: blocks the
    * optimizer from duplicating the expression into a pushed-down filter
    * (or past a fan exchange). Zero runtime cost, codegen passthrough.
    * See [[EvalOnce]] for when NOT to use it.
    */
  def eval_once(c: Column): Column = columnOf(EvalOnce(exprOf(c)))

  /** Cross-engine-stable 64-bit-ish hash: first 15 hex digits of md5 as a
    * positive long. Used where the DuckDB oracle must reproduce the hash
    * (Spark's xxhash64/hash have no DuckDB equivalent).
    */
  def md5Prefix60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 16-bit cross-engine hash of a string (first 4 md5 hex digits). */
  def md5Prefix16(c: Column): Column =
    conv(substring(md5(c), 1, 4), 16, 10).cast("int")
}
