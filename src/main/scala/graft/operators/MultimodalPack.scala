package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Multimodal-column plumbing: opaque `BINARY` payloads + typed metadata,
  * with decode/feature-extraction as per-partition batch transforms.
  *
  * The container has no image/audio libraries, so the actual decoder is a
  * clearly marked STUB ([[Multimodal.decodeImageStub]]) producing
  * deterministic metadata from the bytes. Everything Spark-side — the
  * binary column schema, the typed Dataset, the `mapPartitions` batch shape
  * (the JVM analog of `mapInPandas`: one iterator per partition, amortized
  * per-batch setup), partitioning — is real and oracle-tested.
  */
object Multimodal {
  /** A media row: opaque bytes + id. At scale this is a parquet BINARY
    * column read with column pruning — metadata queries never touch it.
    */
  final case class MediaRecord(doc_id: Long, media: Array[Byte])

  final case class MediaMeta(doc_id: Long, n_bytes: Int, fake_width: Int, fake_height: Int)

  /** STUB decoder — stands in for an image decode (no codec libs in this
    * container). Deterministic on the payload so tests/oracles are stable.
    * A real deployment swaps only this function; the surrounding dataflow
    * (mapPartitions over a binary column) is production-shaped.
    */
  def decodeImageStub(bytes: Array[Byte]): MediaMeta =
    MediaMeta(-1L, bytes.length, bytes.length % 640, bytes.length % 480)

  /** Per-partition batch decode: setup cost (in a real decoder: codec
    * contexts, model weights) is paid once per partition, not per row.
    */
  def decodePartition(records: Iterator[MediaRecord]): Iterator[MediaMeta] = {
    // per-partition setup would go here (codec init etc.)
    records.map { r => decodeImageStub(r.media).copy(doc_id = r.doc_id) }
  }
}

object MultimodalPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // m1: binary ingestion + batched metadata extraction. The documents
    // table stands in for a media table (text bytes as payload).
    "m1_media_meta" -> ((s, dir) => {
      import s.implicits._
      val media: Dataset[Multimodal.MediaRecord] =
        Tables(s, dir, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
          .as[Multimodal.MediaRecord]
      media.mapPartitions(Multimodal.decodePartition)
        .toDF()
        .orderBy("doc_id")
    }),

    // m2: frame sampling — treat the payload as fixed-size frames (64
    // units), sample every 4th; the per-frame "decode" is a fingerprint
    // stand-in. The real content: a generator (explode of a strided
    // sequence) keyed to per-row metadata — the video-frame-sampling
    // dataflow shape, fully pruned/parallel.
    "m2_frame_sample" -> ((s, dir) => {
      val frames = (col("n_chars") / lit(64)).cast("int")
      Tables(s, dir, "documents")
        .where(col("n_chars") >= 64)
        .select(col("doc_id"), col("text"), frames.as("n_frames"))
        .select(col("doc_id"), col("text"), col("n_frames"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(4))).as("frame_idx"))
        .select(col("doc_id"), col("n_frames"), col("frame_idx"),
          md5(expr("substring(text, frame_idx * 64 + 1, 64)")).as("frame_fp"))
        .orderBy("doc_id", "frame_idx")
    }),

    // m3: feature extraction — media bytes → embedding vector, the stub
    // for a vision/audio encoder (a real deployment hosts model inference
    // in the same per-partition batch shape as m1). The stub projects a
    // 60-bit content hash into 8 components; each value is an exact
    // rational of the hash, so the oracle replays it bit-exactly.
    // Downstream this column is exactly what the e-stack consumes
    // (brute/LSH/IVF/PQ KNN over Array[Float]).
    "m3_media_embed" -> ((s, dir) => {
      val dim = 8
      val comps = (0 until dim).map { i =>
        (graft.functions.md5Prefix60(concat(col("text"), lit("#" + i))) % 2001 - 1000)
          .cast("double") / lit(1000)
      }
      Tables(s, dir, "documents")
        .where(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(array(comps: _*)).as(Seq("pos", "v")))
        .orderBy("doc_id", "pos")
    }),

    // m4: INTERLEAVED multimodal sequence packing — the assembly format of
    // image-text training runs: a document's sequence footprint is its
    // text tokens plus a fixed patch budget per attached image (here:
    // docs with a media payload, i.e. ≥ one m2 frame, carry MediaTokens
    // patches). The modality-weighted totals then flow through the SAME
    // scalable two-level prefix sum as x2 — packing is modality-agnostic
    // once footprints are computed, so the interleaved form costs nothing
    // extra at 100 TB.
    "m4_interleaved_pack" -> ((s, dir) => {
      val mediaTokens = when(col("n_chars") >= 64, lit(MediaTokens)).otherwise(lit(0))
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(graft.functions.tokens(col("text"))).as("n_text_tokens"),
          mediaTokens.as("n_media_tokens"))
        .withColumn("n_tokens", col("n_text_tokens") + col("n_media_tokens"))
      SamplingPack.packSequences(docs)
        .select(col("doc_id"), col("n_text_tokens"), col("n_media_tokens"),
          col("shard_id"), col("offset_in_shard"))
        .orderBy("doc_id")
    }),

    // m5: media near-dup by frame-fingerprint overlap — video-level
    // dedup the way production pipelines do it (shared frame hashes →
    // candidate pairs → overlap threshold), on m2's sampled frames. Two
    // media items are near-dups when they share ≥ half of the smaller
    // item's DISTINCT sampled fingerprints — numerator and denominator
    // count the same thing (distinct fingerprints), so byte-identical
    // videos always satisfy the predicate. Neither the TOTAL frame count
    // (a stride-4 sample can never cover half of it for ≥3-frame docs)
    // nor the sampled POSITION count (a video of one repeated frame has
    // many positions but ONE distinct fingerprint — the two-sided
    // mismatch that silently unflagged internally-repetitive identical
    // videos) is a sound denominator.
    // The frame join is df-capped exactly like
    // d13's winnowing buckets: a fingerprint appearing in > FrameDfCap
    // docs (intro cards, black frames — the video analog of stop-words)
    // is dropped BEFORE the self-join, so per-fingerprint work is
    // bounded at df² by construction and a hot frame can never explode
    // the shuffle. All counting is exact integers; the oracle replays
    // frames, cap, join, and threshold verbatim.
    "m5_media_neardup" -> ((s, dir) => {
      val frames = Tables(s, dir, "documents")
        .where(col("n_chars") >= 64)
        .select(col("doc_id"),
          (col("n_chars") / lit(64)).cast("int").as("n_frames"), col("text"))
        // stride-4 sample size: floor((n_frames-1)/4)+1 exploded rows
        .withColumn("n_sampled",
          (floor((col("n_frames") - 1) / lit(4)) + 1).cast("int"))
        .select(col("doc_id"), col("n_frames"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(4))).as("frame_idx"),
          col("text"))
        .select(col("doc_id"), col("n_frames"),
          md5(expr("substring(text, frame_idx * 64 + 1, 64)")).as("frame_fp"))
      // per-doc DISTINCT sampled-fingerprint count, PRE-cap: the
      // threshold denominator must count what the numerator counts
      val nd = frames.groupBy("doc_id")
        .agg(countDistinct(col("frame_fp")).as("n_distinct"))
      val dfreq = frames.groupBy("frame_fp")
        .agg(countDistinct(col("doc_id")).as("df"))
      val rare = frames.join(dfreq.where(col("df") <= FrameDfCap), "frame_fp")
        .join(nd, "doc_id")
      rare.as("a").join(rare.as("b"),
          col("a.frame_fp") === col("b.frame_fp") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.n_frames").as("n_frames_a"), col("b.n_frames").as("n_frames_b"),
          col("a.n_distinct").as("n_distinct_a"), col("b.n_distinct").as("n_distinct_b"))
        .agg(countDistinct(col("a.frame_fp")).as("shared_frames"))
        .where(col("shared_frames") * 2 >=
          least(col("n_distinct_a"), col("n_distinct_b")))
        .select(col("doc_a"), col("doc_b"), col("n_frames_a"),
          col("n_frames_b"), col("shared_frames"))
        .orderBy("doc_a", "doc_b")
    })
  )

  /** Image-patch budget per media-bearing document (m4). */
  private val MediaTokens = 16

  /** m5's stop-frame cap: fingerprints in more docs than this are
    * dropped before the pair join (bounds per-fingerprint work at df²).
    */
  private val FrameDfCap = 20

  override def oracles: Map[String, String] = Map(
    "m1_media_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS fake_width,
        |  CAST(octet_length(encode(text)) % 480 AS INTEGER) AS fake_height
        |FROM documents ORDER BY doc_id""".stripMargin,

    "m2_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, text, CAST(n_chars // 64 AS INTEGER) AS n_frames
        |  FROM documents WHERE n_chars >= 64),
        |f AS (SELECT doc_id, text, n_frames, unnest(range(0, n_frames, 4)) AS fi FROM d)
        |SELECT doc_id, n_frames, CAST(fi AS INTEGER) AS frame_idx,
        |  md5(substr(text, CAST(fi AS INTEGER) * 64 + 1, 64)) AS frame_fp
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // m5: m2's frame CTE, then the df cap, pair join, and half-overlap
    // threshold replayed with exact integer counting. The threshold
    // denominator is the per-doc SAMPLED-frame count (stride-4 sample
    // size), matching the Spark query.
    "m5_media_neardup" ->
      s"""WITH d AS (
        |  SELECT doc_id, text, CAST(n_chars // 64 AS INTEGER) AS n_frames
        |  FROM documents WHERE n_chars >= 64),
        |f AS (
        |  SELECT doc_id, n_frames,
        |    md5(substr(text, CAST(fi AS INTEGER) * 64 + 1, 64)) AS frame_fp
        |  FROM (SELECT doc_id, text, n_frames, unnest(range(0, n_frames, 4)) AS fi FROM d)),
        |nd AS (SELECT doc_id, count(DISTINCT frame_fp) AS n_distinct FROM f GROUP BY doc_id),
        |dfreq AS (SELECT frame_fp, count(DISTINCT doc_id) AS df FROM f GROUP BY frame_fp),
        |r AS (
        |  SELECT f.*, nd.n_distinct FROM f
        |  JOIN dfreq USING (frame_fp) JOIN nd USING (doc_id)
        |  WHERE df <= $FrameDfCap),
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.n_frames AS n_frames_a, b.n_frames AS n_frames_b,
        |    a.n_distinct AS n_distinct_a, b.n_distinct AS n_distinct_b,
        |    count(DISTINCT a.frame_fp) AS shared_frames
        |  FROM r a JOIN r b ON a.frame_fp = b.frame_fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4, 5, 6)
        |SELECT doc_a, doc_b, n_frames_a, n_frames_b, shared_frames
        |FROM p WHERE shared_frames * 2 >= least(n_distinct_a, n_distinct_b)
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Same 60-bit md5 prefix construction as the t6 oracle, per component.
    "m3_media_embed" ->
      """SELECT doc_id, CAST(i AS INTEGER) AS pos,
        |  CAST(CAST(concat('0x', substr(md5(text || '#' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT)
        |       % 2001 - 1000 AS DOUBLE) / 1000 AS v
        |FROM documents, range(0, 8) t(i)
        |WHERE doc_id < 50
        |ORDER BY doc_id, pos""".stripMargin,

    // x2's packing oracle with modality-weighted footprints.
    "m4_interleaved_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_text_tokens,
         |    CAST(CASE WHEN n_chars >= 64 THEN $MediaTokens ELSE 0 END AS INTEGER) AS n_media_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_text_tokens, n_media_tokens,
         |    CAST(sum(n_text_tokens + n_media_tokens)
         |           OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
         |         - (n_text_tokens + n_media_tokens) AS BIGINT) AS cb
         |  FROM t)
         |SELECT doc_id, n_text_tokens, n_media_tokens,
         |  cb // ${SamplingPack.Budget} AS shard_id,
         |  cb % ${SamplingPack.Budget} AS offset_in_shard
         |FROM c ORDER BY doc_id""".stripMargin
  )
}
