package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.functions.{md5Prefix60, tokens, wordShingles}

/** The composed training-data curation pipeline — the end-to-end use case
  * every individual operator exists for: language-ID → quality filters →
  * repetition filter → exact dedup → stable split, emitting one decision
  * record per document.
  *
  * Shape at scale: every feature is a per-row column pipeline fused into
  * the scan (no UDFs, no explode); the ONLY shuffle is the exact-dedup
  * groupBy on the content fingerprint — so the whole pipeline over 100 TB
  * is one pass + one hash shuffle of (fp, doc_id) pairs, then a narrow
  * fp-join back. Thresholds are fixed policy constants; the point graded
  * here is the composition, not the numbers.
  */
object CurationPipeline extends QueryPack {

  private val StopRatioMin = 0.05
  private val StopRatioMax = 0.6
  private val MaxDupGramRatio = 0.5
  private val TrainPct = 90

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline1_curation" -> ((s, dir) => {
      val ws = tokens(col("text"))
      val grams = wordShingles(col("text"), 3, distinct = false)
      val scores = TextPack.markers.map { case (l, ms) => l -> TextPack.countIn(ws, ms) }
      val Seq(en, de, fr, es) = scores.map(_._2)
      val guess = when(en >= de && en >= fr && en >= es, "en")
        .when(de >= fr && de >= es, "de")
        .when(fr >= es, "fr")
        .otherwise("es")
      val stopRatio = TextPack.countIn(ws, TextPack.stopwords).cast("double") / size(ws)
      val dupRatio = when(size(grams) > 0,
        (size(grams) - size(array_distinct(grams))).cast("double") / size(grams))
        .otherwise(lit(0.0))
      val feat = Tables(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        guess.as("guessed_lang"),
        stopRatio.as("stop_ratio"),
        dupRatio.as("dup_ratio"),
        md5(col("text")).as("fp"),
        pmod(md5Prefix60(col("text")), lit(100)).as("bucket"))
      val canon = feat.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
      feat.join(canon, "fp")
        .select(col("doc_id"),
          (col("guessed_lang") === col("lang")).cast("int").as("lang_ok"),
          (col("stop_ratio") >= StopRatioMin && col("stop_ratio") <= StopRatioMax)
            .cast("int").as("quality_ok"),
          (col("dup_ratio") <= MaxDupGramRatio).cast("int").as("repetition_ok"),
          (col("doc_id") === col("keep_id")).cast("int").as("is_canonical"),
          when(col("bucket") < TrainPct, "train").otherwise("val").as("split"))
        .withColumn("keep",
          (col("lang_ok") === 1 && col("quality_ok") === 1 &&
            col("repetition_ok") === 1 && col("is_canonical") === 1).cast("int"))
        .orderBy("doc_id")
    })
  )

  override def oracles: Map[String, String] = Map(
    "pipeline1_curation" -> {
      val scoreCols = TextPack.markers.map { case (l, ms) =>
        s"CAST(${TextPack.countInSql(ms)} AS INTEGER) AS s_$l" }.mkString(",\n    ")
      s"""WITH w AS (SELECT doc_id, lang, text, string_split(text, ' ') AS ws FROM documents),
         |g AS (
         |  SELECT *, CASE WHEN len(ws) >= 3
         |    THEN list_transform(range(1, len(ws) - 1),
         |                        i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])
         |    ELSE [] END AS gs
         |  FROM w),
         |feat AS (
         |  SELECT doc_id, lang,
         |    $scoreCols,
         |    CAST(${TextPack.countInSql(TextPack.stopwords)} AS DOUBLE) / len(ws) AS stop_ratio,
         |    CASE WHEN len(gs) > 0
         |      THEN CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE) / len(gs)
         |      ELSE CAST(0 AS DOUBLE) END AS dup_ratio,
         |    md5(text) AS fp,
         |    CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 100 AS bucket
         |  FROM g),
         |canon AS (SELECT fp, min(doc_id) AS keep_id FROM feat GROUP BY fp),
         |lab AS (
         |  SELECT f.doc_id,
         |    CAST((CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |               WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
         |               WHEN s_fr >= s_es THEN 'fr'
         |               ELSE 'es' END) = f.lang AS INTEGER) AS lang_ok,
         |    CAST(stop_ratio >= $StopRatioMin AND stop_ratio <= $StopRatioMax AS INTEGER) AS quality_ok,
         |    CAST(dup_ratio <= $MaxDupGramRatio AS INTEGER) AS repetition_ok,
         |    CAST(f.doc_id = c.keep_id AS INTEGER) AS is_canonical,
         |    CASE WHEN bucket < $TrainPct THEN 'train' ELSE 'val' END AS split
         |  FROM feat f JOIN canon c USING (fp))
         |SELECT doc_id, lang_ok, quality_ok, repetition_ok, is_canonical, split,
         |  CAST(lang_ok = 1 AND quality_ok = 1 AND repetition_ok = 1
         |       AND is_canonical = 1 AS INTEGER) AS keep
         |FROM lab ORDER BY doc_id""".stripMargin
    }
  )
}
