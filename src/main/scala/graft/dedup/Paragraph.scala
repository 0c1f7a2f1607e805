package graft.dedup

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CCNet-style SEGMENT-level deduplication: instead of dropping whole
  * near-duplicate documents, remove the duplicated SPANS (boilerplate
  * headers, licence blocks, navigation chrome — the dominant web-crawl
  * duplication mode) and keep the rest of every document. Each doc is
  * cut into consecutive fixed-size token segments (the corpus has no
  * newline paragraphs, so the segmentation is positional); a segment
  * whose hash occurs in ≥ 2 DISTINCT documents is kept only in its
  * lowest-doc_id "keeper" and removed everywhere else, then the
  * surviving segments are re-joined in order.
  *
  * Scale design: the expensive direction would be joining the full
  * segment table to itself — instead the HOT-SEGMENT table (hashes
  * with cross-doc df ≥ 2) is computed by one map-side-partial
  * aggregation on the hash key and is SMALL (duplicated boilerplate is
  * a tiny distinct set even when its occurrence mass is huge), so it
  * broadcasts (UN-HINTED — the planner picks broadcast on statistics
  * while the hot set fits, and past autoBroadcastJoinThreshold the
  * same plan degrades to a shuffle join on the hash key; a forced
  * broadcast() here would instead OOM when the hot set grows) and the
  * corpus takes one broadcast left-join — the corpus itself shuffles
  * ONCE, on doc_id, to reassemble (and at 100 TB that reassembly can
  * ride an existing doc_id partitioning). Reassembly
  * is sort_array over an in-doc segment list — bounded by document
  * size, never by corpus size.
  *
  * Determinism: keeper = min(doc_id) per hash; segment order restored
  * by seg_idx; md5 on the exact segment text in both engines.
  *
  * Reference: the reference dedups whole streams only
  * (data-retention.ts exact-row semantics); span-level dedup is the
  * training-pipeline extension (CCNet, Wenzek et al. 2019).
  */
object Paragraph {

  private val SegTokens = 10
  private val DfThreshold = 2

  private def segments(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0, size(toks) - 1, $SegTokens)")).as("st"))
      .select(col("doc_id"),
        (col("st") / SegTokens).cast("long").as("seg_idx"),
        expr(s"array_join(slice(toks, st + 1, $SegTokens), ' ')").as("seg_text"))
      .withColumn("h", md5(col("seg_text")))

  // --------------------------------------------------------------- #58
  /** One row per document: segment counts and the deduplicated text.
    * Docs whose every segment was removed keep an empty clean_text
    * (the downstream length/quality gate drops them). */
  def dedupParagraph(spark: SparkSession, dir: String): DataFrame = {
    val seg = segments(spark, dir)
    val hot = seg.groupBy("h")
      .agg(countDistinct("doc_id").as("df"), min("doc_id").as("keeper"))
      .filter(col("df") >= DfThreshold)
      .select("h", "keeper")
    seg.join(hot, Seq("h"), "left")
      .withColumn("keep", col("keeper").isNull || col("doc_id") === col("keeper"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept_segs"),
        array_join(
          expr("transform(sort_array(collect_list(CASE WHEN keep THEN struct(seg_idx, seg_text) END)), x -> x.seg_text)"),
          " ").as("clean_text"))
      .orderBy("doc_id")
  }

  val dedupParagraphOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), s AS (
       |  SELECT doc_id, unnest(range(0, len(toks), $SegTokens)) AS st, toks
       |  FROM d
       |), seg AS (
       |  SELECT doc_id, CAST(st // $SegTokens AS BIGINT) AS seg_idx,
       |    array_to_string(toks[st + 1 : st + $SegTokens], ' ') AS seg_text,
       |    md5(array_to_string(toks[st + 1 : st + $SegTokens], ' ')) AS h
       |  FROM s
       |), hot AS (
       |  SELECT h, min(doc_id) AS keeper FROM seg GROUP BY h
       |  HAVING count(DISTINCT doc_id) >= $DfThreshold
       |), k AS (
       |  SELECT seg.doc_id, seg.seg_idx, seg.seg_text,
       |    (hot.h IS NULL OR seg.doc_id = hot.keeper) AS keep
       |  FROM seg LEFT JOIN hot ON seg.h = hot.h
       |)
       |SELECT doc_id, count(*) AS n_segs,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_segs,
       |  coalesce(string_agg(CASE WHEN keep THEN seg_text END, ' '
       |    ORDER BY seg_idx), '') AS clean_text
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_paragraph" -> (dedupParagraph _))

  val oracles: Map[String, String] = Map(
    "dedup_paragraph" -> dedupParagraphOracle)
}
