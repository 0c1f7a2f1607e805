package graft.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the RAG/embedding-ingest shape:
  * every document becomes overlapping fixed-size token windows
  * (size 64, stride 48 → 16-token overlap) so no retrieval-relevant
  * span is cut at a hard boundary.
  *
  * Scale notes: chunking is embarrassingly row-local — one projection
  * with a generator, no shuffle at all; output size is
  * ceil(tokens/stride) per doc, known up front. The token array is
  * materialized ONCE per row and sliced per window (not re-split per
  * chunk); a 100 TB corpus chunks at scan speed and the downstream
  * embed/dedup stages key on (doc_id, chunk_idx). Chunk starts come
  * from `sequence(0, n−1, stride)`, so the last (possibly short)
  * window always exists and windows never start past the text.
  */
object Chunking {

  private val Size = 64
  private val Stride = 48

  // --------------------------------------------------------------- #55
  /** One row per (doc, chunk): index, token count, and the chunk text
    * re-joined with single spaces. Whitespace-token based (the corpus
    * is single-spaced); a BPE front would swap the tokenizer, not the
    * windowing. */
  def chunkOverlap(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0, n - 1, $Stride)")).as("s"))
      .withColumn("chunk_toks", expr(s"slice(toks, s + 1, $Size)"))
      .select(col("doc_id"),
        (col("s") / Stride).cast("long").as("chunk_idx"),
        size(col("chunk_toks")).cast("long").as("chunk_len"),
        array_join(col("chunk_toks"), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  val chunkOverlapOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, toks,
       |    unnest(range(0, len(toks), $Stride)) AS s
       |  FROM d
       |)
       |SELECT doc_id,
       |  CAST(s // $Stride AS BIGINT) AS chunk_idx,
       |  CAST(len(toks[s + 1 : s + $Size]) AS BIGINT) AS chunk_len,
       |  array_to_string(toks[s + 1 : s + $Size], ' ') AS chunk_text
       |FROM s ORDER BY doc_id, chunk_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_chunk_overlap" -> (chunkOverlap _))

  val oracles: Map[String, String] = Map(
    "doc_chunk_overlap" -> chunkOverlapOracle)
}
