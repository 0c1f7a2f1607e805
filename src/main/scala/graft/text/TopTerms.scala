package graft.text

import graft.Tables
import graft.funcs.r6
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document keyphrase extraction: the top TF-IDF terms of EACH
  * document — the per-doc sibling of [[Pipeline.tfidfTop]]'s
  * per-source summary, and the standard cheap keyword tagger a
  * curation pipeline attaches to every training document (topic
  * routing, dedup explanations, retrieval-index keys).
  */
object TopTerms {

  // --------------------------------------------------------------- #75
  /** Top-3 TF-IDF terms per document (ties to the lexicographically
    * smaller term — a total order, so ranks are engine-exact).
    *
    * Scale shape: tf is one partial-aggregable groupBy over the
    * exploded term frame; df (term-count-sized) and the n_docs scalar
    * broadcast back onto it — the corpus-scale frame is touched once
    * and never self-joined. The per-doc rank-3 filter compiles to a
    * WindowGroupLimit (InferWindowGroupLimit, plan-pinned): every map
    * task truncates each doc group to its local top-3 BEFORE the
    * exchange, so the window shuffle carries ≤ 3·maps rows per doc
    * rather than the full tf frame, and no task ever sorts a whole
    * partition of term rows — the rank-window formulation of the
    * bounded-heap idea ([[graft.functions.BoundedTopK]]) that keeps
    * STRING payloads native. */
  def topTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val exploded = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val tf = exploded.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = exploded.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", r6(col("tf") * r6(log(col("n_docs").cast("double") / col("df")))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select("doc_id", "rank", "term", "tf", "df", "tfidf")
      .orderBy("doc_id", "rank")
  }

  val topTermsOracle: String =
    """WITH ex AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      |), tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM ex GROUP BY 1, 2
      |), df AS (
      |  SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM ex) GROUP BY 1
      |), nd AS (SELECT COUNT(*) AS n_docs FROM documents)
      |SELECT doc_id, rank, term, tf, df, tfidf FROM (
      |  SELECT doc_id, term, tf, df,
      |    ROUND(tf * ROUND(ln(CAST(n_docs AS DOUBLE) / df), 6), 6) AS tfidf,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY ROUND(tf * ROUND(ln(CAST(n_docs AS DOUBLE) / df), 6), 6) DESC, term) AS rank
      |  FROM tf JOIN df USING (term) CROSS JOIN nd)
      |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_topterms" -> (topTerms _))

  val oracles: Map[String, String] = Map(
    "text_topterms" -> topTermsOracle)
}
