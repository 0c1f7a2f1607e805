package graft.text

import graft.Tables
import graft.funcs.r6
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-document n-gram NOVELTY — what share of a document's distinct
  * 5-grams appear here first (by doc_id order) and nowhere earlier in
  * the corpus: the self-information weight a curation pipeline uses
  * for dedup-aware sampling (a doc that re-states earlier corpus text
  * scores near 0, fresh text near 1) — the scoring-side complement of
  * [[Pipeline2]]'s decontamination (which DROPS overlapping grams)
  * and the winnow/minhash dedup family (which pairs documents).
  */
object Novelty {

  // --------------------------------------------------------------- #77
  /** novelty(doc) = |grams first owned by doc| / |distinct grams of
    * doc|, owner = MIN doc_id over the corpus. Docs shorter than the
    * gram width have no grams and no row — identically in both
    * engines.
    *
    * Scale shape: gram extraction is the codegen'd native
    * [[graft.functions.NGrams]] expression (no interpreted lambdas);
    * the distinct (doc, gram) frame aggregates once on the gram key
    * (partial-aggregable MIN — the ngram_counts/decontaminate
    * exchange class) and the owner table joins BACK on that same gram
    * key, so Catalyst reuses the partitioning — owner-join and
    * gram-dedup share one exchange; the per-doc roll-up is the only
    * other shuffle. Corpus text is touched exactly once. */
  def novelty(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.NGrams.ngrams(split(col("text"), " "), 5)).as("ngram"))
      .distinct()
    val owner = g.groupBy("ngram").agg(min("doc_id").as("owner"))
    g.join(owner, "ngram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("owner") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", r6(col("n_novel") / col("n_grams")))
      .orderBy("doc_id")
  }

  val noveltyOracle: String = {
    val terms = (0 until 5).map(j => if (j == 0) "w[i]" else s"w[i+$j]")
      .mkString(" || ' ' || ")
    s"""WITH g AS (
       |  SELECT DISTINCT doc_id, $terms AS ngram
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |       UNNEST(range(1, GREATEST(len(w) - 3, 1))) AS r(i)
       |), o AS (
       |  SELECT ngram, MIN(doc_id) AS owner FROM g GROUP BY 1
       |)
       |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |  CAST(SUM(CASE WHEN o.owner = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |  ROUND(SUM(CASE WHEN o.owner = g.doc_id THEN 1 ELSE 0 END) / COUNT(*), 6) AS novelty
       |FROM g JOIN o USING (ngram)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_novelty" -> (novelty _))

  val oracles: Map[String, String] = Map(
    "text_novelty" -> noveltyOracle)
}
