package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pattern scrubbing — the PII-redaction stage of a training-data
  * pipeline: replace every match of a sensitive-pattern set with a
  * redaction token, and report what was touched (docs hit, match
  * count, size delta) so the pipeline can audit scrub coverage.
  *
  * Spark-first: `regexp_replace`/`regexp_extract_all` are codegen'd
  * per-row projections — no shuffle, no UDF; the only aggregation is
  * the audit rollup. On real corpora the pattern set is emails /
  * phone numbers / api keys; the demo instance masks corpus entity
  * terms so the oracle exercises non-zero redactions on the synthetic
  * word-soup text. Patterns stay in the RE2-compatible subset (no
  * backrefs, no lookaround) so Spark's Java regex and DuckDB's RE2
  * match identically.
  */
object Scrub {

  /** Redact every match of `pattern` in `text`, returning
    * (scrubbed, n_matches) columns. */
  def scrub(text: Column, pattern: String, token: String = "[REDACTED]"): (Column, Column) =
    (regexp_replace(text, pattern, token),
      size(regexp_extract_all(text, lit(pattern), lit(0))))

  // demo pattern: whole-word entity terms present in the testdata vocab
  private val Pattern = "\\b(customer|order)\\b"

  // --------------------------------------------------------------- #54
  /** Scrub audit per language: documents touched, total redactions,
    * and the post-scrub corpus size. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val (scrubbed, hits) = scrub(col("text"), Pattern)
    Tables.documents(spark, dir)
      .withColumn("scrubbed", scrubbed)
      .withColumn("n_hits", hits)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_hits") > 0, 1L).otherwise(0L)).as("n_docs_hit"),
        sum("n_hits").as("n_redactions"),
        sum(length(col("scrubbed"))).as("scrubbed_chars"))
      .orderBy("lang")
  }

  val piiScrubOracle: String =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(COUNT(*) FILTER (WHERE regexp_matches(text, '\b(customer|order)\b')) AS BIGINT) AS n_docs_hit,
      |  CAST(SUM(len(regexp_extract_all(text, '\b(customer|order)\b'))) AS BIGINT) AS n_redactions,
      |  CAST(SUM(LENGTH(regexp_replace(text, '\b(customer|order)\b', '[REDACTED]', 'g'))) AS BIGINT) AS scrubbed_chars
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_pii_scrub" -> (piiScrub _))

  val oracles: Map[String, String] = Map(
    "text_pii_scrub" -> piiScrubOracle)
}
