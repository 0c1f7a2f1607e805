package graft.text

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-composition operators: per-domain caps and character-level
  * entropy quality signals — two standard controls in a web-scale
  * training-data pipeline (cap any one domain's share of the mix;
  * drop degenerate low-entropy text that length/stopword gates miss,
  * e.g. repeated-character spam and base64-ish blobs).
  */
object Corpus {

  // ------------------------------------------------------ mix_domain_cap
  /** Per-domain document cap (CommonCrawl-style "no domain dominates
    * the mix"): within each source, keep a deterministic
    * hash-selected 18 documents, report per-source totals, kept
    * counts, kept characters and a kept-id checksum.
    *
    * Selection order is (md5(doc_id), doc_id) — the same engine-neutral
    * hash [[Pipeline.sampleHash]] samples with, so the "random" cap
    * survivors are identical in any engine and under any partitioning.
    * The rank-and-keep is a per-group window top-k, which Catalyst's
    * InferWindowGroupLimit turns into a per-partition bounded heap
    * BEFORE the shuffle (the sample_stratified plan shape) — the
    * corpus never fully sorts, and the cap runs map-side at 100 TB. */
  def domainCap(spark: SparkSession, dir: String): DataFrame = {
    val cap = 18
    val docs = Tables.documents(spark, dir)
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    // the rank filter sits directly on row_number so Catalyst's
    // InferWindowGroupLimit keeps a cap-sized heap per partition —
    // survivors (≤ cap·|domains| rows) are all that reach the window;
    // the totals leg is a plain partial-aggregated count
    val kept = docs
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= cap)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("kept_id_sum"),
        sum(col("n_chars")).as("kept_chars"))
    val totals = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    totals.join(kept, Seq("source"))
      .select("source", "n_docs", "n_kept", "kept_id_sum", "kept_chars")
      .orderBy("source")
  }

  val domainCapOracle: String =
    """WITH ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  COUNT(*) FILTER (WHERE rn <= 18) AS n_kept,
      |  CAST(SUM(doc_id) FILTER (WHERE rn <= 18) AS BIGINT) AS kept_id_sum,
      |  CAST(SUM(n_chars) FILTER (WHERE rn <= 18) AS BIGINT) AS kept_chars
      |FROM ranked GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------- text_entropy
  /** Character-level Shannon entropy per document, with the
    * alphabet-normalized rate and a low-entropy flag (H < 3 bits —
    * natural English sits near 4.1; repeated-char spam and tiny-
    * alphabet blobs fall far below). Per-character-class counts are
    * one (doc, char) aggregation whose result (≤ alphabet-size rows
    * per doc) feeds the per-doc reduction on the SAME key prefix —
    * the second exchange moves one row per distinct character, not
    * the corpus. Entropy terms p·log2(p) are 6-dp rounded BEFORE the
    * exact-decimal sum (order-independent, engine-identical); H comes
    * back through abs() so the H = 0 single-character case is +0.0 in
    * both engines. */
  def textEntropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), explode(split(col("text"), "")).as("ch"))
      .where(col("ch") =!= "")
      .groupBy("doc_id", "ch")
      .agg(min("n_chars").as("n_chars"), count(lit(1)).as("k"))
    val term = r6((col("k") / col("n_chars")) * log2(col("k") / col("n_chars")))
    counts
      .groupBy("doc_id")
      .agg(
        min("n_chars").as("n_chars"),
        count(lit(1)).as("distinct_chars"),
        abs(sum(term.cast(DecimalType(18, 6))).cast("double")).as("entropy_bits"))
      .withColumn("norm_entropy", when(col("distinct_chars") > 1,
        r6(col("entropy_bits") / log2(col("distinct_chars")))))
      .withColumn("low_entropy", col("entropy_bits") < 3.0)
      .select("doc_id", "n_chars", "distinct_chars", "entropy_bits",
        "norm_entropy", "low_entropy")
      .orderBy("doc_id")
  }

  val textEntropyOracle: String =
    """WITH ch AS (
      |  SELECT doc_id, n_chars, unnest(string_split(text, '')) AS ch FROM documents),
      |cnt AS (
      |  SELECT doc_id, ch, MIN(n_chars) AS n_chars, COUNT(*) AS k
      |  FROM ch WHERE ch <> '' GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, MIN(n_chars) AS n_chars, COUNT(*) AS distinct_chars,
      |    ABS(CAST(SUM(CAST(ROUND((k / n_chars) * LOG2(k / n_chars), 6)
      |      AS DECIMAL(18,6))) AS DOUBLE)) AS entropy_bits
      |  FROM cnt GROUP BY 1)
      |SELECT doc_id, n_chars, distinct_chars, entropy_bits,
      |  CASE WHEN distinct_chars > 1
      |    THEN ROUND(entropy_bits / LOG2(distinct_chars), 6) END AS norm_entropy,
      |  entropy_bits < 3.0 AS low_entropy
      |FROM agg ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mix_domain_cap" -> (domainCap _),
    "text_entropy" -> (textEntropy _))

  val oracles: Map[String, String] = Map(
    "mix_domain_cap" -> domainCapOracle,
    "text_entropy" -> textEntropyOracle)
}
