package graft.text

import graft.Tables
import graft.funcs.r6
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): pick pretraining documents from a raw pool so
  * the selected set's hashed n-gram distribution matches a target
  * corpus. Weights are bag-of-hashed-unigram log-likelihood ratios
  * between the target and raw feature distributions; selection is
  * Gumbel-top-k over log-weight + Gumbel noise, which draws k docs
  * without replacement with probability ∝ exp(log-weight) — the
  * paper's resampling step as ONE deterministic rank instead of a
  * sequential sampler.
  *
  * The reference (a telemetry store) has nothing like this; it is part
  * of the LLM-pipeline surface, the selection-side sibling of
  * [[Pipeline.sampleHash]] (rate-based) and [[Pipeline4]]'s
  * classifier (model-based): distribution-matching selection.
  */
object Dsir {

  private val B = 64 // hashed feature buckets

  /** md5-prefix hashed unigram bucket, 0..63 — content-only, so both
    * engines and every executor agree with no shared vocabulary. */
  private def bucket(term: Column): Column =
    conv(substring(md5(term), 1, 2), 16, 10).cast("int") % B

  // --------------------------------------------------------------- #96
  /** Top-40 candidate (non-'en') documents by DSIR importance weight
    * with seeded Gumbel noise; target distribution = the 'en' slice.
    *
    * Cross-engine determinism, in the order the risks appear:
    * bucket counts are exact integers; each bucket's likelihood ratio
    * is an integer-product quotient ((tc+1)(totC+B)) / ((cc+1)(totT+B))
    * — products < 2^53 so the long→double conversions are exact and
    * the one division is IEEE-identical — with the single `ln` rounded
    * 6dp (the [[Pipeline.tfidfTop]] precedent for libm last-ulp skew);
    * the per-doc score Σ n_b·lr_b is DECIMAL-summed after rounding each
    * term ([[graft.funcs.dsum]] rule: associative, partition-order
    * free); the Gumbel uniform is (md5(doc_id)[0,4) + 0.5)/2^16 so the
    * noise is a pure function of the row key, and u ∈ [7.6e-6,
    * 0.999993] keeps both ln() calls away from their singularities
    * (the inner 6dp rounding can never emit 0).
    *
    * Scale shape: the corpus-sized frame (exploded tokens) is touched
    * exactly twice, both times into partial-aggregable groupBys (64-row
    * distributions; per-doc bucket counts). The 64-row log-ratio table
    * broadcasts back onto the per-doc counts — no corpus-sized join,
    * shuffle keys are (doc_id, bucket). Selection is orderBy+limit,
    * which Spark plans as TakeOrderedAndProject: every partition keeps
    * a 40-row heap and only heads travel to the driver — no global
    * sort. At 100 TB the only growth axis is the per-doc count frame,
    * which is |docs|·(≤64) rows and aggregates map-side. */
  def sampleDsir(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val ex = docs
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("term"))
      .withColumn("b", bucket(col("term")))

    val tgt = ex.where(col("lang") === "en")
      .groupBy("b").agg(count(lit(1)).as("tc"))
    val cand = ex.where(col("lang") =!= "en")
      .groupBy("b").agg(count(lit(1)).as("cc"))
    val totT = tgt.select(sum(col("tc")).as("tott"))
    val totC = cand.select(sum(col("cc")).as("totc"))

    // all 64 buckets, +1 smoothing where a side never hashed into one
    val spine = spark.range(B).select(col("id").cast("int").as("b"))
    val lr = spine
      .join(tgt, Seq("b"), "left").join(cand, Seq("b"), "left")
      .na.fill(0L, Seq("tc", "cc"))
      .crossJoin(broadcast(totT)).crossJoin(broadcast(totC))
      .withColumn("lr", r6(log(
        ((col("tc") + 1) * (col("totc") + B)).cast("double") /
          ((col("cc") + 1) * (col("tott") + B)).cast("double"))))
      .select("b", "lr")

    val nb = ex.where(col("lang") =!= "en")
      .groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("n"))
    val scored = nb.join(broadcast(lr), "b")
      .withColumn("t", r6(col("n") * col("lr")))
      .groupBy("doc_id", "lang")
      .agg(sum(col("t").cast(DecimalType(28, 6))).cast("double").as("score"))

    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("double") + lit(0.5)) / lit(65536.0)
    val keyed = scored
      .withColumn("gumbel", r6(-log(-r6(log(u)))))
      .withColumn("gkey", r6(col("score") + col("gumbel")))
      .orderBy(col("gkey").desc, col("doc_id"))
      .limit(40)
    // rank over the already-limited 40-row frame — bounded, not a
    // corpus-wide single-partition window
    keyed
      .withColumn("rank",
        row_number().over(Window.orderBy(col("gkey").desc, col("doc_id"))))
      .select("rank", "doc_id", "lang", "score", "gkey")
      .orderBy("rank")
  }

  val sampleDsirOracle: String =
    """WITH hb AS (
      |  SELECT doc_id, lang,
      |    ((16*(strpos('0123456789abcdef', substr(md5(term),1,1))-1)
      |       + (strpos('0123456789abcdef', substr(md5(term),2,1))-1)) % 64) AS b
      |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
      |        FROM documents)
      |), spine AS (SELECT CAST(range AS INTEGER) AS b FROM range(64)),
      |tgt AS (SELECT b, COUNT(*) AS tc FROM hb WHERE lang = 'en' GROUP BY 1),
      |cand AS (SELECT b, COUNT(*) AS cc FROM hb WHERE lang <> 'en' GROUP BY 1),
      |tots AS (SELECT (SELECT COUNT(*) FROM hb WHERE lang = 'en') AS tott,
      |                (SELECT COUNT(*) FROM hb WHERE lang <> 'en') AS totc),
      |lr AS (
      |  SELECT spine.b, ROUND(ln(
      |      CAST((COALESCE(tc, 0) + 1) * (totc + 64) AS DOUBLE)
      |    / CAST((COALESCE(cc, 0) + 1) * (tott + 64) AS DOUBLE)), 6) AS lr
      |  FROM spine LEFT JOIN tgt USING (b) LEFT JOIN cand USING (b)
      |  CROSS JOIN tots
      |), nb AS (
      |  SELECT doc_id, lang, b, COUNT(*) AS n FROM hb
      |  WHERE lang <> 'en' GROUP BY 1, 2, 3
      |), sc AS (
      |  SELECT doc_id, lang,
      |    CAST(SUM(CAST(ROUND(n * lr, 6) AS DECIMAL(28,6))) AS DOUBLE) AS score
      |  FROM nb JOIN lr USING (b) GROUP BY 1, 2
      |), keyed AS (
      |  SELECT doc_id, lang, score,
      |    ROUND(score + ROUND(-ln(-ROUND(ln(
      |      ((4096*(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),1,1))-1)
      |       + 256*(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),2,1))-1)
      |       +  16*(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),3,1))-1)
      |       +     (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),4,1))-1))
      |       + 0.5) / 65536.0), 6)), 6), 6) + 0.0 AS gkey
      |  FROM sc
      |)
      |SELECT ROW_NUMBER() OVER (ORDER BY gkey DESC, doc_id) AS rank,
      |  doc_id, lang, score, gkey
      |FROM keyed ORDER BY gkey DESC, doc_id LIMIT 40""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_dsir" -> (sampleDsir _))

  val oracles: Map[String, String] = Map(
    "sample_dsir" -> sampleDsirOracle)
}
