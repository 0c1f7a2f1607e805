package graft.text

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data finalization round 4: the global pre-training shuffle
  * and a distributed quality-classifier fit — the last two standard
  * stages this pipeline family was missing ([[Pipeline]] gates/packs,
  * [[Pipeline2]] decontaminates, [[Pipeline3]] scrubs/samples; this
  * file shuffles the survivors into shards and fits the model that
  * produces quality labels in the first place).
  */
object Pipeline4 {

  // ------------------------------------------------- global shuffle
  /** Deterministic global shuffle into training shards — the step
    * between corpus cleanup and tokenization: documents must reach the
    * trainer in pseudorandom order, reproducibly (re-runs and
    * resumptions must agree), with no correlation to crawl/source
    * order. shard = first hex nibble of md5(doc_id) (16 shards);
    * within-shard order = the full md5 (doc_id ties the 2^-64
    * collision case), so both levels are content-independent hashes.
    *
    * Scale shape: shard assignment is a per-row projection; the
    * within-shard ordering is ONE hash repartition + per-shard sort
    * (at 100 TB: `partitionBy(shard)` write with
    * `sortWithinPartitions(h)`, shard count sized to executor count —
    * thousands, not the demo's 16). No global sort, no single point
    * of order: the classic "sort by random()" anti-pattern is a full
    *-corpus total order; this is per-shard local order, which is all
    * a data loader consuming shards in parallel needs. */
  def shuffleShards(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(col("doc_id").cast("string"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", conv(substring(col("h"), 1, 1), 16, 10).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))).cast("long"))
      .select("shard", "pos", "doc_id")
      .orderBy("shard", "pos")
  }

  val shuffleShardsOracle: String =
    """SELECT CAST(strpos('0123456789abcdef', substr(h, 1, 1)) - 1 AS INTEGER) AS shard,
      |  ROW_NUMBER() OVER (
      |    PARTITION BY strpos('0123456789abcdef', substr(h, 1, 1))
      |    ORDER BY h, doc_id) AS pos,
      |  doc_id
      |FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents)
      |ORDER BY shard, pos""".stripMargin

  // --------------------------------------- quality classifier fit
  /** Distributed logistic-regression fit (fixed 3 rounds of full-batch
    * gradient descent) — the model behind fastText-style quality
    * classifiers, fit with the same shape as [[graft.similarity
    * .Embeddings]]'s kmeans_fit: parameters live in a 1-row frame,
    * broadcast onto the corpus each round; the gradient is ONE
    * partial-aggregated pass (4 decimal sums); the corpus never
    * shuffles. Demo task: predict lang='en' from document shape
    * features (chars/1000, words/100, mean word length).
    *
    * Cross-engine bit-exactness: the sigmoid is the HARD sigmoid
    * clamp(0.25·z + 0.5, 0, 1) — pure IEEE arithmetic, identical in
    * both engines, where exp() would diverge in the last bits between
    * libm implementations (the same reasoning as funcs.scala's
    * header). Gradient sums go through DECIMAL(18,6) so the result is
    * partition-order independent (spec-pinned); every other operation
    * is IEEE-deterministic double arithmetic written with identical
    * structure in both engines. η=0.1, w₀=0.
    *
    * Reference has no model fitting (telemetry store) — this is part
    * of the LLM-pipeline surface, composing with quality_gopher /
    * text_quality (rule-based gates) as the learned alternative. */
  def classifierFit(spark: SparkSession, dir: String): DataFrame = {
    val f = features(Tables.documents(spark, dir)).localCheckpoint()
    var w = spark.range(1).select(
      lit(0.0).as("w0"), lit(0.0).as("w1"), lit(0.0).as("w2"), lit(0.0).as("w3"))
    val rounds = (1 to 3).map { r =>
      w = step(f, w).localCheckpoint(false)
      w.select(lit(r).as("round"), col("w0"), col("w1"), col("w2"), col("w3"))
    }
    rounds.reduce(_ unionByName _).orderBy("round")
  }

  /** (y, x1, x2, x3) per document. Divisions are double/double with
    * identical operands in both engines — deterministic. */
  private[graft] def features(docs: DataFrame): DataFrame =
    docs.select(
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
      (col("n_chars").cast("double") / 1000.0).as("x1"),
      (size(split(col("text"), " ")).cast("double") / 100.0).as("x2"),
      (col("n_chars").cast("double") / size(split(col("text"), " ")).cast("double"))
        .as("x3"))

  /** One GD round: w' = w − η·(1/n)·Σ (ŷ−y)·x, ŷ = hardsigmoid(w·x).
    * The weights frame is 1 row — broadcast onto the corpus; the
    * update is a single aggregation (map-side partial). */
  private[graft] def step(f: DataFrame, w: DataFrame): DataFrame = {
    val z = col("w0") + col("w1") * col("x1") + col("w2") * col("x2") +
      col("w3") * col("x3")
    val yhat = greatest(lit(0.0), least(lit(1.0), lit(0.25) * z + lit(0.5)))
    val err = yhat - col("y")
    def g(x: Column): Column = dsum(err * x, 6) / count(lit(1))
    f.crossJoin(broadcast(w)).agg(
      (min("w0") - lit(0.1) * g(lit(1.0))).as("w0"),
      (min("w1") - lit(0.1) * g(col("x1"))).as("w1"),
      (min("w2") - lit(0.1) * g(col("x2"))).as("w2"),
      (min("w3") - lit(0.1) * g(col("x3"))).as("w3"))
  }

  /** The 3 rounds unrolled; each round's weights are scalars carried
    * by CROSS JOIN — identical structure to the Spark loop. */
  val classifierFitOracle: String = {
    // SQL for one round's new weights given weight expressions w0..w3
    // referencing the previous round's 1-row relation `p`.
    def round(prev: String): String =
      s"""SELECT
         |  p.w0 - 0.1 * (CAST(SUM(CAST((GREATEST(0.0, LEAST(1.0, 0.25 * (p.w0 + p.w1*x1 + p.w2*x2 + p.w3*x3) + 0.5)) - y) * 1.0 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)) AS w0,
         |  p.w1 - 0.1 * (CAST(SUM(CAST((GREATEST(0.0, LEAST(1.0, 0.25 * (p.w0 + p.w1*x1 + p.w2*x2 + p.w3*x3) + 0.5)) - y) * x1 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)) AS w1,
         |  p.w2 - 0.1 * (CAST(SUM(CAST((GREATEST(0.0, LEAST(1.0, 0.25 * (p.w0 + p.w1*x1 + p.w2*x2 + p.w3*x3) + 0.5)) - y) * x2 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)) AS w2,
         |  p.w3 - 0.1 * (CAST(SUM(CAST((GREATEST(0.0, LEAST(1.0, 0.25 * (p.w0 + p.w1*x1 + p.w2*x2 + p.w3*x3) + 0.5)) - y) * x3 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)) AS w3
         |FROM f CROSS JOIN $prev p
         |GROUP BY p.w0, p.w1, p.w2, p.w3""".stripMargin
    s"""WITH f AS (
       |  SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
       |    CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0 AS x2,
       |    CAST(n_chars AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS x3
       |  FROM documents
       |), w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
       |w1 AS (${round("w0")}),
       |w2 AS (${round("w1")}),
       |w3 AS (${round("w2")})
       |SELECT 1 AS round, * FROM w1
       |UNION ALL SELECT 2, * FROM w2
       |UNION ALL SELECT 3, * FROM w3
       |ORDER BY round""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "shuffle_shards" -> (shuffleShards _),
    "classifier_fit" -> (classifierFit _))

  val oracles: Map[String, String] = Map(
    "shuffle_shards" -> shuffleShardsOracle,
    "classifier_fit" -> classifierFitOracle)
}
