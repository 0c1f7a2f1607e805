package graft.text

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-pipeline operators beyond per-doc scoring: deterministic
  * sampling, multi-rule quality gating, corpus-level term weighting,
  * and sequence packing — the steps between "raw crawl" and "training
  * shards" in an LLM data pipeline.
  *
  * All are expressed as plain Catalyst plans (no UDFs): sampling is a
  * filter on an md5 prefix (pushdown-friendly, reproducible across
  * engines and runs), packing is a windowed cumulative sum per shard
  * key, TF-IDF is two aggregations and a broadcast join.
  */
object Pipeline {

  private def toks(c: Column): Column = split(c, " ")

  // --------------------------------------------------- hash sampling
  /** Deterministic stratified sampling: a doc is kept when the hex
    * prefix of md5(doc_id) falls under its language's rate threshold —
    * reproducible, engine-independent, and a plain pushdown-able
    * filter (no RNG state, no sample() nondeterminism). en is
    * downsampled to ~20%, other languages kept at ~50% — the usual
    * "rebalance the dominant language" move. */
  def sampleHash(spark: SparkSession, dir: String): DataFrame = {
    val prefix = substring(md5(col("doc_id").cast("string")), 1, 4)
    val thresh = when(col("lang") === "en", lit("3333")).otherwise(lit("8000"))
    Tables.documents(spark, dir)
      .withColumn("sampled", prefix < thresh)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("sampled"), 1)).as("n_sampled"),
        sum(when(col("sampled"), col("doc_id"))).as("sampled_id_sum"),
        davg(when(col("sampled"), col("n_chars"))).as("sampled_avg_chars"))
      .orderBy("lang")
  }

  val sampleHashOracle: String =
    """SELECT lang, COUNT(*) AS n_total,
      |  COUNT(*) FILTER (WHERE sampled) AS n_sampled,
      |  CAST(SUM(doc_id) FILTER (WHERE sampled) AS BIGINT) AS sampled_id_sum,
      |  CAST(SUM(CAST(n_chars AS DECIMAL(18,6))) FILTER (WHERE sampled) AS DOUBLE)
      |    / COUNT(n_chars) FILTER (WHERE sampled) AS sampled_avg_chars
      |FROM (
      |  SELECT *, substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
      |    (CASE WHEN lang = 'en' THEN '3333' ELSE '8000' END) AS sampled
      |  FROM documents)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------- quality gates
  /** Gopher-style multi-rule quality gate: word count bounds, mean
    * word length bounds, minimum stopword evidence, minimum lexical
    * diversity. Emits the per-rule metrics plus the final keep flag —
    * the shape a filtering pipeline audits before dropping data. */
  def qualityGopher(spark: SparkSession, dir: String): DataFrame = {
    val nWords = size(toks(col("text")))
    // mean word length from char arithmetic: (chars - separators)/words
    val meanLen = (length(col("text")) - (nWords - 1)).cast("double") / nWords
    val stops = expr(
      "size(filter(split(text, ' '), x -> x IN ('the', 'a', 'value', 'data')))")
    val distinctRatio = size(array_distinct(toks(col("text")))).cast("double") / nWords
    Tables.documents(spark, dir)
      .select(col("doc_id"), nWords.as("n_words"),
        r6(meanLen).as("mean_word_len"), stops.as("stopword_count"),
        r6(distinctRatio).as("distinct_ratio"))
      .withColumn("keep",
        col("n_words").between(30, 300) &&
        col("mean_word_len").between(2.0, 8.0) &&
        col("stopword_count") >= 2 &&
        col("distinct_ratio") >= 0.3)
      .orderBy("doc_id")
  }

  val qualityGopherOracle: String =
    """SELECT doc_id, n_words, mean_word_len, stopword_count, distinct_ratio,
      |  (n_words BETWEEN 30 AND 300) AND (mean_word_len BETWEEN 2.0 AND 8.0)
      |    AND stopword_count >= 2 AND distinct_ratio >= 0.3 AS keep
      |FROM (
      |  SELECT doc_id,
      |    len(string_split(text, ' ')) AS n_words,
      |    ROUND(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
      |      / len(string_split(text, ' ')), 6) AS mean_word_len,
      |    len(list_filter(string_split(text, ' '),
      |      x -> x IN ('the', 'a', 'value', 'data'))) AS stopword_count,
      |    ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')), 6) AS distinct_ratio
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- tf-idf
  /** Top-5 TF-IDF terms per source: tf = term occurrences within the
    * source, idf = ln(N_docs / doc-frequency). Two aggregations (term
    * counts; doc frequencies) and a broadcast of the df table — at
    * corpus scale the heavy side is the exploded token stream, which
    * partial-aggregates map-side before one shuffle on the term. */
  def tfidfTop(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.select(count(lit(1)).as("n_docs"))
    val exploded = docs.select(col("doc_id"), col("source"),
      explode(toks(col("text"))).as("term"))
    val tf = exploded.groupBy("source", "term").agg(count(lit(1)).as("tf"))
    val df = exploded.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("source")
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", r6(col("tf") * r6(log(col("n_docs").cast("double") / col("df")))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select("source", "rank", "term", "tf", "df", "tfidf")
      .orderBy("source", "rank")
  }

  val tfidfOracle: String =
    """WITH ex AS (
      |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS term FROM documents
      |), tf AS (
      |  SELECT source, term, COUNT(*) AS tf FROM ex GROUP BY 1, 2
      |), df AS (
      |  SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM ex) GROUP BY 1
      |), nd AS (SELECT COUNT(*) AS n_docs FROM documents)
      |SELECT source, rank, term, tf, df, tfidf FROM (
      |  SELECT source, term, tf, df,
      |    ROUND(tf * ROUND(ln(CAST(n_docs AS DOUBLE) / df), 6), 6) AS tfidf,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY ROUND(tf * ROUND(ln(CAST(n_docs AS DOUBLE) / df), 6), 6) DESC, term) AS rank
      |  FROM tf JOIN df USING (term) CROSS JOIN nd)
      |WHERE rank <= 5 ORDER BY source, rank""".stripMargin

  // -------------------------------------------------------- packing
  /** Sequence packing: greedy boundary chunking of the token stream
    * into ~4096-token training chunks, per source shard. chunk =
    * FLOOR(tokens-before-this-doc / 4096) in doc_id order within the
    * shard — a windowed cumulative sum, so each shard packs
    * independently (parallel at scale; the shard key is the natural
    * write partition). */
  def packChunks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), size(toks(col("text"))).as("n_tokens"))
      .withColumn("chunk_id",
        floor(coalesce(sum("n_tokens").over(w), lit(0L)) / 4096).cast("long"))
      .groupBy("source", "chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("chunk_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "chunk_id")
  }

  val packChunksOracle: String =
    """WITH t AS (
      |  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens FROM documents
      |), c AS (
      |  SELECT doc_id, source, n_tokens,
      |    CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 4096) AS BIGINT) AS chunk_id
      |  FROM t
      |)
      |SELECT source, chunk_id, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_hash" -> (sampleHash _),
    "quality_gopher" -> (qualityGopher _),
    "text_tfidf" -> (tfidfTop _),
    "pack_chunks" -> (packChunks _))

  val oracles: Map[String, String] = Map(
    "sample_hash" -> sampleHashOracle,
    "quality_gopher" -> qualityGopherOracle,
    "text_tfidf" -> tfidfOracle,
    "pack_chunks" -> packChunksOracle)
}
