package graft.text

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-cleanup operators round 3: cross-document boilerplate
  * removal and exact-quota stratified sampling — the two remaining
  * standard steps between [[Pipeline]] (gating, weighting, packing)
  * and [[Pipeline2]] (decontamination, repetition, substring dedup)
  * in an LLM training-data pipeline.
  *
  * Both are plain Catalyst plans. Boilerplate removal is the
  * C4/RefinedWeb "drop spans that repeat across documents" cleanup:
  * unlike [[Pipeline2.substringDedup]], which only *reports* shared
  * spans per document pair, this operator *rewrites* the corpus —
  * covered token positions are dropped and the surviving text is
  * reassembled in order. Stratified sampling keeps an exact per-group
  * quota by deterministic hash rank (reproducible across engines and
  * runs, no RNG state).
  */
object Pipeline3 {

  /** Tokens with their position: (doc_id, pos, w0). Position is the
    * reassembly key — order must survive the shuffle. */
  private def toks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w0")))

  // --------------------------------------------- boilerplate removal
  /** Cross-document boilerplate scrub: any word 5-gram that appears in
    * >= 2 distinct documents marks its 5 token positions as covered;
    * covered positions are dropped and each document's remaining
    * tokens are re-joined in order (C4's duplicated-span cleanup, on
    * word windows — the synthetic corpus has no sentence breaks).
    *
    * Scale shape: the n-gram stream is a PER-ROW array-slice
    * projection (posexplode of the in-row 5-gram list — no window, so
    * the full token stream is never shuffled or sorted just to see
    * its neighbors); the document frequency table is one hash
    * aggregation on the 16-byte ngram hash; cover expansion is a
    * semi-join + bounded explode (x5); the rebuild groups by doc_id,
    * so every per-key buffer is bounded by a single document's
    * length — the corpus-size dimension only ever flows through hash
    * joins and aggregations, never a per-key collect or sort. Mirrors
    * RefinedWeb §5.2 / C4 span dedup; reference has no corpus-rewrite
    * step (it is a telemetry store) — this is part of the
    * LLM-pipeline surface.
    */
  def boilerplateScrub(spark: SparkSession, dir: String): DataFrame =
    scrubDocs(Tables.documents(spark, dir))

  /** Core on an arbitrary (doc_id, text) frame; `minDf` = document
    * frequency at which a 5-gram counts as boilerplate. */
  private[graft] def scrubDocs(docs: DataFrame, minDf: Int = 2): DataFrame = {
    // n-grams with their start position, built by slicing the token
    // array in place: the lambda only slices and joins words (the md5
    // stays codegen'd on the exploded column), and the explode index
    // IS the position — neighbor visibility without a per-doc
    // window/sort of the whole corpus
    val ng = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), posexplode(expr(
        """CASE WHEN size(ws) >= 5
          |  THEN transform(sequence(0, size(ws) - 5), i -> array_join(slice(ws, i + 1, 5), ' '))
          |  ELSE array() END""".stripMargin)).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"), md5(col("gram")).as("h"))
    val tok = toks(docs)
    // document frequency per 5-gram; >= 2 distinct docs = boilerplate
    val boiler = ng.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") >= minDf).select("h")
    // expand each boilerplate occurrence to its 5 covered positions
    val covered = ng.join(boiler, Seq("h"), "left_semi")
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + 4)).as("cpos"))
      .distinct()
    // rebuild: drop covered positions, re-join survivors in order.
    // collect_list skips the NULLs that when() leaves on dropped rows;
    // array_sort on (pos, word) structs restores document order.
    // (aliases: `covered` and `tok` share the docs lineage, so
    // qualified names, not dataset-id column refs, disambiguate)
    tok.alias("t").join(covered.alias("c"),
        col("t.doc_id") === col("c.doc_id") && col("t.pos") === col("c.cpos"), "left")
      .select(col("t.doc_id").as("doc_id"), col("t.pos").as("pos"), col("w0"),
        col("c.cpos").isNull.as("keep"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("keep"), 1)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN keep THEN struct(pos, w0) END)), x -> x.w0)"),
          " ").as("cleaned"))
      .orderBy("doc_id")
  }

  val boilerplateScrubOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, i - 1 AS pos, ws[i] AS w0
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |       unnest(generate_series(1, len(ws))) t(i)),
      |led AS (
      |  SELECT doc_id, pos, w0,
      |    LEAD(w0, 1) OVER w AS w1, LEAD(w0, 2) OVER w AS w2,
      |    LEAD(w0, 3) OVER w AS w3, LEAD(w0, 4) OVER w AS w4
      |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |ng AS (
      |  SELECT doc_id, pos,
      |    md5(w0 || ' ' || w1 || ' ' || w2 || ' ' || w3 || ' ' || w4) AS h
      |  FROM led WHERE w4 IS NOT NULL),
      |boiler AS (SELECT h FROM ng GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
      |covered AS (
      |  SELECT DISTINCT ng.doc_id, ng.pos + k AS cpos
      |  FROM ng JOIN boiler USING (h), unnest(generate_series(0, 4)) t(k))
      |SELECT tok.doc_id, COUNT(*) AS n_tokens,
      |  COUNT(*) FILTER (WHERE covered.cpos IS NULL) AS n_kept,
      |  COALESCE(string_agg(w0, ' ' ORDER BY pos)
      |           FILTER (WHERE covered.cpos IS NULL), '') AS cleaned
      |FROM tok LEFT JOIN covered
      |  ON tok.doc_id = covered.doc_id AND tok.pos = covered.cpos
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------- stratified sampling
  /** Exact-quota stratified sampling: keep the K = 20 documents per
    * (lang, source) stratum with the smallest md5(doc_id) — an exact
    * per-group budget, where [[Pipeline.sampleHash]] keeps an expected
    * *rate*. Deterministic (hash order, doc_id tie-break), so
    * reproducible across engines, runs, and partitionings.
    *
    * Scale shape: `row_number <= K` over a window is rewritten by
    * Catalyst's InferWindowGroupLimit into a WindowGroupLimit with a
    * map-side partial pass — each task keeps a K-row heap per stratum
    * before the shuffle, so a stratum with 10^9 documents ships only
    * K rows per upstream partition, never the full sort
    * (PlanAuditSpec pins the WindowGroupLimit node). */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    stratifiedTopK(Tables.documents(spark, dir), 20)

  private[graft] def stratifiedTopK(docs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("lang", "source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("lang"), col("source"), col("rk"), col("doc_id"), col("n_chars"))
      .orderBy("lang", "source", "rk")
  }

  val sampleStratifiedOracle: String =
    """SELECT lang, source, rk, doc_id, n_chars FROM (
      |  SELECT lang, source, doc_id, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY lang, source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 20 ORDER BY lang, source, rk""".stripMargin

  // -------------------------------------------- temperature sampling
  /** Temperature-scaled language rebalancing (the XLM-R / mBERT
    * α-sampling move): language l with corpus share p_l is kept at
    * rate ∝ p_l^(α-1) (α = 0.3), normalized so the rarest language
    * keeps everything — high-resource languages are downsampled
    * smoothly instead of the hard equal-budget cut of
    * [[Pipeline2.mixBalance]]. The keep decision is a deterministic
    * multiplicative hash of doc_id against the 6-dp-rounded rate (no
    * RNG, reproducible, identical across engines).
    *
    * Scale shape: one count aggregation builds the per-language rate
    * table (|languages| rows, broadcast); the keep decision is a
    * plain filter on the joined rate — the corpus never shuffles. */
  def sampleTemperature(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_l"))
    val total = counts.agg(sum("n_l").as("n_total"))
    // rate_l = (n_l/N)^(α-1) / max_l' (n_l'/N)^(α-1); α-1 < 0, so the
    // rarest language hits the max and keeps rate 1
    val weights = counts.crossJoin(broadcast(total))
      .select(col("lang"), col("n_l"),
        pow(col("n_l").cast("double") / col("n_total"), lit(0.3 - 1.0)).as("wt"))
    val maxWt = weights.agg(max("wt").as("max_wt"))
    val rates = weights.crossJoin(broadcast(maxWt))
      .select(col("lang"), r6(col("wt") / col("max_wt")).as("rate"))
    // deterministic per-doc uniform in [0,1): integer arithmetic,
    // bit-identical in any engine. The hash mixes doc_id as four
    // 16-bit limbs with odd multipliers (each limb map is a bijection
    // mod 2^16) so every intermediate stays < 2^34 — a single
    // doc_id * 2654435761 product would wrap Long for doc_id ≳ 3.5e9
    // (and DuckDB THROWS on BIGINT overflow where Spark wraps), so the
    // one-multiply form breaks exactly at 100 TB corpus ids.
    val u = pmod(
      pmod(col("doc_id"), lit(65536L)) * lit(40503L) +
        pmod(expr("doc_id div 65536"), lit(65536L)) * lit(45007L) +
        pmod(expr("doc_id div 4294967296"), lit(65536L)) * lit(50021L) +
        pmod(expr("doc_id div 281474976710656"), lit(65536L)) * lit(54973L),
      lit(65536L)).cast("double") / 65536.0
    docs.join(broadcast(rates), Seq("lang"))
      .withColumn("sampled", u < col("rate"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_total"),
        max(col("rate")).as("rate"),
        count(when(col("sampled"), 1)).as("n_sampled"),
        sum(when(col("sampled"), col("doc_id"))).as("sampled_id_sum"))
      .orderBy("lang")
  }

  val sampleTemperatureOracle: String =
    """WITH counts AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY 1),
      |wts AS (
      |  SELECT lang, n_l,
      |    POWER(CAST(n_l AS DOUBLE) / (SELECT SUM(n_l) FROM counts), 0.3 - 1.0) AS wt
      |  FROM counts),
      |rates AS (
      |  SELECT lang, ROUND(wt / (SELECT MAX(wt) FROM wts), 6) AS rate FROM wts),
      |flagged AS (
      |  SELECT d.lang, d.doc_id, r.rate,
      |    (CAST((
      |      (d.doc_id % 65536) * 40503 +
      |      ((d.doc_id // 65536) % 65536) * 45007 +
      |      ((d.doc_id // 4294967296) % 65536) * 50021 +
      |      ((d.doc_id // 281474976710656) % 65536) * 54973
      |    ) % 65536 AS DOUBLE) / 65536.0) < r.rate AS sampled
      |  FROM documents d JOIN rates r USING (lang))
      |SELECT lang, COUNT(*) AS n_total, MAX(rate) AS rate,
      |  COUNT(*) FILTER (WHERE sampled) AS n_sampled,
      |  CAST(SUM(doc_id) FILTER (WHERE sampled) AS BIGINT) AS sampled_id_sum
      |FROM flagged GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------------- #40y2
  /** Corpus-level n-gram frequency, exact top-k: the contamination /
    * memorization-analysis primitive (count every trigram across the
    * corpus, report the k most frequent). The reference has no analog;
    * this is pure pipeline tooling (the table a decontamination run or
    * a "most-duplicated span" report reads first).
    *
    * Scale shape: n-grams come from in-place array slices (§5a #22 —
    * no lead() window, no per-token exchange before aggregation), the
    * count is ONE hash aggregation with map-side partials on the gram
    * key, and top-k is TakeOrderedAndProject — per-partition heaps
    * merged on the driver, NOT a global sort shuffle. The only full
    * exchange is the gram-key partial-to-final agg, which is the
    * irreducible one. k and n are literals so the whole plan is
    * codegen'd end to end. */
  def ngramCountsN(n: Int, k: Int)(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(split(col("text"), " ").as("t"))
      // gram extraction is the codegen'd native expression — the
      // transform(sequence, lambda) formulation runs every gram
      // through Spark's interpreted lambda evaluator (§5a #18), which
      // is the whole cost of this operator at corpus scale; the
      // expression also returns empty (never partial grams) for docs
      // shorter than n. n is a plan-time constant, so every gram
      // length (unigrams through the 13-grams decontamination uses)
      // shares the same branch-free generated loop.
      .select(explode(graft.functions.NGrams.ngrams(col("t"), n)).as("ngram"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("ngram"))
      .limit(k)

  def ngramCounts(spark: SparkSession, dir: String): DataFrame =
    ngramCountsN(3, 100)(spark, dir)

  def ngramCountsOracleN(n: Int, k: Int): String = {
    val terms =
      (0 until n).map(j => if (j == 0) "w[i]" else s"w[i+$j]").mkString(" || ' ' || ")
    s"""WITH g AS (
       |  SELECT $terms AS ngram
       |  FROM (SELECT string_split(text, ' ') AS w FROM documents),
       |       UNNEST(range(1, GREATEST(len(w) - ${n - 2}, 1))) AS r(i)
       |)
       |SELECT ngram, COUNT(*) AS n_occurrences FROM g
       |GROUP BY 1 ORDER BY n_occurrences DESC, ngram LIMIT $k""".stripMargin
  }

  val ngramCountsOracle: String = ngramCountsOracleN(3, 100)

  // -------------------------------------------------------------- #40z2
  /** Epoch materialization: turn a per-language mixture policy
    * ("2.5 epochs of de, 3.25 of fr, …") into the actual repeated-row
    * dataset a trainer consumes. Integer epochs replicate every doc;
    * the fractional epoch keeps a deterministic md5-nibble slice of
    * docs one extra time (the same engine-portable hash-decision
    * idiom as [[Pipeline2.mixBalance]] — reproducible across runs,
    * engines and input layouts, no RNG state).
    *
    * Scale shape: ZERO data shuffles — policy is a literal map
    * expression, the copy count is a per-row projection, and the
    * explode(sequence(1, n)) materialization is narrow; output size
    * is the policy-weighted corpus (the unavoidable cost of epoch
    * materialization). The trailing orderBy is presentation-only. At
    * 100 TB you'd write this straight to the shuffled shard layout
    * ([[Pipeline4.shuffleShards]]) instead of sorting. */
  def mixEpochs(spark: SparkSession, dir: String): DataFrame = {
    val policy = map(
      lit("en"), lit(1.0), lit("de"), lit(2.5), lit("es"), lit(2.0),
      lit("fr"), lit(3.25), lit("zh"), lit(1.75))
    Tables.documents(spark, dir)
      .withColumn("epochs", coalesce(policy(col("lang")), lit(1.0)))
      .withColumn("base", floor(col("epochs")).cast("long"))
      .withColumn("frac", col("epochs") - col("base"))
      .withColumn("extra",
        (substring(md5(concat(col("doc_id").cast("string"), lit("#epoch"))), 1, 4) <
          lower(lpad(hex(floor(col("frac") * 65536).cast("long")), 4, "0")))
          .cast("long"))
      .withColumn("n_copies", col("base") + col("extra"))
      .where(col("n_copies") > 0)
      .select(col("doc_id"), col("lang"),
        explode(expr("sequence(1, n_copies)")).as("epoch_idx"))
      .orderBy("doc_id", "epoch_idx")
  }

  val mixEpochsOracle: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 2.5 WHEN 'es' THEN 2.0
      |              WHEN 'fr' THEN 3.25 WHEN 'zh' THEN 1.75 ELSE 1.0 END AS epochs
      |  FROM documents
      |), e AS (
      |  SELECT doc_id, lang,
      |    CAST(FLOOR(epochs) AS BIGINT) +
      |    CASE WHEN substr(md5(doc_id || '#epoch'), 1, 4) <
      |      lpad(lower(hex(CAST(FLOOR((epochs - FLOOR(epochs)) * 65536) AS BIGINT))), 4, '0')
      |      THEN 1 ELSE 0 END AS n
      |  FROM d
      |)
      |SELECT doc_id, lang, CAST(r.i AS BIGINT) AS epoch_idx
      |FROM e, UNNEST(range(1, n + 1)) AS r(i)
      |WHERE n > 0 ORDER BY doc_id, epoch_idx""".stripMargin

  // ------------------------------------------- token-budget sampling
  /** Token-BUDGETED sampling: each language is cut to an absolute
    * token budget B (here 20k tokens) — keep rate
    * min(1, B / total_tokens_l) — the "give me exactly N billion
    * tokens of each language" knob a training run actually turns
    * (contrast [[Pipeline2.mixBalance]], which equalizes to the
    * SMALLEST source, and [[sampleTemperature]], which reweights by
    * corpus SHARE; this one hits an externally-fixed size target).
    * The keep decision reuses mixBalance's deterministic md5-prefix
    * threshold (engine-portable, no RNG state), salted with "#budget"
    * so a doc's fate here is independent of its fate in other
    * sampling stages. Expected kept tokens per language ≈ B;
    * exact-quota variants (rank to a hard cutoff) pay a per-language
    * sort — the hash form is the one that scales, and its deviation
    * is O(√B) by Chernoff.
    *
    * Scale shape: one partial-aggregated sum builds the |languages|-row
    * rate table (broadcast back); the decision is a per-row filter —
    * the corpus never shuffles, and the output summary is one more
    * partial agg. */
  def sampleTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val budget = 20000.0
    val docs = Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(col("text"), " ")))
    val perLang = docs.groupBy("lang").agg(sum("n_tokens").as("lang_tokens"))
    val rates = perLang.select(col("lang"),
      least(lit(1.0), lit(budget) / col("lang_tokens").cast("double")).as("rate"))
    docs.join(broadcast(rates), Seq("lang"))
      .withColumn("keep", col("rate") >= 1.0 ||
        substring(md5(concat(col("doc_id").cast("string"), lit("#budget"))), 1, 4) <
          lower(lpad(hex(floor(col("rate") * 65536).cast("long")), 4, "0")))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("keep"), 1)).as("n_kept"),
        sum("n_tokens").as("total_tokens"),
        sum(when(col("keep"), col("n_tokens"))).as("kept_tokens"),
        r6(max(col("rate"))).as("rate"))
      .orderBy("lang")
  }

  val sampleTokenBudgetOracle: String =
    """WITH d AS (SELECT *, len(string_split(text, ' ')) AS n_tokens FROM documents),
      |per_lang AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS lang_tokens FROM d GROUP BY 1),
      |rates AS (
      |  SELECT lang, LEAST(1.0, 20000.0 / CAST(lang_tokens AS DOUBLE)) AS rate
      |  FROM per_lang),
      |k AS (
      |  SELECT d.*, rate,
      |    rate >= 1.0 OR substr(md5(CAST(doc_id AS VARCHAR) || '#budget'), 1, 4) <
      |      printf('%04x', CAST(FLOOR(rate * 65536) AS INT)) AS keep
      |  FROM d JOIN rates USING (lang))
      |SELECT lang, COUNT(*) AS n_total,
      |  COUNT(*) FILTER (WHERE keep) AS n_kept,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  CAST(SUM(n_tokens) FILTER (WHERE keep) AS BIGINT) AS kept_tokens,
      |  ROUND(MAX(rate), 6) AS rate
      |FROM k GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_boilerplate" -> (boilerplateScrub _),
    "sample_stratified" -> (sampleStratified _),
    "sample_temperature" -> (sampleTemperature _),
    "sample_token_budget" -> (sampleTokenBudget _),
    "ngram_counts" -> (ngramCounts _),
    "ngram_counts5" -> (ngramCountsN(5, 100) _),
    "mix_epochs" -> (mixEpochs _))

  val oracles: Map[String, String] = Map(
    "text_boilerplate" -> boilerplateScrubOracle,
    "sample_stratified" -> sampleStratifiedOracle,
    "sample_temperature" -> sampleTemperatureOracle,
    "sample_token_budget" -> sampleTokenBudgetOracle,
    "ngram_counts" -> ngramCountsOracle,
    "ngram_counts5" -> ngramCountsOracleN(5, 100),
    "mix_epochs" -> mixEpochsOracle)
}
