package graft.operators

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series operators mirroring the reference's History API engine.
  *
  * The reference buckets by `FLOOR(epoch_ms/res)*res` and aggregates per
  * (context, path, bucket) — see HistoryAPI.ts:826 and
  * services/aggregation-service.ts:423-461. Here `events` plays the
  * SignalK series: user_id≈context, event_type≈path.
  *
  * Scale: every operator groups or windows by (series key, bucket) —
  * the same keys the hive layout partitions by — so at 100 TB the
  * shuffle is one exchange on the series key and windows never span
  * keys. All aggregates are algebraic (partial-agg friendly).
  */
object TimeSeries {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)

  // ---------------------------------------------------------------- #5
  /** Time-bucketed avg/min/max/count per path — HistoryAPI.ts:826. */
  def timeBucketAvg(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .groupBy(col("event_type"), bucketOfMs(col("ts_ms"), 3600000L).as("bucket_ms"))
      .agg(
        davg(col("value")).as("value_avg"),
        min("value").as("value_min"),
        max("value").as("value_max"),
        count(lit(1)).as("sample_count"))
      .orderBy("event_type", "bucket_ms")

  val timeBucketAvgOracle: String =
    """SELECT event_type,
      |  CAST(FLOOR(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS bucket_ms,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS value_avg,
      |  MIN(value) AS value_min,
      |  MAX(value) AS value_max,
      |  COUNT(*) AS sample_count
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- #6
  /** Per-bucket first/last/median/middle_index — the reference's
    * aggregate-method set (HistoryAPI.ts:2382-2410). first/last are
    * deterministic via the unique event_id order; middle_index is the
    * 1-based floor((n+1)/2)-th element ("first of two middle values",
    * README). */
  def aggMethods(spark: SparkSession, dir: String): DataFrame = {
    val base = ev(spark, dir)
      .withColumn("bucket_ms", bucketOfMs(col("ts_ms"), 86400000L))
    val w = Window.partitionBy("event_type", "bucket_ms").orderBy("event_id")
    val mid = base
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("event_type", "bucket_ms")))
      .where(col("rn") === expr("(cnt + 1) div 2"))
      .select(col("event_type"), col("bucket_ms"), col("value").as("middle_index_value"))
    base.groupBy("event_type", "bucket_ms")
      .agg(
        min_by(col("value"), col("event_id")).as("first_value"),
        max_by(col("value"), col("event_id")).as("last_value"),
        r6(median(col("value"))).as("median_value"))
      .join(mid, Seq("event_type", "bucket_ms"))
      .orderBy("event_type", "bucket_ms")
  }

  val aggMethodsOracle: String =
    """WITH base AS (
      |  SELECT event_type,
      |    CAST(FLOOR(epoch_ms(ts) / 86400000) * 86400000 AS BIGINT) AS bucket_ms,
      |    event_id, value
      |  FROM events
      |), mid AS (
      |  SELECT event_type, bucket_ms, value AS middle_index_value FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, bucket_ms ORDER BY event_id) AS rn,
      |           COUNT(*) OVER (PARTITION BY event_type, bucket_ms) AS cnt
      |    FROM base) WHERE rn = (cnt + 1) // 2
      |)
      |SELECT b.event_type, b.bucket_ms,
      |  arg_min(b.value, b.event_id) AS first_value,
      |  arg_max(b.value, b.event_id) AS last_value,
      |  ROUND(median(b.value), 6) AS median_value,
      |  any_value(m.middle_index_value) AS middle_index_value
      |FROM base b JOIN mid m USING (event_type, bucket_ms)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- #8
  /** raw→tier bucket partials: exact DECIMAL `value_sum` + count +
    * min/max + first/last ts per (context, path, bucket). The decimal
    * sum is the lossless carry that makes tier re-aggregation both
    * exact and engine-identical (decimal addition is associative, so
    * SUM(sums)/SUM(counts) equals the raw average bit-for-bit in any
    * engine and any partition order). */
  def tierPartials(df: DataFrame, resolutionMs: Long): DataFrame =
    df.groupBy(col("user_id"), col("event_type"),
        bucketOfMs(col("ts_ms"), resolutionMs).as("bucket_ms"))
      .agg(
        sum(col("value").cast(DecimalType(18, 6))).as("value_sum"),
        min("value").as("value_min"),
        max("value").as("value_max"),
        count(lit(1)).as("sample_count"),
        min("ts_ms").as("first_ts_ms"),
        max("ts_ms").as("last_ts_ms"))

  /** raw→tier rollup producing the aggregated-tier file schema
    * (aggregation-service.ts:423-439): value_avg/min/max, sample_count,
    * first/last timestamp, keyed by (context, path, bucket). */
  def tierRollup(df: DataFrame, resolutionMs: Long): DataFrame =
    tierPartials(df, resolutionMs)
      .withColumn("value_avg", col("value_sum").cast("double") / col("sample_count"))
      .select("user_id", "event_type", "bucket_ms", "value_avg", "value_min",
        "value_max", "sample_count", "first_ts_ms", "last_ts_ms")

  def tierRollupRaw(spark: SparkSession, dir: String): DataFrame =
    tierRollup(ev(spark, dir), 300000L)
      .orderBy("user_id", "event_type", "bucket_ms")

  val tierRollupRawOracle: String =
    """SELECT user_id, event_type,
      |  CAST(FLOOR(epoch_ms(ts) / 300000) * 300000 AS BIGINT) AS bucket_ms,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS value_avg,
      |  MIN(value) AS value_min, MAX(value) AS value_max,
      |  COUNT(*) AS sample_count,
      |  MIN(epoch_ms(ts)) AS first_ts_ms, MAX(epoch_ms(ts)) AS last_ts_ms
      |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- #9
  /** Tier re-aggregation (aggregation-service.ts:442-461): the
    * reference computes the coarse average as weighted SUM(avg·n)/
    * SUM(n); we carry the exact DECIMAL partial sum through the tier
    * instead and compute SUM(sums)/SUM(counts) — mathematically the
    * same weighted mean, but exact (no double·count product whose
    * decimal quantization differs across engines) and associative
    * across any number of tier levels. */
  def tierReaggregate(tier: DataFrame, resolutionMs: Long): DataFrame =
    tier.groupBy(col("user_id"), col("event_type"),
        (floor(col("bucket_ms") / lit(resolutionMs)).cast("long") * lit(resolutionMs)).as("bucket_ms2"))
      .agg(
        (sum("value_sum").cast("double") / sum("sample_count")).as("value_avg"),
        min("value_min").as("value_min"),
        max("value_max").as("value_max"),
        sum("sample_count").as("sample_count"),
        min("first_ts_ms").as("first_ts_ms"),
        max("last_ts_ms").as("last_ts_ms"))
      .withColumnRenamed("bucket_ms2", "bucket_ms")

  def tierReagg(spark: SparkSession, dir: String): DataFrame =
    tierReaggregate(tierPartials(ev(spark, dir), 300000L), 3600000L)
      .select("user_id", "event_type", "bucket_ms", "value_avg", "value_min",
        "value_max", "sample_count", "first_ts_ms", "last_ts_ms")
      .orderBy("user_id", "event_type", "bucket_ms")

  val tierReaggOracle: String =
    """WITH t5 AS (
      |  SELECT user_id, event_type,
      |    CAST(FLOOR(epoch_ms(ts) / 300000) * 300000 AS BIGINT) AS bucket_ms,
      |    SUM(CAST(value AS DECIMAL(18,6))) AS value_sum,
      |    MIN(value) AS value_min, MAX(value) AS value_max,
      |    COUNT(*) AS sample_count,
      |    MIN(epoch_ms(ts)) AS first_ts_ms, MAX(epoch_ms(ts)) AS last_ts_ms
      |  FROM events GROUP BY 1, 2, 3
      |)
      |SELECT user_id, event_type,
      |  CAST(FLOOR(bucket_ms / 3600000) * 3600000 AS BIGINT) AS bucket_ms,
      |  CAST(SUM(value_sum) AS DOUBLE) / SUM(sample_count) AS value_avg,
      |  MIN(value_min) AS value_min, MAX(value_max) AS value_max,
      |  CAST(SUM(sample_count) AS BIGINT) AS sample_count,
      |  MIN(first_ts_ms) AS first_ts_ms, MAX(last_ts_ms) AS last_ts_ms
      |FROM t5 GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- #9b
  /** Incremental tier maintenance — aggregation-service.ts's
    * processAggregations only touches dates newer than lastProcessed;
    * the tier analog: merge a delta of fresh partials into an existing
    * tier WITHOUT re-aggregating the untouched mass. Buckets absent
    * from the delta pass through untouched (anti-join against the
    * delta's bucket set — delta-sized, so it broadcasts); only buckets
    * the delta touches are re-aggregated. At 100 TB that is the
    * difference between an hourly maintenance job proportional to the
    * last hour and one proportional to the archive. Exactness: the
    * partials carry decimal sums, so merge-then-average equals
    * full-recompute bit-for-bit. */
  /** The two halves of a tier merge, exposed separately so a caller
    * that also needs the corrected-rows view (the CDC feed) can reuse
    * the reagg branch instead of re-reading the written store: `_1` is
    * the untouched mass (anti-join pass-through, never re-aggregated),
    * `_2` the re-aggregated touched buckets. Both carry the aligned
    * DECIMAL(38,6) sum. */
  def mergeTierPartialParts(existing: DataFrame, delta: DataFrame): (DataFrame, DataFrame) = {
    val keys = Seq("user_id", "event_type", "bucket_ms")
    val touched = delta.select(keys.map(col): _*).distinct()
    val pass = existing.join(broadcast(touched), keys, "left_anti")
    val reagg = existing.join(broadcast(touched), keys, "left_semi")
      .unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(
        sum("value_sum").as("value_sum"),
        min("value_min").as("value_min"),
        max("value_max").as("value_max"),
        sum("sample_count").as("sample_count"),
        min("first_ts_ms").as("first_ts_ms"),
        max("last_ts_ms").as("last_ts_ms"))
    // sum-of-decimal widens precision; align for the union
    (pass.withColumn("value_sum", col("value_sum").cast(DecimalType(38, 6))),
      reagg.withColumn("value_sum", col("value_sum").cast(DecimalType(38, 6))))
  }

  def mergeTierPartials(existing: DataFrame, delta: DataFrame): DataFrame = {
    val (pass, reagg) = mergeTierPartialParts(existing, delta)
    pass.unionByName(reagg)
  }

  def tierIncremental(spark: SparkSession, dir: String): DataFrame = {
    // split mid-range: existing tier = everything before, delta = after
    // (the boundary bucket exists on both sides and must merge exactly)
    val splitMs = 1705300000000L
    val all = ev(spark, dir)
    val existing = tierPartials(all.where(col("ts_ms") < splitMs), 300000L)
    val delta = tierPartials(all.where(col("ts_ms") >= splitMs), 300000L)
    mergeTierPartials(existing, delta)
      .withColumn("value_avg", col("value_sum").cast("double") / col("sample_count"))
      .select("user_id", "event_type", "bucket_ms", "value_avg", "value_min",
        "value_max", "sample_count", "first_ts_ms", "last_ts_ms")
      .orderBy("user_id", "event_type", "bucket_ms")
  }

  /** Oracle = the full recompute: incremental maintenance must be
    * indistinguishable from rebuilding the tier from raw. */
  val tierIncrementalOracle: String = tierRollupRawOracle

  // ---------------------------------------------------------------- #9d
  /** Late-data tier CORRECTION as a CDC feed — the reference's
    * aggregation-service rewinds `lastProcessed` when raw data arrives
    * for dates it already published (aggregation-service.ts:405-421);
    * the warehouse form: a late batch re-OPENS exactly the published
    * 1 h buckets it touches and emits (old, corrected) rows downstream
    * consumers can upsert. Deterministic split stands in for lateness:
    * event_id % 17 = 3 arrives late, the rest was published on time.
    *
    * Scale shape: the late batch's touched-bucket set is tiny →
    * BROADCAST both ways (semi-join prunes the published tier to
    * touched buckets; in production the raw re-read is partition-pruned
    * the same way). The published mass is never re-aggregated, and the
    * decimal partial sums make merge-then-average equal full-recompute
    * bit-for-bit — so the CDC rows ARE the values a from-scratch
    * rebuild would publish. */
  def tierCorrection(spark: SparkSession, dir: String): DataFrame = {
    val all = ev(spark, dir)
    val isLate = col("event_id") % 17 === 3
    val keys = Seq("user_id", "event_type", "bucket_ms")
    val published = tierPartials(all.where(!isLate), 3600000L)
    val late = all.where(isLate)
    val touched = late.select(col("user_id"), col("event_type"),
      bucketOfMs(col("ts_ms"), 3600000L).as("bucket_ms")).distinct()
    val oldTouched = published.join(broadcast(touched), keys, "left_semi")
    val corrected = oldTouched.unionByName(tierPartials(late, 3600000L))
      .groupBy(keys.map(col): _*)
      .agg(
        sum("value_sum").as("value_sum"),
        min("value_min").as("value_min"),
        max("value_max").as("value_max"),
        sum("sample_count").as("sample_count"),
        min("first_ts_ms").as("first_ts_ms"),
        max("last_ts_ms").as("last_ts_ms"))
    corrected
      .join(oldTouched.select(col("user_id"), col("event_type"), col("bucket_ms"),
        (col("value_sum").cast("double") / col("sample_count")).as("old_avg"),
        col("sample_count").as("old_n")), keys, "left")
      .select(col("user_id"), col("event_type"), col("bucket_ms"),
        col("old_avg"), col("old_n"),
        (col("value_sum").cast("double") / col("sample_count")).as("new_avg"),
        col("sample_count").as("new_n"))
      .orderBy("user_id", "event_type", "bucket_ms")
  }

  /** Oracle: full recompute of the touched buckets (old side = on-time
    * events only, new side = all events), NULL old for brand-new
    * buckets. */
  val tierCorrectionOracle: String =
    """WITH pub AS (
      |  SELECT user_id, event_type,
      |    CAST(FLOOR(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS bucket_ms,
      |    SUM(CAST(value AS DECIMAL(18,6))) AS vs, COUNT(*) AS n
      |  FROM events WHERE event_id % 17 <> 3 GROUP BY 1, 2, 3
      |), touched AS (
      |  SELECT DISTINCT user_id, event_type,
      |    CAST(FLOOR(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS bucket_ms
      |  FROM events WHERE event_id % 17 = 3
      |), corr AS (
      |  SELECT user_id, event_type,
      |    CAST(FLOOR(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS bucket_ms,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS new_avg,
      |    COUNT(*) AS new_n
      |  FROM events GROUP BY 1, 2, 3
      |)
      |SELECT t.user_id, t.event_type, t.bucket_ms,
      |  CAST(p.vs AS DOUBLE) / p.n AS old_avg, p.n AS old_n,
      |  c.new_avg, c.new_n
      |FROM touched t
      |JOIN corr c USING (user_id, event_type, bucket_ms)
      |LEFT JOIN pub p USING (user_id, event_type, bucket_ms)
      |ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- #9c
  /** Tier auto-selection, end to end — HistoryAPI.ts:737-773 routes a
    * request to the coarsest tier whose resolution divides the
    * requested bucket; here a 2 h request over stores ("5s","60s","1h")
    * must pick the 1 h tier and answer FROM it. The oracle recomputes
    * the same answer from raw, proving the routing is lossless (the
    * decimal partial sums make tier re-aggregation exact). Only the
    * chosen tier's frame is ever executed — the others stay lazy,
    * mirroring the on-disk stores a real deployment reads. At scale
    * this routing is the read-amplification lever: the 1 h tier is
    * ~1/720th of raw. */
  def tierSelectQuery(spark: SparkSession, dir: String): DataFrame = {
    val raw = ev(spark, dir)
    val tiers = Map(
      "5s" -> (() => tierPartials(raw, 5000L)),
      "60s" -> (() => tierPartials(raw, 60000L)),
      "1h" -> (() => tierPartials(raw, 3600000L)))
    val requestedResMs = 7200000L
    val chosen = graft.api.History.selectTier(requestedResMs, tiers.keySet)
      .getOrElse(sys.error("no tier selected for 2h request"))
    require(chosen == "1h", s"expected the 1h tier, got $chosen")
    tierReaggregate(tiers(chosen)(), requestedResMs)
      .select("user_id", "event_type", "bucket_ms", "value_avg", "value_min",
        "value_max", "sample_count", "first_ts_ms", "last_ts_ms")
      .orderBy("user_id", "event_type", "bucket_ms")
  }

  val tierSelectOracle: String =
    """SELECT user_id, event_type,
      |  CAST(FLOOR(epoch_ms(ts) / 7200000) * 7200000 AS BIGINT) AS bucket_ms,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS value_avg,
      |  MIN(value) AS value_min, MAX(value) AS value_max,
      |  COUNT(*) AS sample_count,
      |  MIN(epoch_ms(ts)) AS first_ts_ms, MAX(epoch_ms(ts)) AS last_ts_ms
      |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // --------------------------------------------------------------- #12
  /** Multi-path time alignment: one row per bucket, one column per
    * path — the History API's aligned response shape (README "Time
    * Alignment"). Pivot on a known path list keeps the plan static. */
  def timeAlign(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = ev(spark, dir)
      .groupBy(bucketOfMs(col("ts_ms"), 86400000L).as("bucket_ms"))
      .pivot("event_type", types)
      .agg(davg(col("value")))
    types.foldLeft(pivoted) { (d, t) => d.withColumnRenamed(t, s"${t}_avg") }
      .orderBy("bucket_ms")
  }

  val timeAlignOracle: String =
    """SELECT CAST(FLOOR(epoch_ms(ts) / 86400000) * 86400000 AS BIGINT) AS bucket_ms,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'click') AS DOUBLE) / COUNT(value) FILTER (WHERE event_type = 'click') AS click_avg,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'error') AS DOUBLE) / COUNT(value) FILTER (WHERE event_type = 'error') AS error_avg,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) / COUNT(value) FILTER (WHERE event_type = 'purchase') AS purchase_avg,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'signup') AS DOUBLE) / COUNT(value) FILTER (WHERE event_type = 'signup') AS signup_avg,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = 'view') AS DOUBLE) / COUNT(value) FILTER (WHERE event_type = 'view') AS view_avg
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- #13
  /** SMA smoothing: window-10 trailing mean per path
    * (historical-streaming.ts:1147-1180). Decimal window sum keeps the
    * sliding aggregation order-independent. */
  def sma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("ts_ms", "event_id")
      .rowsBetween(-9, Window.currentRow)
    ev(spark, dir)
      .withColumn("sma",
        sum(col("value").cast(DecimalType(18, 6))).over(w).cast("double") /
          count(lit(1)).over(w))
      .select("event_id", "event_type", "ts_ms", "value", "sma")
      .orderBy("event_type", "ts_ms", "event_id")
  }

  val smaOracle: String =
    """SELECT event_id, event_type, epoch_ms(ts) AS ts_ms, value,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) / COUNT(*) OVER w AS sma
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_ms(ts), event_id ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, ts_ms, event_id""".stripMargin

  // --------------------------------------------------------------- #14
  /** EMA (alpha=0.2) final value per series via an ordered left fold —
    * same recurrence as historical-streaming.ts:1171. Both engines fold
    * left with identical IEEE op order (acc*0.8 + x*0.2), so the result
    * is bit-stable; rounded to 6 dp for the oracle compare.
    *
    * Scale shape: repartition on the series key + sortWithinPartitions
    * + ONE streaming mapPartitions pass — constant memory per key (the
    * sort spills externally; the fold holds a single accumulator). The
    * earlier collect_list formulation buffered each whole series in
    * one aggregation row, which dies on a hot key at 100 TB. */
  def ema(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = ev(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_ms"), col("event_id"), col("value"))
      .repartition(nPart, col("user_id"), col("event_type"))
      .sortWithinPartitions("user_id", "event_type", "ts_ms", "event_id")
      .as[(Long, String, Long, Long, Double)]
    sorted.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else new Iterator[(Long, String, Double)] {
        private var pending: (Long, String, Long, Long, Double) = it.next()
        private var done = false
        def hasNext: Boolean = !done
        def next(): (Long, String, Double) = {
          val (u, e, _, _, v0) = pending
          var acc = v0
          var keyDone = true
          while (keyDone && it.hasNext) {
            val r = it.next()
            if (r._1 == u && r._2 == e) acc = acc * 0.8 + r._5 * 0.2
            else { pending = r; keyDone = false }
          }
          if (keyDone) done = true // iterator exhausted inside this key
          (u, e, acc)
        }
      }
    }.toDF("user_id", "event_type", "ema")
      .withColumn("ema", r6(col("ema")))
      .orderBy("user_id", "event_type")
  }

  val emaOracle: String =
    """SELECT user_id, event_type,
      |  ROUND(list_reduce(list(value ORDER BY epoch_ms(ts), event_id), (acc, x) -> acc * 0.8 + x * 0.2), 6) AS ema
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------- #17
  /** Latest value per (context, path) — History "last known value".
    * The unique event_id breaks ts ties deterministically. */
  def latestPerPath(spark: SparkSession, dir: String): DataFrame =
    // argmax as a partial-aggregable max_by ((ts_ms, event_id) is a
    // total order — event_id unique): each map task keeps one row per
    // (context, path) before the exchange, so the hottest reference
    // lookup (latest value per path) never shuffles raw events — the
    // old row_number window shuffled and sorted the whole table
    ev(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(max_by(struct(col("ts_ms"), col("value")),
        struct(col("ts_ms"), col("event_id"))).as("best"))
      .select(col("user_id"), col("event_type"),
        col("best.ts_ms").as("ts_ms"), col("best.value").as("value"))
      .orderBy("user_id", "event_type")

  val latestPerPathOracle: String =
    """SELECT user_id, event_type, ts_ms, value FROM (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  // --------------------------------------------------------------- #18
  /** Discovery: series (contexts×paths) present in a time range with
    * row counts and first/last timestamps — path-discovery.ts semantics
    * (partition-pruned at scale; here a pruned scan + group). */
  def discovery(spark: SparkSession, dir: String): DataFrame = {
    val base = ev(spark, dir)
    base
      // predicate on the raw ts column in its native type → pushed to
      // the parquet scan (2024-01-08 .. 2024-01-22 UTC)
      .where(Tables.tsRange(base.schema("ts").dataType,
        1704672000000L, 1705881600000L))
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_records"),
        min("ts_ms").as("first_ts_ms"),
        max("ts_ms").as("last_ts_ms"))
      .orderBy("user_id", "event_type")
  }

  val discoveryOracle: String =
    """SELECT user_id, event_type, COUNT(*) AS n_records,
      |  MIN(epoch_ms(ts)) AS first_ts_ms, MAX(epoch_ms(ts)) AS last_ts_ms
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-22'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------- multi-vessel
  /** Wildcard-context collection with exclusions — the reference's
    * `vessels.*` + excludeMMSI filtering (README "Multi-Vessel
    * Support"): aggregate across all contexts except an exclusion
    * list. */
  def contextExclude(spark: SparkSession, dir: String): DataFrame =
    ev(spark, dir)
      .where(!col("user_id").isin(2L, 5L, 7L))
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_records"), davg(col("value")).as("value_avg"))
      .orderBy("user_id", "event_type")

  val contextExcludeOracle: String =
    """SELECT user_id, event_type, COUNT(*) AS n_records,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS value_avg
      |FROM events WHERE user_id NOT IN (2, 5, 7)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_context_exclude" -> (contextExclude _),
    "sk_time_bucket_avg" -> (timeBucketAvg _),
    "sk_agg_methods" -> (aggMethods _),
    "sk_tier_rollup_raw5s" -> (tierRollupRaw _),
    "sk_tier_reagg" -> (tierReagg _),
    "sk_tier_incremental" -> (tierIncremental _),
    "sk_tier_correction" -> (tierCorrection _),
    "sk_tier_select" -> (tierSelectQuery _),
    "sk_time_align" -> (timeAlign _),
    "sk_sma" -> (sma _),
    "sk_ema" -> (ema _),
    "sk_latest_per_path" -> (latestPerPath _),
    "sk_discovery" -> (discovery _))

  val oracles: Map[String, String] = Map(
    "sk_context_exclude" -> contextExcludeOracle,
    "sk_time_bucket_avg" -> timeBucketAvgOracle,
    "sk_agg_methods" -> aggMethodsOracle,
    "sk_tier_rollup_raw5s" -> tierRollupRawOracle,
    "sk_tier_reagg" -> tierReaggOracle,
    "sk_tier_incremental" -> tierIncrementalOracle,
    "sk_tier_correction" -> tierCorrectionOracle,
    "sk_tier_select" -> tierSelectOracle,
    "sk_time_align" -> timeAlignOracle,
    "sk_sma" -> smaOracle,
    "sk_ema" -> emaOracle,
    "sk_latest_per_path" -> latestPerPathOracle,
    "sk_discovery" -> discoveryOracle)
}
