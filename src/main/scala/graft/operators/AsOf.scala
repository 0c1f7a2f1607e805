package graft.operators

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time alignment operators: as-of join, LOCF gap fill, and
  * series coverage/gap reporting.
  *
  * The reference's History API answers "what was the last known value
  * at time T" (HistoryAPI.ts last-known fallback; README "last known
  * value") — generalized here to the three canonical time-series
  * shapes:
  *
  *  - [[asOfJoin]]: every probe row picks the latest quote row with
  *    `quote.ts <= probe.ts` per key. Implemented as union → one
  *    shuffle on the key → within-partition ordered scan with
  *    `last(_, ignoreNulls)` — the scalable plan (no range-join
  *    explosion, no per-probe subquery); at 100 TB it is a single
  *    exchange on the series key, and sort-merge locality makes the
  *    ordered scan sequential.
  *  - [[gapFill]]: regular per-series grid (sequence between observed
  *    bounds) left-joined with observations, missing buckets filled
  *    with the last observation carried forward (LOCF).
  *  - [[dataCoverage]]: per-series sampling report — inter-arrival
  *    stats and gap counts — the "data availability" view a telemetry
  *    store needs before trusting an aggregate.
  */
object AsOf {

  // ------------------------------------------------------------ as-of
  /** Generic as-of join: for each probe row, the latest quote value at
    * or before its timestamp, per key. Quotes are first deduplicated
    * to one row per (key, ts) — deterministically, by max event id —
    * so the pick is unambiguous under timestamp ties. */
  def asOfJoin(probes: DataFrame, quotes: DataFrame, keyCol: String,
      tsCol: String, valCol: String): DataFrame = {
    val q1 = quotes.groupBy(col(keyCol), col(tsCol))
      .agg(max_by(col(valCol), col("event_id")).as("asof_value"))
      // kind=0 sorts quotes before probes at equal ts: a quote AT the
      // probe's timestamp is visible to it (ASOF >= semantics).
      .select(col(keyCol), col(tsCol), lit(0).as("kind"),
        lit(null).cast("long").as("probe_id"), lit(null).cast("double").as("probe_value"),
        col("asof_value"))
    val p1 = probes.select(col(keyCol), col(tsCol), lit(1).as("kind"),
      col("event_id").as("probe_id"), col(valCol).as("probe_value"),
      lit(null).cast("double").as("asof_value"))
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    q1.unionByName(p1)
      .withColumn("asof_filled", last(col("asof_value"), ignoreNulls = true).over(w))
      .where(col("kind") === 1)
      .select(col("probe_id").as("event_id"), col(keyCol), col(tsCol),
        col("probe_value").as("value"), col("asof_filled").as("asof_value"))
  }

  /** `click` probes against `view` quotes per user — each click joined
    * to the user's latest view value at-or-before the click. */
  def skAsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    asOfJoin(
      ev.where(col("event_type") === "click"),
      ev.where(col("event_type") === "view"),
      "user_id", "ts_ms", "value")
      .orderBy("event_id")
  }

  val asOfOracle: String =
    """WITH quotes AS (
      |  SELECT user_id, epoch_ms(ts) AS ts_ms, arg_max(value, event_id) AS qvalue
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2
      |), probes AS (
      |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value
      |  FROM events WHERE event_type = 'click'
      |)
      |SELECT p.event_id, p.user_id, p.ts_ms, p.value, q.qvalue AS asof_value
      |FROM probes p ASOF LEFT JOIN quotes q
      |  ON p.user_id = q.user_id AND p.ts_ms >= q.ts_ms
      |ORDER BY p.event_id""".stripMargin

  // --------------------------------------------------------- gap fill
  /** Hourly grid per user over the `purchase` series, missing buckets
    * LOCF-filled. The grid is generated from each series' own observed
    * bounds (no global calendar scan); the fill is one ordered window
    * per series. */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val res = 3600000L
    val obs = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"), bucketOfMs(col("ts_ms"), res).as("bucket_ms"))
      .agg(davg(col("value")).as("value_avg"))
    val grid = obs.groupBy("user_id")
      .agg(min("bucket_ms").as("b0"), max("bucket_ms").as("b1"))
      .select(col("user_id"),
        explode(sequence(col("b0"), col("b1"), lit(res))).as("bucket_ms"))
    val w = Window.partitionBy("user_id").orderBy("bucket_ms")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "bucket_ms"), "left")
      .withColumn("value_filled", last(col("value_avg"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("value_avg").isNull)
      .orderBy("user_id", "bucket_ms")
  }

  val gapFillOracle: String =
    """WITH obs AS (
      |  SELECT user_id,
      |    CAST(FLOOR(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS bucket_ms,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS value_avg
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
      |), grid AS (
      |  SELECT user_id, unnest(generate_series(b0, b1, 3600000)) AS bucket_ms
      |  FROM (SELECT user_id, MIN(bucket_ms) AS b0, MAX(bucket_ms) AS b1 FROM obs GROUP BY 1)
      |)
      |SELECT g.user_id, g.bucket_ms, o.value_avg,
      |  last_value(o.value_avg IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.bucket_ms
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
      |  o.value_avg IS NULL AS is_gap
      |FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.bucket_ms = o.bucket_ms
      |ORDER BY 1, 2""".stripMargin

  // ----------------------------------------------- linear resampling
  /** Linear-interpolation resampling onto a regular 6-hour grid — the
    * interpolating companion to [[gapFill]]'s LOCF (a telemetry UI
    * draws the line BETWEEN samples; LOCF draws steps): each grid
    * point g inside a consecutive-observation pair [t0, t1) gets
    * v0 + (v1 − v0)·(g − t0)/(t1 − t0). Observations are first
    * collapsed to one value per (series, ms) so the series is strictly
    * increasing in time and the pair's denominator is never zero.
    *
    * Scale: ONE window (lead) per series builds the pairs, and each
    * pair emits only its own grid points via `sequence` — no global
    * calendar join, no per-grid-point search: a grid point belongs to
    * exactly one pair because the pair windows [⌈t0⌉grid, t1) tile the
    * series span disjointly. Work and output are grid-linear; the
    * only shuffle is the per-series window sort. Grid start is pure
    * integer math (`(t0 + res−1) DIV res · res`) — no float rounding
    * of timestamps on either engine. */
  def resampleInterp(spark: SparkSession, dir: String): DataFrame = {
    val res = 21600000L // 6 h
    // one shuffle serves both stages: hash(user_id) satisfies the
    // (user_id, ts_ms) aggregate's clustering AND the window's — the
    // planner would otherwise insert an exact-key exchange for each
    val obs = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .repartition(col("user_id"))
      .groupBy(col("user_id"), col("ts_ms").as("t0"))
      .agg(davg(col("value")).as("v0"))
    val w = Window.partitionBy("user_id").orderBy("t0")
    val pairs = obs
      .withColumn("t1", lead("t0", 1).over(w))
      .withColumn("v1", lead("v0", 1).over(w))
      .where(col("t1").isNotNull)
      .withColumn("g0", expr(s"((t0 + ${res - 1}) DIV $res) * $res"))
      .where(col("g0") < col("t1"))
    pairs
      .select(col("user_id"), col("t0"), col("v0"), col("t1"), col("v1"),
        explode(sequence(col("g0"), col("t1") - 1, lit(res))).as("grid_ms"))
      .withColumn("value", r6(col("v0") + (col("v1") - col("v0")) *
        (col("grid_ms") - col("t0")).cast("double") / (col("t1") - col("t0")).cast("double")))
      .select("user_id", "grid_ms", "value")
      .orderBy("user_id", "grid_ms")
  }

  val resampleInterpOracle: String =
    """WITH obs AS (
      |  SELECT user_id, epoch_ms(ts) AS t0,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS v0
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
      |), p AS (
      |  SELECT user_id, t0, v0,
      |    LEAD(t0) OVER (PARTITION BY user_id ORDER BY t0) AS t1,
      |    LEAD(v0) OVER (PARTITION BY user_id ORDER BY t0) AS v1
      |  FROM obs
      |), q AS (
      |  SELECT user_id, t0, v0, t1, v1,
      |    ((t0 + 21599999) // 21600000) * 21600000 AS g0
      |  FROM p WHERE t1 IS NOT NULL
      |), g AS (
      |  SELECT user_id, t0, v0, t1, v1,
      |    unnest(generate_series(g0, t1 - 1, 21600000)) AS grid_ms
      |  FROM q WHERE g0 < t1
      |)
      |SELECT user_id, grid_ms,
      |  ROUND(v0 + (v1 - v0) * CAST(grid_ms - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE), 6) + 0.0 AS value
      |FROM g ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------- coverage
  /** Per-series sampling/coverage report: sample count, span,
    * inter-arrival median and max, count of gaps over one hour. */
  def dataCoverage(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts_ms", "event_id")
    Tables.events(spark, dir)
      .withColumn("delta_ms", col("ts_ms") - lag("ts_ms", 1).over(w))
      .groupBy("user_id", "event_type")
      .agg(
        count(lit(1)).as("n_samples"),
        min("ts_ms").as("first_ts_ms"),
        max("ts_ms").as("last_ts_ms"),
        rN(median(col("delta_ms")), 1).as("median_interval_ms"),
        max("delta_ms").as("max_gap_ms"),
        count(when(col("delta_ms") > 3600000L, 1)).as("n_gaps_1h"))
      .orderBy("user_id", "event_type")
  }

  val dataCoverageOracle: String =
    """WITH d AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms,
      |    epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (
      |      PARTITION BY user_id, event_type ORDER BY epoch_ms(ts), event_id) AS delta_ms
      |  FROM events
      |)
      |SELECT user_id, event_type, COUNT(*) AS n_samples,
      |  MIN(ts_ms) AS first_ts_ms, MAX(ts_ms) AS last_ts_ms,
      |  ROUND(MEDIAN(delta_ms), 1) AS median_interval_ms,
      |  MAX(delta_ms) AS max_gap_ms,
      |  COUNT(*) FILTER (WHERE delta_ms > 3600000) AS n_gaps_1h
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------- nearest as-of
  /** Nearest-sample as-of join: each `click` probe picks the `view`
    * quote CLOSEST in time, either direction, ties to the earlier
    * quote — the alignment rule a resampler uses when "last known"
    * ([[asOfJoin]]) would pair a probe with a stale value while a
    * fresher one sits just ahead (the reference's interpolating
    * resampler's nearest-neighbor sibling, HistoryAPI getValues
    * last-known fallback generalized).
    *
    * Same single-exchange shape as [[asOfJoin]]: quotes and probes
    * union once, ONE ordered window pass per direction over the SAME
    * (key, ts, kind) sort — backward = running last-non-null over the
    * preceding frame, forward = first-non-null over the following
    * frame — then a pure-arithmetic nearer-of pick. No range join, no
    * per-probe subquery, and the second direction reuses the first's
    * exchange AND sort (plan: one Exchange, one Sort). A quote at the
    * probe's exact timestamp sorts before it (kind 0 < 1), lands in
    * the backward frame, and wins with Δ = 0. */
  def asOfNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val quotes = ev.where(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts_ms"))
      .agg(max_by(col("value"), col("event_id")).as("q_value"))
      .select(col("user_id"), col("ts_ms"), lit(0).as("kind"),
        lit(null).cast("long").as("probe_id"), lit(null).cast("double").as("probe_value"),
        col("q_value"))
    val probes = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts_ms"), lit(1).as("kind"),
        col("event_id").as("probe_id"), col("value").as("probe_value"),
        lit(null).cast("double").as("q_value"))
    val ord = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("kind"))
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val qTs = when(col("q_value").isNotNull, col("ts_ms"))
    val picked = quotes.unionByName(probes)
      .withColumn("b_value", last(col("q_value"), ignoreNulls = true).over(back))
      .withColumn("b_ts", last(qTs, ignoreNulls = true).over(back))
      .withColumn("f_value", first(col("q_value"), ignoreNulls = true).over(fwd))
      .withColumn("f_ts", first(qTs, ignoreNulls = true).over(fwd))
      .where(col("kind") === 1)
    val useBack = col("f_ts").isNull ||
      (col("b_ts").isNotNull && (col("ts_ms") - col("b_ts")) <= (col("f_ts") - col("ts_ms")))
    picked.select(
        col("probe_id").as("event_id"), col("user_id"), col("ts_ms"),
        col("probe_value").as("value"),
        when(useBack, col("b_value")).otherwise(col("f_value")).as("nearest_value"),
        when(useBack, col("b_ts")).otherwise(col("f_ts")).as("nearest_ts_ms"),
        when(col("b_ts").isNull && col("f_ts").isNull, lit(null).cast("string"))
          .otherwise(when(useBack, lit("backward")).otherwise(lit("forward")))
          .as("direction"))
      .orderBy("event_id")
  }

  val asOfNearestOracle: String =
    """WITH quotes AS (
      |  SELECT user_id, epoch_ms(ts) AS ts_ms, arg_max(value, event_id) AS q_value
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2
      |), probes AS (
      |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value
      |  FROM events WHERE event_type = 'click'
      |), b AS (
      |  SELECT p.event_id, q.ts_ms AS b_ts, q.q_value AS b_value
      |  FROM probes p ASOF LEFT JOIN quotes q
      |    ON p.user_id = q.user_id AND p.ts_ms >= q.ts_ms
      |), f AS (
      |  SELECT p.event_id, q.ts_ms AS f_ts, q.q_value AS f_value
      |  FROM probes p ASOF LEFT JOIN quotes q
      |    ON p.user_id = q.user_id AND p.ts_ms <= q.ts_ms
      |)
      |SELECT p.event_id, p.user_id, p.ts_ms, p.value,
      |  CASE WHEN f.f_ts IS NULL OR (b.b_ts IS NOT NULL
      |         AND p.ts_ms - b.b_ts <= f.f_ts - p.ts_ms)
      |       THEN b.b_value ELSE f.f_value END AS nearest_value,
      |  CASE WHEN f.f_ts IS NULL OR (b.b_ts IS NOT NULL
      |         AND p.ts_ms - b.b_ts <= f.f_ts - p.ts_ms)
      |       THEN b.b_ts ELSE f.f_ts END AS nearest_ts_ms,
      |  CASE WHEN b.b_ts IS NULL AND f.f_ts IS NULL THEN NULL
      |       WHEN f.f_ts IS NULL OR (b.b_ts IS NOT NULL
      |         AND p.ts_ms - b.b_ts <= f.f_ts - p.ts_ms)
      |       THEN 'backward' ELSE 'forward' END AS direction
      |FROM probes p
      |JOIN b ON p.event_id = b.event_id
      |JOIN f ON p.event_id = f.event_id
      |ORDER BY p.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_asof_join" -> (skAsOfJoin _),
    "sk_asof_nearest" -> (asOfNearest _),
    "sk_gap_fill" -> (gapFill _),
    "sk_data_coverage" -> (dataCoverage _),
    "sk_resample_interp" -> (resampleInterp _))

  val oracles: Map[String, String] = Map(
    "sk_asof_join" -> asOfOracle,
    "sk_asof_nearest" -> asOfNearestOracle,
    "sk_gap_fill" -> gapFillOracle,
    "sk_data_coverage" -> dataCoverageOracle,
    "sk_resample_interp" -> resampleInterpOracle)
}
