package graft.spatial

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Analysis-template data feeds.
  *
  * The reference ships canned "analysis templates" (analysis-templates
  * .ts:36-330: navigation-summary, battery-health, fuel-efficiency, …)
  * whose data side is a History-API pull over a template-declared path
  * set, reduced to the per-period statistics block handed to the LLM
  * analyzer (claude-analyzer.ts). The LLM prose is out of scope; the
  * data feed is in scope, and it composes operators this library
  * already proves one query deep: track stats, bucket aggregation,
  * angular vector statistics.
  *
  * `navSummary` is the flagship instance (navigation-summary template,
  * analysis-templates.ts:36: required navigation.position, optional
  * courseOverGround/speedOverGround): one row per (vessel, day) with
  * distance traveled, fix count, speed statistics, stationary
  * fraction, and circular course spread — computed in ONE pass over
  * the events scan per family (a windowed distance leg over position
  * fixes and a conditional-aggregate leg over speed/course rows)
  * joined on the (vessel, day) key. Both legs shuffle once on that
  * key; nothing collects a series.
  */
object Templates {

  /** Synthetic path mapping (TESTDATA.md conventions used across the
    * spatial/time-series families): `view` events carry position
    * (funcs.synthLat/synthLon), `click` plays navigation
    * .speedOverGround (m/s), `signup` plays navigation
    * .courseOverGround (radians). */
  def navSummary(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("day_ms", bucketOfMs(col("ts_ms"), 86400000L))

    // position leg: per-day track distance from consecutive fixes.
    // The lag window is partitioned by vessel only (NOT by day), so a
    // day's first fix measures the leg from the previous day's last fix
    // and that overnight distance is attributed to the LATER day — the
    // track is treated as one continuous line, matching how the
    // reference's History API walks a vessel's fix stream across file
    // (= day) boundaries. The oracle computes the same attribution.
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val pos = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("day_ms"), col("ts_ms"), col("event_id"),
        synthLat(col("value")).as("lat"), synthLon(col("value")).as("lon"))
      .withColumn("prev_lat", lag("lat", 1).over(w))
      .withColumn("prev_lon", lag("lon", 1).over(w))
      .withColumn("dist_m", when(col("prev_lat").isNull, lit(0.0))
        .otherwise(rN(haversineM(col("prev_lat"), col("prev_lon"),
          col("lat"), col("lon")), 3)))
      .groupBy("user_id", "day_ms")
      .agg(
        sum(col("dist_m").cast(DecimalType(18, 3))).cast("double").as("total_distance_m"),
        count(lit(1)).as("n_fixes"))

    // speed + course leg: one conditional aggregation over both paths
    val sc = ev.where(col("event_type").isin("click", "signup"))
      .groupBy("user_id", "day_ms")
      .agg(
        r6(davg(when(col("event_type") === "click", col("value"))))
          .as("avg_speed_mps"),
        max(when(col("event_type") === "click", col("value"))).as("max_speed_mps"),
        // guard the click-less group: 0/0 is NaN in Spark but not in
        // DuckDB (the w=0 degenerate class — emit NULL in both engines)
        when(count(when(col("event_type") === "click", 1)) > 0,
          r6(count(when(col("event_type") === "click" && col("value") < lit(5.0), 1))
            .cast("double") / count(when(col("event_type") === "click", 1))))
          .as("stationary_frac"),
        (sum(when(col("event_type") === "signup", r6(sin(col("value"))))
            .cast(DecimalType(18, 6))).cast("double") /
          count(when(col("event_type") === "signup", 1))).as("avg_sin"),
        (sum(when(col("event_type") === "signup", r6(cos(col("value"))))
            .cast(DecimalType(18, 6))).cast("double") /
          count(when(col("event_type") === "signup", 1))).as("avg_cos"))
      // course concentration R in [0,1]: 1 = steady course, 0 = uniform.
      // Clamp at 0: per-row round(sin/cos, 6) lets R exceed 1.0 by ~1e-7
      // on steady-course days, making 1-R a tiny negative whose rounded
      // value is a SIGNED zero — Spark's HALF_UP drops the sign bit,
      // DuckDB's ROUND keeps it, and the driver hashes bits. The spread
      // is semantically >= 0, so greatest(0, .) is exact, not a fudge;
      // the oracle clamps identically.
      .withColumn("course_spread",
        greatest(lit(0.0), r6(lit(1.0) - sqrt(col("avg_sin") * col("avg_sin") +
          col("avg_cos") * col("avg_cos")))))
      .drop("avg_sin", "avg_cos")

    pos.join(sc, Seq("user_id", "day_ms"))
      .orderBy("user_id", "day_ms")
  }

  val navSummaryOracle: String =
    """WITH ev AS (
      |  SELECT *, epoch_ms(ts) AS ts_ms,
      |    CAST(FLOOR(epoch_ms(ts) / 86400000) * 86400000 AS BIGINT) AS day_ms
      |  FROM events),
      |pos AS (
      |  SELECT user_id, day_ms,
      |    40.0 + value * 0.001 AS lat, -74.0 + value * 0.002 AS lon,
      |    LAG(40.0 + value * 0.001) OVER w AS prev_lat,
      |    LAG(-74.0 + value * 0.002) OVER w AS prev_lon
      |  FROM ev WHERE event_type = 'view'
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
      |dist AS (
      |  SELECT user_id, day_ms,
      |    CAST(SUM(CAST(CASE WHEN prev_lat IS NULL THEN 0.0 ELSE
      |      ROUND(2 * 6371000 * ASIN(SQRT(
      |        POWER(SIN(RADIANS(lat - prev_lat) / 2), 2) +
      |        COS(RADIANS(prev_lat)) * COS(RADIANS(lat)) *
      |        POWER(SIN(RADIANS(lon - prev_lon) / 2), 2))), 3) END
      |      AS DECIMAL(18,3))) AS DOUBLE) AS total_distance_m,
      |    COUNT(*) AS n_fixes
      |  FROM pos GROUP BY 1, 2),
      |sc AS (
      |  SELECT user_id, day_ms,
      |    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6)))
      |        FILTER (WHERE event_type = 'click') AS DOUBLE)
      |      / COUNT(value) FILTER (WHERE event_type = 'click'), 6) AS avg_speed_mps,
      |    MAX(value) FILTER (WHERE event_type = 'click') AS max_speed_mps,
      |    CASE WHEN COUNT(*) FILTER (WHERE event_type = 'click') > 0 THEN
      |      ROUND(CAST(COUNT(*) FILTER (WHERE event_type = 'click' AND value < 5.0)
      |          AS DOUBLE)
      |        / COUNT(*) FILTER (WHERE event_type = 'click'), 6) END AS stationary_frac,
      |    CAST(SUM(CAST(ROUND(SIN(value), 6) AS DECIMAL(18,6)))
      |        FILTER (WHERE event_type = 'signup') AS DOUBLE)
      |      / COUNT(*) FILTER (WHERE event_type = 'signup') AS avg_sin,
      |    CAST(SUM(CAST(ROUND(COS(value), 6) AS DECIMAL(18,6)))
      |        FILTER (WHERE event_type = 'signup') AS DOUBLE)
      |      / COUNT(*) FILTER (WHERE event_type = 'signup') AS avg_cos
      |  FROM ev WHERE event_type IN ('click', 'signup') GROUP BY 1, 2)
      |SELECT dist.user_id, dist.day_ms, total_distance_m, n_fixes,
      |  avg_speed_mps, max_speed_mps, stationary_frac,
      |  GREATEST(0.0, ROUND(1.0 - SQRT(avg_sin * avg_sin + avg_cos * avg_cos), 6))
      |    AS course_spread
      |FROM dist JOIN sc ON dist.user_id = sc.user_id AND dist.day_ms = sc.day_ms
      |ORDER BY 1, 2""".stripMargin

  /** Fuel-efficiency analysis template's data feed (analysis-templates
    * .ts:277: propulsion.*.fuel.rate vs navigation.speedOverGround) —
    * the efficiency-by-speed-band curve the template's prompt asks the
    * analyzer to read. `click` plays speedOverGround, `purchase` plays
    * fuel rate; the two series are aligned per (vessel, 5-min bucket)
    * (HistoryAPI multi-path alignment), then bucketed into 5 m/s speed
    * bands: samples, mean speed, mean fuel rate, and speed-per-fuel
    * efficiency per band. Two partial-aggregated shuffles on the
    * bucket key + one band rollup — no series ever collects. */
  def fuelEfficiency(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("bucket_ms", bucketOfMs(col("ts_ms"), 300000L))
    def leg(path: String, out: String) =
      ev.where(col("event_type") === path)
        .groupBy("user_id", "bucket_ms")
        .agg(r6(davg(col("value"))).as(out))
    leg("click", "speed").join(leg("purchase", "fuel"), Seq("user_id", "bucket_ms"))
      .groupBy((floor(col("speed") / 5.0).cast("long") * 5).as("speed_band"))
      .agg(
        count(lit(1)).as("n_buckets"),
        r6(davg(col("speed"))).as("avg_speed_mps"),
        r6(davg(col("fuel"))).as("avg_fuel_rate"),
        // fuel rates are strictly positive here, but guard the
        // degenerate band anyway: NULL in both engines, never Inf
        when(dsum(col("fuel")) > 0,
          r6(davg(col("speed")) / davg(col("fuel")))).as("efficiency"))
      .orderBy("speed_band")
  }

  val fuelEfficiencyOracle: String =
    """WITH ev AS (
      |  SELECT *, CAST(FLOOR(epoch_ms(ts) / 300000) * 300000 AS BIGINT) AS bucket_ms
      |  FROM events),
      |speed AS (
      |  SELECT user_id, bucket_ms,
      |    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 6)
      |      AS speed
      |  FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
      |fuel AS (
      |  SELECT user_id, bucket_ms,
      |    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 6)
      |      AS fuel
      |  FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT CAST(FLOOR(speed / 5.0) AS BIGINT) * 5 AS speed_band,
      |  COUNT(*) AS n_buckets,
      |  ROUND(CAST(SUM(CAST(speed AS DECIMAL(18,6))) AS DOUBLE) / COUNT(speed), 6)
      |    AS avg_speed_mps,
      |  ROUND(CAST(SUM(CAST(fuel AS DECIMAL(18,6))) AS DOUBLE) / COUNT(fuel), 6)
      |    AS avg_fuel_rate,
      |  CASE WHEN CAST(SUM(CAST(fuel AS DECIMAL(18,6))) AS DOUBLE) > 0 THEN
      |    ROUND((CAST(SUM(CAST(speed AS DECIMAL(18,6))) AS DOUBLE) / COUNT(speed))
      |      / (CAST(SUM(CAST(fuel AS DECIMAL(18,6))) AS DOUBLE) / COUNT(fuel)), 6) END
      |    AS efficiency
      |FROM speed JOIN fuel USING (user_id, bucket_ms)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Battery-health analysis template's data feed (analysis-templates
    * .ts:173: electrical.batteries.*.voltage) — per (vessel, day):
    * sample count, mean/min voltage, low-voltage sample share, and the
    * intra-day least-squares trend (discharge slope). `error` events
    * play the voltage path. Same exact-decimal regression arithmetic
    * as sk_trend_slope (degenerate day → NULL slope in both engines);
    * one window for the day origin + one partial-aggregated shuffle. */
  def batteryHealth(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "day_ms")
    val base = Tables.events(spark, dir)
      .where(col("event_type") === "error")
      .withColumn("day_ms", bucketOfMs(col("ts_ms"), 86400000L))
      .withColumn("t0", min("ts_ms").over(w))
      .withColumn("x", (col("ts_ms") - col("t0")).cast(DecimalType(38, 0)))
      .withColumn("y", col("value").cast(DecimalType(18, 6)))
    base.groupBy("user_id", "day_ms")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        min("value").as("min_voltage"),
        count(when(col("value") < 50.0, 1)).as("n_low"))
      .select(col("user_id"), col("day_ms"), col("n"),
        r6(col("sy") / col("n")).as("mean_voltage"),
        col("min_voltage"),
        r6(col("n_low").cast("double") / col("n")).as("low_frac"),
        when((col("n") * col("sxx") - col("sx") * col("sx")) > 0.0,
          r6((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")) * lit(86400000.0)))
          .as("slope_per_day"))
      .orderBy("user_id", "day_ms")
  }

  val batteryHealthOracle: String =
    """WITH base AS (
      |  SELECT user_id, epoch_ms(ts) AS ts_ms, value,
      |    CAST(FLOOR(epoch_ms(ts) / 86400000) * 86400000 AS BIGINT) AS day_ms
      |  FROM events WHERE event_type = 'error'
      |), xy AS (
      |  SELECT user_id, day_ms, value,
      |    CAST(ts_ms - MIN(ts_ms) OVER (PARTITION BY user_id, day_ms)
      |      AS DECIMAL(38,0)) AS x,
      |    CAST(value AS DECIMAL(18,6)) AS y
      |  FROM base
      |), sums AS (
      |  SELECT user_id, day_ms, COUNT(*) AS n,
      |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
      |    CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * x) AS DOUBLE) AS sxx,
      |    MIN(value) AS min_voltage,
      |    COUNT(*) FILTER (WHERE value < 50.0) AS n_low
      |  FROM xy GROUP BY 1, 2
      |)
      |SELECT user_id, day_ms, n,
      |  ROUND(sy / n, 6) AS mean_voltage, min_voltage,
      |  ROUND(CAST(n_low AS DOUBLE) / n, 6) AS low_frac,
      |  CASE WHEN (n * sxx - sx * sx) > 0.0 THEN
      |    ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) * 86400000.0, 6) + 0.0
      |  END AS slope_per_day
      |FROM sums ORDER BY 1, 2""".stripMargin

  /** Weather-impact analysis template's data feed (analysis-templates
    * .ts:115: environment.wind vs vessel performance) — per (vessel,
    * across days): day-aligned wind (`error` events) and speed
    * (`click`) series, their means, and the Pearson correlation
    * between them — "how does wind affect my speed", the template's
    * headline statistic. Exact-decimal sums (sk_series_correlation's
    * discipline) over per-day bucket means; degenerate vessels
    * (single aligned day or zero variance) are filtered on the exact
    * double expression both engines compute. */
  def weatherImpact(spark: SparkSession, dir: String): DataFrame = {
    def daily(tpe: String, out: String) =
      Tables.events(spark, dir).where(col("event_type") === tpe)
        .groupBy(col("user_id"),
          bucketOfMs(col("ts_ms"), 86400000L).as("day_ms"))
        .agg(r6(davg(col("value"))).as(out))
    val wind = daily("error", "wind")
    val speed = daily("click", "speed")
    val wd = col("wind").cast(DecimalType(12, 6))
    val sd = col("speed").cast(DecimalType(12, 6))
    wind.join(speed, Seq("user_id", "day_ms"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(wd).cast("double").as("sw"),
        sum(sd).cast("double").as("ss"),
        sum(wd * sd).cast("double").as("sws"),
        sum(wd * wd).cast("double").as("sww"),
        sum(sd * sd).cast("double").as("sss"))
      .withColumn("denom",
        sqrt(col("n_buckets") * col("sww") - col("sw") * col("sw")) *
          sqrt(col("n_buckets") * col("sss") - col("ss") * col("ss")))
      .where(col("n_buckets") >= 2 && col("denom") > 0.0)
      .select(col("user_id"), col("n_buckets"),
        r6(col("sw") / col("n_buckets")).as("avg_wind"),
        r6(col("ss") / col("n_buckets")).as("avg_speed"),
        r6((col("n_buckets") * col("sws") - col("sw") * col("ss")) / col("denom"))
          .as("pearson_r"))
      .orderBy("user_id")
  }

  val weatherImpactOracle: String =
    """WITH w AS (
      |  SELECT user_id,
      |    CAST(FLOOR(epoch_ms(ts) / 86400000) * 86400000 AS BIGINT) AS day_ms,
      |    CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 6)
      |      AS DECIMAL(12,6)) AS wind
      |  FROM events WHERE event_type = 'error' GROUP BY 1, 2
      |), s AS (
      |  SELECT user_id,
      |    CAST(FLOOR(epoch_ms(ts) / 86400000) * 86400000 AS BIGINT) AS day_ms,
      |    CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 6)
      |      AS DECIMAL(12,6)) AS speed
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
      |), sums AS (
      |  SELECT w.user_id, COUNT(*) AS n_buckets,
      |    CAST(SUM(wind) AS DOUBLE) AS sw, CAST(SUM(speed) AS DOUBLE) AS ss,
      |    CAST(SUM(wind * speed) AS DOUBLE) AS sws,
      |    CAST(SUM(wind * wind) AS DOUBLE) AS sww,
      |    CAST(SUM(speed * speed) AS DOUBLE) AS sss
      |  FROM w JOIN s ON w.user_id = s.user_id AND w.day_ms = s.day_ms
      |  GROUP BY 1
      |)
      |SELECT user_id, n_buckets,
      |  ROUND(sw / n_buckets, 6) AS avg_wind,
      |  ROUND(ss / n_buckets, 6) AS avg_speed,
      |  ROUND((n_buckets * sws - sw * ss) /
      |    (SQRT(n_buckets * sww - sw * sw) * SQRT(n_buckets * sss - ss * ss)), 6) + 0.0
      |    AS pearson_r
      |FROM sums
      |WHERE n_buckets >= 2
      |  AND SQRT(n_buckets * sww - sw * sw) * SQRT(n_buckets * sss - ss * ss) > 0.0
      |ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_nav_summary" -> (navSummary _),
    "sk_fuel_efficiency" -> (fuelEfficiency _),
    "sk_battery_health" -> (batteryHealth _),
    "sk_weather_impact" -> (weatherImpact _))

  val oracles: Map[String, String] = Map(
    "sk_nav_summary" -> navSummaryOracle,
    "sk_fuel_efficiency" -> fuelEfficiencyOracle,
    "sk_battery_health" -> batteryHealthOracle,
    "sk_weather_impact" -> weatherImpactOracle)
}
