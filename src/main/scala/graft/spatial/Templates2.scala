package graft.spatial

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The remaining analysis-template data feeds — route-optimization,
  * power-consumption and equipment-monitoring (analysis-templates.ts:
  * 65-86, 200-225, 251-275). Together with [[Templates]] this covers
  * every template in the reference's catalog whose data side is a
  * deterministic aggregate (the LLM prose layer stays out of scope,
  * SURVEY §1).
  *
  * All three are ONE-EXCHANGE shapes on their series/report key: the
  * route feed reuses the continuous-track window of
  * [[Templates.navSummary]], the power budget is a (vessel, hour)
  * conditional aggregation plus a vessel-partition window, and the
  * drift monitor gets its per-series time bounds from whole-partition
  * window min/max so the split point costs no second scan and no
  * self-join.
  */
object Templates2 {

  // ------------------------------------------------ route-optimization
  /** Route-efficiency feed (analysis-templates.ts:65 route-optimization:
    * "identify unnecessary detours or inefficient paths" / "examine
    * frequent course changes") — per (vessel, day): fix count, track
    * distance, straight-line displacement between the day's first and
    * last fix, directness ratio (1 = sailed the rhumb line), and the
    * count of course changes sharper than 30°.
    *
    * Legs come from ONE lag window per vessel (partitioned by vessel,
    * NOT by day — a day's first leg measures from the previous day's
    * last fix and is attributed to the LATER day, exactly
    * [[Templates.navSummary]]'s continuous-track rule); per-leg
    * bearings are rounded to 6 dp before the turn test so both engines
    * compare identical doubles. The day's endpoint fixes are
    * whole-partition FIRST/LAST window values — no per-day sort-merge
    * self-join, no collect. Everything after the vessel hash exchange
    * is window + conditional aggregation. */
  def routeEfficiency(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val wDay = Window.partitionBy("user_id", "day_ms").orderBy("ts_ms", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val legs = Tables.events(spark, dir)
      .where(col("event_type") === "view")
      .select(col("user_id"), bucketOfMs(col("ts_ms"), 86400000L).as("day_ms"),
        col("ts_ms"), col("event_id"),
        synthLat(col("value")).as("lat"), synthLon(col("value")).as("lon"))
      .withColumn("prev_lat", lag("lat", 1).over(w))
      .withColumn("prev_lon", lag("lon", 1).over(w))
      .withColumn("leg_m", when(col("prev_lat").isNull, lit(0.0))
        .otherwise(rN(haversineM(col("prev_lat"), col("prev_lon"),
          col("lat"), col("lon")), 3)))
      .withColumn("bearing", when(col("prev_lat").isNotNull,
        r6(bearingDeg(col("prev_lat"), col("prev_lon"), col("lat"), col("lon")))))
      .withColumn("prev_bearing", lag("bearing", 1).over(w))
      .withColumn("turn", col("bearing").isNotNull && col("prev_bearing").isNotNull &&
        abs(angularDiffDeg(col("prev_bearing"), col("bearing"))) > lit(30.0))
      .withColumn("first_lat", first("lat").over(wDay))
      .withColumn("first_lon", first("lon").over(wDay))
      .withColumn("last_lat", last("lat").over(wDay))
      .withColumn("last_lon", last("lon").over(wDay))
    legs.groupBy("user_id", "day_ms")
      .agg(
        count(lit(1)).as("n_fixes"),
        sum(col("leg_m").cast(DecimalType(18, 3))).cast("double").as("track_m"),
        rN(haversineM(min("first_lat"), min("first_lon"),
          min("last_lat"), min("last_lon")), 3).as("straight_m"),
        count(when(col("turn"), 1)).as("n_course_changes"))
      .withColumn("directness",
        when(col("track_m") > 0.0, r6(col("straight_m") / col("track_m"))))
      .orderBy("user_id", "day_ms")
  }

  val routeEfficiencyOracle: String =
    """WITH pos AS (
      |  SELECT user_id, CAST(FLOOR(epoch_ms(ts) / 86400000) * 86400000 AS BIGINT) AS day_ms,
      |    epoch_ms(ts) AS ts_ms, event_id,
      |    40.0 + value * 0.001 AS lat, -74.0 + value * 0.002 AS lon
      |  FROM events WHERE event_type = 'view'),
      |lagged AS (
      |  SELECT *, LAG(lat) OVER w AS prev_lat, LAG(lon) OVER w AS prev_lon
      |  FROM pos WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
      |legs AS (
      |  SELECT *,
      |    CASE WHEN prev_lat IS NULL THEN 0.0 ELSE
      |      ROUND(2 * 6371000 * ASIN(SQRT(
      |        POWER(SIN(RADIANS(lat - prev_lat) / 2), 2) +
      |        COS(RADIANS(prev_lat)) * COS(RADIANS(lat)) *
      |        POWER(SIN(RADIANS(lon - prev_lon) / 2), 2))), 3) END AS leg_m,
      |    CASE WHEN prev_lat IS NOT NULL THEN
      |      ROUND(((DEGREES(ATAN2(
      |          SIN(RADIANS(lon - prev_lon)) * COS(RADIANS(lat)),
      |          COS(RADIANS(prev_lat)) * SIN(RADIANS(lat)) -
      |          SIN(RADIANS(prev_lat)) * COS(RADIANS(lat)) * COS(RADIANS(lon - prev_lon))))
      |        + 360.0) % 360.0 + 360.0) % 360.0, 6) END AS bearing
      |  FROM lagged),
      |turns AS (
      |  SELECT *, LAG(bearing) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id)
      |      AS prev_bearing,
      |    FIRST_VALUE(lat) OVER wd AS first_lat, FIRST_VALUE(lon) OVER wd AS first_lon,
      |    LAST_VALUE(lat) OVER wd AS last_lat, LAST_VALUE(lon) OVER wd AS last_lon
      |  FROM legs WINDOW wd AS (PARTITION BY user_id, day_ms ORDER BY ts_ms, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
      |agg AS (
      |  SELECT user_id, day_ms, COUNT(*) AS n_fixes,
      |    CAST(SUM(CAST(leg_m AS DECIMAL(18,3))) AS DOUBLE) AS track_m,
      |    ROUND(2 * 6371000 * ASIN(SQRT(
      |      POWER(SIN(RADIANS(MIN(last_lat) - MIN(first_lat)) / 2), 2) +
      |      COS(RADIANS(MIN(first_lat))) * COS(RADIANS(MIN(last_lat))) *
      |      POWER(SIN(RADIANS(MIN(last_lon) - MIN(first_lon)) / 2), 2))), 3) AS straight_m,
      |    COUNT(*) FILTER (WHERE bearing IS NOT NULL AND prev_bearing IS NOT NULL
      |      AND ABS(((bearing - prev_bearing + 180.0) % 360.0 + 360.0) % 360.0 - 180.0)
      |        > 30.0) AS n_course_changes
      |  FROM turns GROUP BY 1, 2)
      |SELECT user_id, day_ms, n_fixes, track_m, straight_m, n_course_changes,
      |  CASE WHEN track_m > 0.0 THEN ROUND(straight_m / track_m, 6) END AS directness
      |FROM agg ORDER BY user_id, day_ms""".stripMargin

  // ------------------------------------------------ power-consumption
  /** Power-budget feed (analysis-templates.ts:200 power-consumption:
    * "peak consumption periods", "load distribution") — the per-vessel
    * hour-of-day load profile. `error` events play
    * electrical.batteries.house.power (W). Per (vessel, hour 0-23):
    * sample count, mean load, the hour's share of the vessel's total
    * accumulated load, and a peak flag on the (deterministically
    * tie-broken) highest-mean hour.
    *
    * One (vessel, hour) hash aggregation; the share/peak columns are a
    * vessel-partition window over the 24-row-per-vessel profile — the
    * window input is the AGGREGATED frame, so its cost is O(vessels),
    * not O(samples). At warehouse scale the profile is partial-agg
    * friendly (24 groups per vessel) and nothing sorts the raw scan. */
  def powerBudget(spark: SparkSession, dir: String): DataFrame = {
    val wUser = Window.partitionBy("user_id")
    val prof = Tables.events(spark, dir)
      .where(col("event_type") === "error")
      .select(col("user_id"), (expr("ts_ms div 3600000") % 24).as("hour"), col("value"))
      .groupBy("user_id", "hour")
      .agg(count(lit(1)).as("n"),
        r6(davg(col("value"))).as("avg_w"),
        dsum(col("value")).as("sum_w"))
    val maxAvg = max(col("avg_w")).over(wUser)
    prof
      .withColumn("share", r6(col("sum_w") / sum(col("sum_w")).over(wUser)))
      .withColumn("peak_hour",
        min(when(col("avg_w") === maxAvg, col("hour"))).over(wUser))
      .withColumn("is_peak", col("hour") === col("peak_hour"))
      .select("user_id", "hour", "n", "avg_w", "share", "is_peak")
      .orderBy("user_id", "hour")
  }

  val powerBudgetOracle: String =
    """WITH prof AS (
      |  SELECT user_id, (epoch_ms(ts) // 3600000) % 24 AS hour, COUNT(*) AS n,
      |    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 6) AS avg_w,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_w
      |  FROM events WHERE event_type = 'error' GROUP BY 1, 2),
      |mx AS (
      |  SELECT *, MAX(avg_w) OVER (PARTITION BY user_id) AS max_avg FROM prof),
      |win AS (
      |  SELECT *, ROUND(sum_w / SUM(sum_w) OVER w, 6) AS share,
      |    MIN(CASE WHEN avg_w = max_avg THEN hour END) OVER w AS peak_hour
      |  FROM mx WINDOW w AS (PARTITION BY user_id))
      |SELECT user_id, hour, n, avg_w, share, hour = peak_hour AS is_peak
      |FROM win ORDER BY user_id, hour""".stripMargin

  // --------------------------------------------- equipment-monitoring
  /** Equipment-drift feed (analysis-templates.ts:251 equipment-
    * monitoring: "performance trends indicating wear or degradation" /
    * "operational efficiency changes over time") — per (vessel, path)
    * series: the mean over the first 70% of the series' time span
    * (baseline) vs the mean over the trailing 30% (recent), the
    * relative drift, and a wear flag at |drift| > 5%.
    *
    * The split point is integral epoch arithmetic (t0 + (t1-t0)*7 div
    * 10 — exact in both engines); t0/t1 are whole-partition window
    * min/max so baseline/recent resolve in the SAME pass as the
    * aggregation: one shuffle on the series key, no bounds self-join,
    * no second scan. Series with an empty side have no defined drift
    * and drop — on identical integral predicates in both engines. */
  def equipmentDrift(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
    val split = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts_ms"), col("value"))
      .withColumn("t0", min("ts_ms").over(w))
      .withColumn("t1", max("ts_ms").over(w))
      // integral div (not double /): bit-identical to the oracle's //
      .withColumn("split_ms", expr("t0 + (t1 - t0) * 7 div 10"))
    split.groupBy("user_id", "event_type")
      .agg(
        count(lit(1)).as("n"),
        count(when(col("ts_ms") > col("split_ms"), 1)).as("n_recent"),
        r6(dsum(when(col("ts_ms") <= col("split_ms"), col("value"))) /
          count(when(col("ts_ms") <= col("split_ms"), 1))).as("baseline"),
        r6(dsum(when(col("ts_ms") > col("split_ms"), col("value"))) /
          count(when(col("ts_ms") > col("split_ms"), 1))).as("recent"))
      .where(col("n_recent") > 0 && col("n_recent") < col("n") && col("baseline") =!= 0.0)
      .withColumn("drift_pct",
        r6((col("recent") - col("baseline")) / abs(col("baseline"))))
      .withColumn("drifting", abs(col("drift_pct")) > lit(0.05))
      .select("user_id", "event_type", "n", "n_recent", "baseline", "recent",
        "drift_pct", "drifting")
      .orderBy("user_id", "event_type")
  }

  val equipmentDriftOracle: String =
    """WITH b AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, value,
      |    MIN(epoch_ms(ts)) OVER w
      |      + (MAX(epoch_ms(ts)) OVER w - MIN(epoch_ms(ts)) OVER w) * 7 // 10 AS split_ms
      |  FROM events WINDOW w AS (PARTITION BY user_id, event_type)),
      |agg AS (
      |  SELECT user_id, event_type, COUNT(*) AS n,
      |    COUNT(*) FILTER (WHERE ts_ms > split_ms) AS n_recent,
      |    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE ts_ms <= split_ms)
      |        AS DOUBLE)
      |      / COUNT(CASE WHEN ts_ms <= split_ms THEN 1 END), 6) AS baseline,
      |    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE ts_ms > split_ms)
      |        AS DOUBLE)
      |      / COUNT(CASE WHEN ts_ms > split_ms THEN 1 END), 6) AS recent
      |  FROM b GROUP BY 1, 2)
      |SELECT user_id, event_type, n, n_recent, baseline, recent,
      |  ROUND((recent - baseline) / ABS(baseline), 6) AS drift_pct,
      |  ABS(ROUND((recent - baseline) / ABS(baseline), 6)) > 0.05 AS drifting
      |FROM agg
      |WHERE n_recent > 0 AND n_recent < n AND baseline <> 0.0
      |ORDER BY user_id, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_route_efficiency" -> (routeEfficiency _),
    "sk_power_budget" -> (powerBudget _),
    "sk_equipment_drift" -> (equipmentDrift _))

  val oracles: Map[String, String] = Map(
    "sk_route_efficiency" -> routeEfficiencyOracle,
    "sk_power_budget" -> powerBudgetOracle,
    "sk_equipment_drift" -> equipmentDriftOracle)
}
