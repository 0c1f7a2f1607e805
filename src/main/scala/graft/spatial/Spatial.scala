package graft.spatial

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Geo operators mirroring the reference's spatial analytics
  * (geo-calculator.ts, spatial-queries.ts, README "Spatial Analysis").
  *
  * The testdata has no position columns, so positions are derived
  * deterministically from `view` events (funcs.synthLat/synthLon) —
  * both engines compute the identical linear transform.
  *
  * Scale: every spatial op keys on (vessel, time-bucket) or a coarse
  * geo key before the precise predicate, so joins are equi-joins (no
  * cross products) and windows stay within a series partition.
  */
object Spatial {

  /** Deterministic position fixes: `view` events as GPS points. */
  def positions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .where(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        synthLat(col("value")).as("lat"), synthLon(col("value")).as("lon"))

  private[spatial] val posSql =
    """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
      |    40.0 + value * 0.001 AS lat, -74.0 + value * 0.002 AS lon
      |  FROM events WHERE event_type = 'view'""".stripMargin

  /** 2-D-spread position fixes: [[positions]] puts lat AND lon affine
    * in `value`, so every track is exactly collinear — right for the
    * nav demos (a vessel moves along a line), degenerate for hull
    * geometry. Here lon comes from the event id instead (a 1000-step
    * grid), giving generic-position points; both coordinate exprs are
    * IEEE-identical in DuckDB ([[graft.spatial.Hull]]'s oracle). */
  def positions2d(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .where(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        synthLat(col("value")).as("lat"),
        (lit(-74.0) + (col("event_id") % 1000) * lit(0.0002)).as("lon"))

  // --------------------------------------------------------------- #19
  /** Bounding-box filter (meridian wrap handled in funcs.inBbox). */
  def bboxFilter(spark: SparkSession, dir: String): DataFrame =
    positions(spark, dir)
      .where(inBbox(col("lat"), col("lon"), -73.9, 40.05, -73.7, 40.15))
      .orderBy("event_id")

  val bboxFilterOracle: String =
    s"""WITH pos AS ($posSql)
       |SELECT * FROM pos
       |WHERE lat >= 40.05 AND lat <= 40.15 AND lon >= -73.9 AND lon <= -73.7
       |ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------- #20
  /** Radius filter: haversine distance to a center point ≤ r. The
    * distance is rounded to mm before the comparison so the boundary
    * decision is identical in both engines. */
  def radiusFilter(spark: SparkSession, dir: String): DataFrame =
    positions(spark, dir)
      .withColumn("dist_m", rN(haversineM(col("lat"), col("lon"), lit(40.1), lit(-73.8)), 3))
      .where(col("dist_m") <= 5000.0)
      .select("event_id", "user_id", "ts_ms", "dist_m")
      .orderBy("event_id")

  val radiusFilterOracle: String =
    s"""WITH pos AS ($posSql)
       |SELECT event_id, user_id, ts_ms,
       |  ROUND(2 * 6371000 * ASIN(SQRT(
       |    POWER(SIN(RADIANS(40.1 - lat) / 2), 2) +
       |    COS(RADIANS(lat)) * COS(RADIANS(40.1)) *
       |    POWER(SIN(RADIANS(-73.8 - lon) / 2), 2))), 3) AS dist_m
       |FROM pos
       |WHERE ROUND(2 * 6371000 * ASIN(SQRT(
       |    POWER(SIN(RADIANS(40.1 - lat) / 2), 2) +
       |    COS(RADIANS(lat)) * COS(RADIANS(40.1)) *
       |    POWER(SIN(RADIANS(-73.8 - lon) / 2), 2))), 3) <= 5000.0
       |ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------- #21
  /** Spatial correlation (HistoryAPI.ts:788-941): return `purchase`
    * events from the hourly buckets in which the user's position was
    * inside the bbox — a semi-join on (user, bucket), never a scan of
    * the correlated path by location. */
  def spatialCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val inArea = positions(spark, dir)
      .where(inBbox(col("lat"), col("lon"), -73.9, 40.05, -73.7, 40.15))
      .select(col("user_id"), bucketOfMs(col("ts_ms"), 3600000L).as("bucket_ms"))
      .distinct()
    Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .withColumn("bucket_ms", bucketOfMs(col("ts_ms"), 3600000L))
      .join(inArea, Seq("user_id", "bucket_ms"), "left_semi")
      .select("event_id", "user_id", "ts_ms", "value")
      .orderBy("event_id")
  }

  val spatialCorrelationOracle: String =
    s"""WITH pos AS ($posSql),
       |in_area AS (
       |  SELECT DISTINCT user_id,
       |    CAST(FLOOR(ts_ms / 3600000) * 3600000 AS BIGINT) AS bucket_ms
       |  FROM pos
       |  WHERE lat >= 40.05 AND lat <= 40.15 AND lon >= -73.9 AND lon <= -73.7
       |)
       |SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value
       |FROM events e
       |WHERE event_type = 'purchase' AND EXISTS (
       |  SELECT 1 FROM in_area a
       |  WHERE a.user_id = e.user_id
       |    AND a.bucket_ms = CAST(FLOOR(epoch_ms(e.ts) / 3600000) * 3600000 AS BIGINT))
       |ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------- #52
  /** Spatial context discovery (context-discovery.ts:229,
    * getContextsInSpatialFilter): which vessels/contexts have ≥1
    * position fix inside a bbox during a time range, with fix count
    * and first/last seen — the multi-vessel entry point of the
    * reference's spatial filter. One filtered scan (time range +
    * bbox pushed down / evaluated pre-shuffle) and one partial-
    * aggregated groupBy on the context key; output is O(#contexts),
    * never the fixes themselves. */
  def spatialContexts(spark: SparkSession, dir: String): DataFrame =
    positions(spark, dir)
      .where(col("ts_ms") >= 1704672000000L && col("ts_ms") < 1705881600000L)
      .where(inBbox(col("lat"), col("lon"), -73.9, 40.05, -73.7, 40.15))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_fixes"),
        min("ts_ms").as("first_ms"), max("ts_ms").as("last_ms"))
      .orderBy("user_id")

  val spatialContextsOracle: String =
    s"""WITH pos AS ($posSql)
       |SELECT user_id, COUNT(*) AS n_fixes,
       |  MIN(ts_ms) AS first_ms, MAX(ts_ms) AS last_ms
       |FROM pos
       |WHERE ts_ms >= 1704672000000 AND ts_ms < 1705881600000
       |  AND lat >= 40.05 AND lat <= 40.15 AND lon >= -73.9 AND lon <= -73.7
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- #22
  /** Track statistics per (vessel, day): distance traveled (LAG +
    * haversine, README "Calculate distance traveled"), centroid,
    * bounding box, approximate area. */
  def trackStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val withDist = positions(spark, dir)
      .withColumn("prev_lat", lag("lat", 1).over(w))
      .withColumn("prev_lon", lag("lon", 1).over(w))
      .withColumn("dist_m", when(col("prev_lat").isNull, lit(0.0))
        .otherwise(rN(haversineM(col("prev_lat"), col("prev_lon"), col("lat"), col("lon")), 3)))
      .withColumn("day_ms", bucketOfMs(col("ts_ms"), 86400000L))
    withDist.groupBy("user_id", "day_ms")
      .agg(
        sum(col("dist_m").cast(DecimalType(18, 3))).cast("double").as("total_distance_m"),
        r6(davg(col("lat"))).as("centroid_lat"),
        r6(davg(col("lon"))).as("centroid_lon"),
        min("lat").as("min_lat"), max("lat").as("max_lat"),
        min("lon").as("min_lon"), max("lon").as("max_lon"),
        count(lit(1)).as("n_points"))
      .orderBy("user_id", "day_ms")
  }

  val trackStatsOracle: String =
    s"""WITH pos AS ($posSql),
       |with_dist AS (
       |  SELECT *,
       |    CAST(FLOOR(ts_ms / 86400000) * 86400000 AS BIGINT) AS day_ms,
       |    LAG(lat) OVER w AS prev_lat, LAG(lon) OVER w AS prev_lon
       |  FROM pos
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
       |), d AS (
       |  SELECT *,
       |    CASE WHEN prev_lat IS NULL THEN 0.0 ELSE
       |      ROUND(2 * 6371000 * ASIN(SQRT(
       |        POWER(SIN(RADIANS(lat - prev_lat) / 2), 2) +
       |        COS(RADIANS(prev_lat)) * COS(RADIANS(lat)) *
       |        POWER(SIN(RADIANS(lon - prev_lon) / 2), 2))), 3) END AS dist_m
       |  FROM with_dist
       |)
       |SELECT user_id, day_ms,
       |  CAST(SUM(CAST(dist_m AS DECIMAL(18,3))) AS DOUBLE) AS total_distance_m,
       |  ROUND(CAST(SUM(CAST(lat AS DECIMAL(18,6))) AS DOUBLE) / COUNT(lat), 6) AS centroid_lat,
       |  ROUND(CAST(SUM(CAST(lon AS DECIMAL(18,6))) AS DOUBLE) / COUNT(lon), 6) AS centroid_lon,
       |  MIN(lat) AS min_lat, MAX(lat) AS max_lat,
       |  MIN(lon) AS min_lon, MAX(lon) AS max_lon,
       |  COUNT(*) AS n_points
       |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------- #23
  /** Multi-vessel proximity: representative fix per (vessel, hour),
    * pairs of distinct vessels within 2 km in the same hour
    * (README "Multi-vessel proximity analysis").
    *
    * Scale shape: the join key is (time bucket, GEO CELL), not the
    * bucket alone — a bucket-only equi-join materializes every vessel
    * pair in the hour (V²/bucket, the classic proximity scale-killer
    * when the fleet grows 100×). Cells are 0.025° lat × 0.03° lon,
    * both strictly wider than 2 km for |lat| ≲ 53° (0.025° lat =
    * 2.78 km; 0.03° lon = 2.36 km even at 45°), so any qualifying
    * pair sits in the same or an adjacent cell: side A explodes to
    * its 3×3 cell neighborhood, side B stays in its own cell, and the
    * equi-join is lossless — each candidate pair matches exactly once
    * (B's cell is unique). Pair volume is now bounded by local
    * density, not fleet size; the precise haversine runs after. */
  def proximityJoin(spark: SparkSession, dir: String): DataFrame = {
    // pinned (localCheckpoint, not cache: no session-lifetime
    // CacheManager entry): the per-(vessel, hour) representative table
    // feeds both self-join sides — without it the raw-fix scan + agg
    // run twice
    val rep = positions(spark, dir)
      .groupBy(col("user_id"), bucketOfMs(col("ts_ms"), 3600000L).as("bucket_ms"))
      .agg(min_by(col("lat"), col("event_id")).as("lat"),
        min_by(col("lon"), col("event_id")).as("lon"))
      .withColumn("cla", floor(col("lat") / lit(0.025)).cast("long"))
      .withColumn("clo", floor(col("lon") / lit(0.03)).cast("long"))
      .localCheckpoint()
    val a = rep.select(col("bucket_ms"), col("user_id").as("user_a"),
        col("lat").as("lat_a"), col("lon").as("lon_a"), col("cla"), col("clo"))
      .withColumn("d", explode(expr(
        "transform(sequence(0, 8), i -> named_struct(" +
          "'dla', CAST(i div 3 AS BIGINT) - 1L, 'dlo', CAST(i % 3 AS BIGINT) - 1L))")))
      .withColumn("cla", col("cla") + col("d.dla"))
      .withColumn("clo", col("clo") + col("d.dlo"))
      .drop("d")
    val b = rep.select(col("bucket_ms"), col("user_id").as("user_b"),
      col("lat").as("lat_b"), col("lon").as("lon_b"), col("cla"), col("clo"))
    a.join(b, Seq("bucket_ms", "cla", "clo"))
      .where(col("user_a") < col("user_b"))
      .withColumn("dist_m", rN(haversineM(col("lat_a"), col("lon_a"), col("lat_b"), col("lon_b")), 3))
      .where(col("dist_m") <= 2000.0)
      .select("bucket_ms", "user_a", "user_b", "dist_m")
      .orderBy("bucket_ms", "user_a", "user_b")
  }

  val proximityJoinOracle: String =
    s"""WITH pos AS ($posSql),
       |rep AS (
       |  SELECT user_id,
       |    CAST(FLOOR(ts_ms / 3600000) * 3600000 AS BIGINT) AS bucket_ms,
       |    arg_min(lat, event_id) AS lat, arg_min(lon, event_id) AS lon
       |  FROM pos GROUP BY 1, 2
       |), pairs AS (
       |  SELECT a.bucket_ms, a.user_id AS user_a, b.user_id AS user_b,
       |    ROUND(2 * 6371000 * ASIN(SQRT(
       |      POWER(SIN(RADIANS(b.lat - a.lat) / 2), 2) +
       |      COS(RADIANS(a.lat)) * COS(RADIANS(b.lat)) *
       |      POWER(SIN(RADIANS(b.lon - a.lon) / 2), 2))), 3) AS dist_m
       |  FROM rep a JOIN rep b
       |    ON a.bucket_ms = b.bucket_ms AND a.user_id < b.user_id
       |)
       |SELECT * FROM pairs WHERE dist_m <= 2000.0
       |ORDER BY bucket_ms, user_a, user_b""".stripMargin

  // --------------------------------------------------------------- #24
  /** Bearing between consecutive fixes per vessel
    * (geo-calculator.ts:calculateBearing). */
  private def bearingsBase(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    positions(spark, dir)
      .withColumn("prev_lat", lag("lat", 1).over(w))
      .withColumn("prev_lon", lag("lon", 1).over(w))
      .where(col("prev_lat").isNotNull)
      .withColumn("bearing_deg",
        r6(bearingDeg(col("prev_lat"), col("prev_lon"), col("lat"), col("lon"))))
      .select("event_id", "user_id", "ts_ms", "bearing_deg")
  }

  def bearings(spark: SparkSession, dir: String): DataFrame =
    bearingsBase(spark, dir).orderBy("event_id")

  val bearingsOracle: String =
    s"""WITH pos AS ($posSql),
       |p AS (
       |  SELECT *, LAG(lat) OVER w AS prev_lat, LAG(lon) OVER w AS prev_lon
       |  FROM pos WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
       |)
       |SELECT event_id, user_id, ts_ms,
       |  ROUND((DEGREES(ATAN2(
       |    SIN(RADIANS(lon - prev_lon)) * COS(RADIANS(lat)),
       |    COS(RADIANS(prev_lat)) * SIN(RADIANS(lat)) -
       |    SIN(RADIANS(prev_lat)) * COS(RADIANS(lat)) * COS(RADIANS(lon - prev_lon))
       |  )) + 360.0) % 360.0, 6) AS bearing_deg
       |FROM p WHERE prev_lat IS NOT NULL
       |ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------- #11
  /** Representative position per bucket with GPS-glitch scoring —
    * mirrors aggregation-service.ts:543-667: candidates are ranked by
    * (clean-neighbor count desc, at/after bucket midpoint, distance to
    * midpoint), where a neighbor is "glitchy" if the implied speed
    * exceeds 25 m/s; bucket stats (sample_count, first/last ts) come
    * from the full bucket. */
  def positionBucket(spark: SparkSession, dir: String): DataFrame = {
    val res = 21600000L // 6h buckets
    val maxSpeed = 25.0
    val base = positions(spark, dir)
      .withColumn("bucket_ms", bucketOfMs(col("ts_ms"), res))
    val w = Window.partitionBy("user_id", "bucket_ms").orderBy("ts_ms", "event_id")
    val speedOk = (lat1: String, lon1: String, lat2: String, lon2: String, dtMs: org.apache.spark.sql.Column) =>
      r6(rN(haversineM(col(lat1), col(lon1), col(lat2), col(lon2)), 3) /
        greatest(dtMs / lit(1000.0), lit(0.001))) <= maxSpeed
    val scored = base
      .withColumn("prev_lat", lag("lat", 1).over(w))
      .withColumn("prev_lon", lag("lon", 1).over(w))
      .withColumn("prev_ts", lag("ts_ms", 1).over(w))
      .withColumn("next_lat", lead("lat", 1).over(w))
      .withColumn("next_lon", lead("lon", 1).over(w))
      .withColumn("next_ts", lead("ts_ms", 1).over(w))
      .withColumn("mid_ms", col("bucket_ms") + lit(res / 2))
      .withColumn("prev_ok", when(col("prev_ts").isNull, lit(1))
        .otherwise(when(speedOk("prev_lat", "prev_lon", "lat", "lon", col("ts_ms") - col("prev_ts")), lit(1)).otherwise(lit(0))))
      .withColumn("next_ok", when(col("next_ts").isNull, lit(1))
        .otherwise(when(speedOk("lat", "lon", "next_lat", "next_lon", col("next_ts") - col("ts_ms")), lit(1)).otherwise(lit(0))))
    // representative pick + bucket stats in ONE grouped aggregation:
    // min_by over the same total order the old rank window used
    // ((-(links), late-flag, |ts-mid|, event_id) min ≡ that orderBy),
    // computed alongside count/min/max — replaces a second window
    // sort, a separate stats aggregation over base, and their join.
    // The lag/lead window above already shuffled on the same key, so
    // this aggregation is partial-agg'd with no further exchange.
    scored.groupBy("user_id", "bucket_ms")
      .agg(
        min_by(struct(col("lat"), col("lon")),
          struct((col("prev_ok") + col("next_ok")) * -1,
            when(col("ts_ms") >= col("mid_ms"), lit(0)).otherwise(lit(1)),
            abs(col("ts_ms") - col("mid_ms")),
            col("event_id"))).as("best"),
        count(lit(1)).as("sample_count"),
        min("ts_ms").as("first_ts_ms"), max("ts_ms").as("last_ts_ms"))
      .select(col("user_id"), col("bucket_ms"),
        col("best.lat").as("lat"), col("best.lon").as("lon"),
        col("sample_count"), col("first_ts_ms"), col("last_ts_ms"))
      .orderBy("user_id", "bucket_ms")
  }

  val positionBucketOracle: String =
    s"""WITH pos AS ($posSql),
       |b AS (
       |  SELECT *, CAST(FLOOR(ts_ms / 21600000) * 21600000 AS BIGINT) AS bucket_ms
       |  FROM pos
       |), n AS (
       |  SELECT *,
       |    LAG(lat) OVER w AS prev_lat, LAG(lon) OVER w AS prev_lon, LAG(ts_ms) OVER w AS prev_ts,
       |    LEAD(lat) OVER w AS next_lat, LEAD(lon) OVER w AS next_lon, LEAD(ts_ms) OVER w AS next_ts,
       |    bucket_ms + 10800000 AS mid_ms
       |  FROM b
       |  WINDOW w AS (PARTITION BY user_id, bucket_ms ORDER BY ts_ms, event_id)
       |), s AS (
       |  SELECT *,
       |    CASE WHEN prev_ts IS NULL THEN 1
       |         WHEN ROUND(ROUND(2 * 6371000 * ASIN(SQRT(
       |             POWER(SIN(RADIANS(lat - prev_lat) / 2), 2) +
       |             COS(RADIANS(prev_lat)) * COS(RADIANS(lat)) *
       |             POWER(SIN(RADIANS(lon - prev_lon) / 2), 2))), 3) /
       |           GREATEST((ts_ms - prev_ts) / 1000.0, 0.001), 6) <= 25.0 THEN 1 ELSE 0 END AS prev_ok,
       |    CASE WHEN next_ts IS NULL THEN 1
       |         WHEN ROUND(ROUND(2 * 6371000 * ASIN(SQRT(
       |             POWER(SIN(RADIANS(next_lat - lat) / 2), 2) +
       |             COS(RADIANS(lat)) * COS(RADIANS(next_lat)) *
       |             POWER(SIN(RADIANS(next_lon - lon) / 2), 2))), 3) /
       |           GREATEST((next_ts - ts_ms) / 1000.0, 0.001), 6) <= 25.0 THEN 1 ELSE 0 END AS next_ok
       |  FROM n
       |), r AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY user_id, bucket_ms
       |    ORDER BY (prev_ok + next_ok) DESC,
       |      CASE WHEN ts_ms >= mid_ms THEN 0 ELSE 1 END,
       |      ABS(ts_ms - mid_ms), event_id) AS rn
       |  FROM s
       |), stats AS (
       |  SELECT user_id, bucket_ms, COUNT(*) AS sample_count,
       |    MIN(ts_ms) AS first_ts_ms, MAX(ts_ms) AS last_ts_ms
       |  FROM b GROUP BY 1, 2
       |)
       |SELECT r.user_id, r.bucket_ms, r.lat, r.lon,
       |  stats.sample_count, stats.first_ts_ms, stats.last_ts_ms
       |FROM r JOIN stats ON r.user_id = stats.user_id AND r.bucket_ms = stats.bucket_ms
       |WHERE r.rn = 1
       |ORDER BY r.user_id, r.bucket_ms""".stripMargin

  // ------------------------------------------------------- turn rate
  /** Course change between consecutive fixes: the shortest signed
    * bearing difference (angle-converter.ts:angularDifferenceDegrees),
    * positive = clockwise turn. Window-chained on the [[bearings]]
    * output — still a single per-vessel sort at scale, since both
    * windows share the (user_id; ts, event_id) ordering. */
  def turnRate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    // bearingsBase (not bearings): the presentation orderBy would sit
    // as a global exchange+sort between the two windows; the chained
    // windows share their (user_id; ts, event_id) sort instead.
    bearingsBase(spark, dir)
      .withColumn("prev_bearing", lag("bearing_deg", 1).over(w))
      .where(col("prev_bearing").isNotNull)
      .withColumn("turn_deg",
        r6(graft.funcs.angularDiffDeg(col("prev_bearing"), col("bearing_deg"))))
      .select("event_id", "user_id", "ts_ms", "bearing_deg", "turn_deg")
      .orderBy("event_id")
  }

  val turnRateOracle: String =
    s"""WITH pos AS ($posSql),
       |p AS (
       |  SELECT *, LAG(lat) OVER w AS prev_lat, LAG(lon) OVER w AS prev_lon
       |  FROM pos WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
       |),
       |b AS (
       |  SELECT event_id, user_id, ts_ms,
       |    ROUND((DEGREES(ATAN2(
       |      SIN(RADIANS(lon - prev_lon)) * COS(RADIANS(lat)),
       |      COS(RADIANS(prev_lat)) * SIN(RADIANS(lat)) -
       |      SIN(RADIANS(prev_lat)) * COS(RADIANS(lat)) * COS(RADIANS(lon - prev_lon))
       |    )) + 360.0) % 360.0, 6) AS bearing_deg
       |  FROM p WHERE prev_lat IS NOT NULL
       |),
       |t AS (
       |  SELECT *, LAG(bearing_deg) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_bearing
       |  FROM b
       |)
       |SELECT event_id, user_id, ts_ms, bearing_deg,
       |  ROUND((((bearing_deg - prev_bearing + 180.0) % 360.0 + 360.0) % 360.0) - 180.0, 6) + 0.0 AS turn_deg
       |FROM t WHERE prev_bearing IS NOT NULL
       |ORDER BY event_id""".stripMargin

  // -------------------------------------------------------- anchorage
  /** Anchorage detection — analysis-templates.ts:90 "Anchoring
    * Behavior Analysis" (anchoring locations, durations, drag): a
    * stationary episode is a maximal run of fixes each moving less
    * than `thresholdM` from the previous fix; each episode reports
    * span, fix count, the anchor position (first stationary fix) and
    * the anchor-drag metric (max drift from that position).
    *
    * Gaps-and-islands over the per-vessel ordered window: one shuffle
    * on the vessel key, every window stays inside it — at 100 TB the
    * same exchange every per-series operator pays, nothing quadratic.
    * Haversine outputs are rounded to 6 dp before the threshold and
    * the max so both engines agree bit-for-bit. */
  def anchorages(spark: SparkSession, dir: String): DataFrame = {
    val thresholdM = 8000.0
    val minFixes = 5
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val stepped = positions(spark, dir)
      .withColumn("step_m", r6(haversineM(
        lag("lat", 1).over(w), lag("lon", 1).over(w), col("lat"), col("lon"))))
      .withColumn("moving",
        col("step_m").isNull || col("step_m") >= lit(thresholdM))
      .withColumn("grp",
        sum(when(col("moving"), 1L).otherwise(0L)).over(w))
    val wg = Window.partitionBy("user_id", "grp").orderBy("ts_ms", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stepped.where(!col("moving"))
      .withColumn("anchor_lat", first("lat").over(wg))
      .withColumn("anchor_lon", first("lon").over(wg))
      .withColumn("drift_m", r6(haversineM(
        col("anchor_lat"), col("anchor_lon"), col("lat"), col("lon"))))
      .groupBy("user_id", "grp")
      .agg(
        min("ts_ms").as("start_ms"),
        max("ts_ms").as("end_ms"),
        ((max("ts_ms") - min("ts_ms")) / lit(1000.0)).as("duration_s"),
        count(lit(1)).as("n_fixes"),
        min_by(col("anchor_lat"), col("ts_ms")).as("anchor_lat"),
        min_by(col("anchor_lon"), col("ts_ms")).as("anchor_lon"),
        max("drift_m").as("max_drift_m"))
      .where(col("n_fixes") >= minFixes)
      .drop("grp")
      .orderBy("user_id", "start_ms")
  }

  val anchoragesOracle: String =
    s"""WITH pos AS ($posSql),
       |d AS (
       |  SELECT user_id, ts_ms, event_id, lat, lon,
       |    ROUND(2 * 6371000 * ASIN(SQRT(
       |      POWER(SIN(RADIANS(lat - LAG(lat) OVER w) / 2), 2) +
       |      COS(RADIANS(LAG(lat) OVER w)) * COS(RADIANS(lat)) *
       |      POWER(SIN(RADIANS(lon - LAG(lon) OVER w) / 2), 2))), 6) AS step_m
       |  FROM pos WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
       |), g AS (
       |  SELECT *, SUM(CASE WHEN step_m IS NULL OR step_m >= 8000.0 THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS grp
       |  FROM d
       |), s AS (
       |  SELECT *,
       |    first_value(lat) OVER wg AS anchor_lat,
       |    first_value(lon) OVER wg AS anchor_lon
       |  FROM g WHERE NOT (step_m IS NULL OR step_m >= 8000.0)
       |  WINDOW wg AS (PARTITION BY user_id, grp ORDER BY ts_ms, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |)
       |SELECT user_id, MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
       |  (MAX(ts_ms) - MIN(ts_ms)) / 1000.0 AS duration_s,
       |  COUNT(*) AS n_fixes,
       |  arg_min(anchor_lat, ts_ms) AS anchor_lat,
       |  arg_min(anchor_lon, ts_ms) AS anchor_lon,
       |  MAX(ROUND(2 * 6371000 * ASIN(SQRT(
       |    POWER(SIN(RADIANS(lat - anchor_lat) / 2), 2) +
       |    COS(RADIANS(anchor_lat)) * COS(RADIANS(lat)) *
       |    POWER(SIN(RADIANS(lon - anchor_lon) / 2), 2))), 6)) AS max_drift_m
       |FROM s GROUP BY user_id, grp HAVING COUNT(*) >= 5
       |ORDER BY user_id, start_ms""".stripMargin

  // -------------------------------------------- command automation
  /** Position-triggered command automation — commands.ts's threshold
    * monitors with a position operator (types.ts ThresholdConfig:
    * `outsideRadius` + `activateOnMatch`, the anchor-watch pattern):
    * the command is LEVEL-triggered (commands.ts:913 "set to
    * activateOnMatch when condition met, opposite when not"), so the
    * emitted events are the STATE TRANSITIONS, not every sample.
    * Here each vessel's watch circle is centered on its first fix
    * (the "anchor"), radius 5 km; output is every activate/deactivate
    * edge with its timestamp and distance.
    *
    * One shuffle on the vessel key; first-fix anchor via a running
    * first_value window, transition dedup via LAG — all inside the
    * same per-vessel ordered window pass. */
  def commandAutomation(spark: SparkSession, dir: String): DataFrame = {
    val radiusM = 5000.0
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val wg = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    positions(spark, dir)
      .withColumn("anchor_lat", first("lat").over(wg))
      .withColumn("anchor_lon", first("lon").over(wg))
      .withColumn("dist_m", r6(haversineM(
        col("anchor_lat"), col("anchor_lon"), col("lat"), col("lon"))))
      .withColumn("active", col("dist_m") >= lit(radiusM))
      .withColumn("prev_active", lag("active", 1).over(w))
      .where(col("prev_active").isNull || col("active") =!= col("prev_active"))
      .select(col("user_id"), col("ts_ms"),
        when(col("active"), "activated").otherwise("deactivated").as("transition"),
        col("dist_m"))
      .orderBy("user_id", "ts_ms")
  }

  val commandAutomationOracle: String =
    s"""WITH pos AS ($posSql),
       |a AS (
       |  SELECT user_id, ts_ms, event_id, lat, lon,
       |    first_value(lat) OVER wg AS anchor_lat,
       |    first_value(lon) OVER wg AS anchor_lon
       |  FROM pos
       |  WINDOW wg AS (PARTITION BY user_id ORDER BY ts_ms, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |), d AS (
       |  SELECT user_id, ts_ms, event_id,
       |    ROUND(2 * 6371000 * ASIN(SQRT(
       |      POWER(SIN(RADIANS(lat - anchor_lat) / 2), 2) +
       |      COS(RADIANS(anchor_lat)) * COS(RADIANS(lat)) *
       |      POWER(SIN(RADIANS(lon - anchor_lon) / 2), 2))), 6) AS dist_m
       |  FROM a
       |), s AS (
       |  SELECT *, dist_m >= 5000.0 AS active,
       |    LAG(dist_m >= 5000.0) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev_active
       |  FROM d
       |)
       |SELECT user_id, ts_ms,
       |  CASE WHEN active THEN 'activated' ELSE 'deactivated' END AS transition,
       |  dist_m
       |FROM s WHERE prev_active IS NULL OR active <> prev_active
       |ORDER BY user_id, ts_ms""".stripMargin

  // -------------------------------------------------------------- trips
  /** Trip segmentation — the dual of [[anchorages]] and the README's
    * track analysis unit of account: a vessel's fix stream splits into
    * trips wherever the inter-fix time gap exceeds `gapMs` (the
    * reference's track renderer breaks polylines on the same rule).
    * Per trip: span, fix count, distance (sum of per-step haversine,
    * excluding the gap-crossing step into the trip) and mean speed.
    *
    * Same gaps-and-islands shape as anchorage: one shuffle on the
    * vessel key, every window inside it. Step distances are rounded to
    * 6 dp and summed through an exact decimal accumulator, so the trip
    * totals are bit-stable across engines and partition orders. */
  def trips(spark: SparkSession, dir: String): DataFrame = {
    val gapMs = 172800000L // 2 days — several trips per synthetic series
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val stepped = positions(spark, dir)
      .withColumn("gap_ms", col("ts_ms") - lag("ts_ms", 1).over(w))
      .withColumn("step_m", r6(haversineM(
        lag("lat", 1).over(w), lag("lon", 1).over(w), col("lat"), col("lon"))))
      .withColumn("is_new", col("gap_ms").isNull || col("gap_ms") > lit(gapMs))
      .withColumn("trip", sum(when(col("is_new"), 1L).otherwise(0L)).over(w))
    stepped
      .groupBy("user_id", "trip")
      .agg(
        min("ts_ms").as("start_ms"),
        max("ts_ms").as("end_ms"),
        count(lit(1)).as("n_fixes"),
        ((max("ts_ms") - min("ts_ms")) / lit(1000.0)).as("duration_s"),
        r6(dsum(when(col("is_new"), lit(0.0)).otherwise(col("step_m")))).as("dist_m"))
      .withColumn("avg_speed_mps",
        when(col("duration_s") > 0.0, r6(col("dist_m") / col("duration_s"))))
      .orderBy("user_id", "start_ms")
  }

  val tripsOracle: String =
    s"""WITH pos AS ($posSql),
       |d AS (
       |  SELECT user_id, ts_ms, event_id, lat, lon,
       |    ts_ms - LAG(ts_ms) OVER w AS gap_ms,
       |    ROUND(2 * 6371000 * ASIN(SQRT(
       |      POWER(SIN(RADIANS(lat - LAG(lat) OVER w) / 2), 2) +
       |      COS(RADIANS(LAG(lat) OVER w)) * COS(RADIANS(lat)) *
       |      POWER(SIN(RADIANS(lon - LAG(lon) OVER w) / 2), 2))), 6) AS step_m
       |  FROM pos WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
       |), g AS (
       |  SELECT *, (gap_ms IS NULL OR gap_ms > 172800000) AS is_new,
       |    SUM(CASE WHEN gap_ms IS NULL OR gap_ms > 172800000 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS trip
       |  FROM d
       |), t AS (
       |  SELECT user_id, CAST(trip AS BIGINT) AS trip,
       |    MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms,
       |    COUNT(*) AS n_fixes,
       |    (MAX(ts_ms) - MIN(ts_ms)) / 1000.0 AS duration_s,
       |    ROUND(CAST(SUM(CAST(CASE WHEN is_new THEN 0.0 ELSE step_m END
       |      AS DECIMAL(18,6))) AS DOUBLE), 6) AS dist_m
       |  FROM g GROUP BY user_id, trip
       |)
       |SELECT user_id, trip, start_ms, end_ms, n_fixes, duration_s, dist_m,
       |  CASE WHEN duration_s > 0.0 THEN ROUND(dist_m / duration_s, 6) END AS avg_speed_mps
       |FROM t ORDER BY user_id, start_ms""".stripMargin

  // ---------------------------------------------------------- z-order
  /** Z-order (Morton) key over quantized (lat, lon) — the
    * multi-dimensional layout tool the flat hive layout lacks: sorting
    * or range-partitioning files by this key clusters 2-D-close fixes
    * into the same parquet row groups, so BOTH lat and lon range
    * predicates prune via column min/max stats (a lat-sorted layout
    * prunes only lat). At 100 TB: `repartitionByRange(zkey)` +
    * sortWithinPartitions before the write; queries keep their plain
    * bbox predicates and the skipping is free.
    *
    * 10 bits per dimension, bit-interleaved with plain shift/mask
    * arithmetic — codegen'd in Spark, bit-identical in the oracle. The
    * demo emits the key plus a coarse z-range histogram column so the
    * locality property itself is hash-checked. */
  /** The 20-bit interleaved z key over the 1023-capped lat/lon grid —
    * shared by [[zorderKeys]] and [[ZOrderStore]] so the staged
    * clustering and the reported key are the same arithmetic. */
  private[spatial] def zkeyOf(lat: Column, lon: Column): Column = {
    val ql = floor((lat - lit(39.0)) * lit(1000.0)).cast("long").bitwiseAND(lit(1023L))
    val qn = floor((lon + lit(75.0)) * lit(500.0)).cast("long").bitwiseAND(lit(1023L))
    (0 until 10).map { i =>
      shiftleft(shiftright(ql, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(qn, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  def zorderKeys(spark: SparkSession, dir: String): DataFrame = {
    positions(spark, dir)
      .withColumn("zkey", zkeyOf(col("lat"), col("lon")))
      .withColumn("z_bucket", expr("zkey div 65536"))
      .select("event_id", "user_id", "lat", "lon", "zkey", "z_bucket")
      .orderBy("event_id")
  }

  val zorderOracle: String = {
    val terms = (0 until 10).map { i =>
      s"(((ql >> $i) & 1) << ${2 * i + 1}) | (((qn >> $i) & 1) << ${2 * i})"
    }.mkString(" | ")
    s"""WITH pos AS ($posSql),
       |q AS (
       |  SELECT event_id, user_id, lat, lon,
       |    CAST(FLOOR((lat - 39.0) * 1000.0) AS BIGINT) & 1023 AS ql,
       |    CAST(FLOOR((lon + 75.0) * 500.0) AS BIGINT) & 1023 AS qn
       |  FROM pos
       |)
       |SELECT event_id, user_id, lat, lon,
       |  $terms AS zkey,
       |  ($terms) // 65536 AS z_bucket
       |FROM q ORDER BY event_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_zorder_key" -> (zorderKeys _),
    "sk_spatial_contexts" -> (spatialContexts _),
    "sk_trips" -> (trips _),
    "sk_command_automation" -> (commandAutomation _),
    "sk_anchorage" -> (anchorages _),
    "sk_turn_rate" -> (turnRate _),
    "sk_bbox_filter" -> (bboxFilter _),
    "sk_radius_filter" -> (radiusFilter _),
    "sk_spatial_correlation" -> (spatialCorrelation _),
    "sk_track_stats" -> (trackStats _),
    "sk_proximity_join" -> (proximityJoin _),
    "sk_bearing" -> (bearings _),
    "sk_position_bucket" -> (positionBucket _))

  val oracles: Map[String, String] = Map(
    "sk_zorder_key" -> zorderOracle,
    "sk_spatial_contexts" -> spatialContextsOracle,
    "sk_trips" -> tripsOracle,
    "sk_command_automation" -> commandAutomationOracle,
    "sk_anchorage" -> anchoragesOracle,
    "sk_turn_rate" -> turnRateOracle,
    "sk_bbox_filter" -> bboxFilterOracle,
    "sk_radius_filter" -> radiusFilterOracle,
    "sk_spatial_correlation" -> spatialCorrelationOracle,
    "sk_track_stats" -> trackStatsOracle,
    "sk_proximity_join" -> proximityJoinOracle,
    "sk_bearing" -> bearingsOracle,
    "sk_position_bucket" -> positionBucketOracle)
}
