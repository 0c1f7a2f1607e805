package graft.spatial

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-zone geofence watch — the position-operator completion of
  * the threshold family (types.ts:192-196 `inBoundingBox` /
  * `outsideBoundingBox` ThresholdConfig operators, commands.ts:913
  * level-trigger): a SET of named zones is evaluated against every
  * fix, and each (vessel, zone) series emits enter/exit transitions —
  * the anchor-watch / harbor-alert automation, for every vessel and
  * every zone in ONE pass.
  *
  * Scale shape: the zone table is a broadcast dim (a fleet's zone
  * registry is KBs); the fix stream joins it ONCE (broadcast nested
  * loop over k zones = k predicate evaluations per fix inside
  * codegen — no shuffle), then the transition detection is a lag
  * window per (vessel, zone): one hash exchange on the composite key.
  * k zones multiply the exchanged rows by k, not the passes; at
  * 100 TB with a fixed zone registry the cost is one corpus scan +
  * one k·corpus shuffle of (key, flag) pairs — and the fix stream's
  * own lat/lon stay pruned to the two columns the predicate needs.
  *
  * The demo registry (3 overlapping boxes over the synthetic track
  * field) is built inline from literal rows — standing in for the
  * reference's per-command `boundingBox` configs. Transitions use the
  * same edge-output convention as `sk_command_automation` (first row
  * emits its state, then only changes). */
object Geofence {

  // --------------------------------------------------------------- #70
  def geofence(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val zones = Seq(
      ("harbor",    40.04, 40.10, -73.92, -73.84),
      ("anchorage", 40.08, 40.16, -73.86, -73.70),
      ("channel",   40.00, 40.30, -73.80, -73.75))
      .toDF("zone", "lat_s", "lat_n", "lon_w", "lon_e")
    val w = Window.partitionBy("user_id", "zone").orderBy("ts_ms", "event_id")
    Spatial.positions(spark, dir)
      .join(broadcast(zones))
      .withColumn("inside",
        col("lat") >= col("lat_s") && col("lat") <= col("lat_n") &&
        col("lon") >= col("lon_w") && col("lon") <= col("lon_e"))
      .withColumn("prev_inside", lag("inside", 1).over(w))
      .where(col("prev_inside").isNull || col("inside") =!= col("prev_inside"))
      .select(col("user_id"), col("zone"), col("ts_ms"),
        when(col("inside"), "enter").otherwise("exit").as("transition"))
      .orderBy("user_id", "zone", "ts_ms")
  }

  val geofenceOracle: String =
    s"""WITH pos AS (${Spatial.posSql}),
       |zones AS (
       |  SELECT * FROM (VALUES
       |    ('harbor',    40.04, 40.10, -73.92, -73.84),
       |    ('anchorage', 40.08, 40.16, -73.86, -73.70),
       |    ('channel',   40.00, 40.30, -73.80, -73.75))
       |    AS z(zone, lat_s, lat_n, lon_w, lon_e)
       |), flagged AS (
       |  SELECT p.user_id, z.zone, p.ts_ms, p.event_id,
       |    (p.lat >= z.lat_s AND p.lat <= z.lat_n AND
       |     p.lon >= z.lon_w AND p.lon <= z.lon_e) AS inside
       |  FROM pos p CROSS JOIN zones z
       |), t AS (
       |  SELECT *, LAG(inside) OVER (PARTITION BY user_id, zone
       |    ORDER BY ts_ms, event_id) AS prev_inside
       |  FROM flagged
       |)
       |SELECT user_id, zone, ts_ms,
       |  CASE WHEN inside THEN 'enter' ELSE 'exit' END AS transition
       |FROM t WHERE prev_inside IS NULL OR inside <> prev_inside
       |ORDER BY user_id, zone, ts_ms""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_geofence" -> (geofence _))

  val oracles: Map[String, String] = Map(
    "sk_geofence" -> geofenceOracle)
}
