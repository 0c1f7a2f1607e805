package graft.sources

import graft.funcs._
import graft.spatial.Spatial
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GPX track import — mirrors the reference's dependency-free GPX
  * 1.0/1.1 parser (src/utils/gpx-parser.ts): extract `<trkpt>`
  * lat/lon/time (+ optional ele) into typed records.
  *
  * Fully distributed: documents stay in executors; trackpoints are
  * extracted with codegen'd regexp functions and exploded — one GPX
  * file per row in, one record per trackpoint out.
  */
object Gpx {

  /** Parse a column of GPX XML documents into trackpoint rows
    * (`lat`, `lon`, `time_str`, `ele`). Other columns are preserved. */
  def parseTrkpts(df: DataFrame, xmlCol: String): DataFrame =
    df.withColumn("_trkpt", explode(expr(
        s"regexp_extract_all($xmlCol, '(?s)<trkpt.*?</trkpt>', 0)")))
      // number pattern accepts exponent forms ('5.0E-4'): doubles
      // outside [1e-3, 1e7) stringify scientifically in the writer, and
      // a digits-only pattern would silently truncate them to garbage
      .withColumn("lat", regexp_extract(col("_trkpt"), "lat=\"([-+0-9.eE]+)\"", 1).cast("double"))
      .withColumn("lon", regexp_extract(col("_trkpt"), "lon=\"([-+0-9.eE]+)\"", 1).cast("double"))
      .withColumn("time_str", regexp_extract(col("_trkpt"), "<time>([^<]*)</time>", 1))
      .withColumn("ele", when(col("_trkpt").rlike("<ele>"),
        regexp_extract(col("_trkpt"), "<ele>([-+0-9.eE]+)</ele>", 1).cast("double")))
      .withColumn("speed", when(col("_trkpt").rlike("<speed>"),
        regexp_extract(col("_trkpt"), "<speed>([-+0-9.eE]+)</speed>", 1).cast("double")))
      // course arrives in degrees (kept, mirroring gpx-parser.ts's
      // courseDeg); the radians form feeds SignalK's
      // navigation.courseOverGroundTrue convention
      .withColumn("course_deg", when(col("_trkpt").rlike("<course>"),
        regexp_extract(col("_trkpt"), "<course>([-+0-9.eE]+)</course>", 1).cast("double")))
      .withColumn("course_rad", radians(col("course_deg")))
      .drop("_trkpt", xmlCol)

  /** Serialize position fixes into one GPX document per vessel —
    * deterministic (sorted trackpoints, fixed 6-dp coordinates).
    * `speed` (m/s) and `course_deg` columns, when present, are written
    * as the GPX 1.0 extension tags the reference parses
    * (gpx-parser.ts:16-17, 104-105). */
  def toGpx(positions: DataFrame): DataFrame = {
    val hasExt = positions.columns.contains("speed")
    // no rounding: a double's shortest string representation parses
    // back to the identical double, so the round-trip is exact and
    // engine-agnostic (decimal re-rounding here would reopen the
    // HALF_UP-vs-binary gap)
    // each tag is independently null-guarded: a missing speed/course
    // omits that tag (a bare concat would null the whole trackpoint and
    // silently drop the fix from the document)
    def tag(name: String, c: org.apache.spark.sql.Column) =
      when(c.isNull, lit("")).otherwise(
        concat(lit(s"<$name>"), c.cast("string"), lit(s"</$name>")))
    val extTags =
      if (hasExt) concat(tag("speed", col("speed")), tag("course", col("course_deg")))
      else lit("")
    positions
      .withColumn("pt", concat(
        lit("<trkpt lat=\""), r6(col("lat")).cast("string"),
        lit("\" lon=\""), r6(col("lon")).cast("string"), lit("\">"),
        lit("<time>"),
        date_format(timestamp_millis(col("ts_ms")), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"),
        lit("</time>"), extTags, lit("</trkpt>")))
      .groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("ts_ms"), col("event_id"), col("pt")))).as("pts"))
      .withColumn("gpx", concat(
        lit("<?xml version=\"1.0\"?><gpx version=\"1.1\"><trk><trkseg>"),
        concat_ws("", expr("transform(pts, p -> p.pt)")),
        lit("</trkseg></trk></gpx>")))
      .select("user_id", "gpx")
  }

  // --------------------------------------------------------------- #27
  /** Round-trip: vessel fixes (incl. synthetic speed/course extension
    * fields) → GPX documents → parsed records. The oracle computes the
    * expected records relationally, so any parser defect — core tags
    * or extensions — breaks the hash match. */
  def gpxImport(spark: SparkSession, dir: String): DataFrame =
    parseTrkpts(toGpx(graft.Tables.events(spark, dir)
        .where(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts_ms"),
          synthLat(col("value")).as("lat"), synthLon(col("value")).as("lon"),
          (col("value") / 2.0).as("speed"),
          pmod(col("value") * 3.0, lit(360.0)).as("course_deg"))), "gpx")
      .withColumn("ts_ms", unix_millis(to_timestamp(col("time_str"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")))
      .select("user_id", "ts_ms", "lat", "lon", "speed", "course_deg")
      .orderBy("user_id", "ts_ms", "lat", "lon")

  /** The extension fields hash-compare on the PARSED degree/speed
    * values: both are single identical IEEE ops on the raw value and
    * round-trip through shortest-repr strings exactly, so the oracle
    * predicts them with no rounding. The radians conversion stays out
    * of the compare — Spark's toRadians (d/180·π) and DuckDB's
    * RADIANS (d·(π/180)) differ in ulps. */
  val gpxImportOracle: String =
    """SELECT user_id, epoch_ms(ts) AS ts_ms,
      |  ROUND(40.0 + value * 0.001, 6) AS lat,
      |  ROUND(-74.0 + value * 0.002, 6) AS lon,
      |  value / 2.0 AS speed,
      |  (value * 3.0) % 360.0 AS course_deg
      |FROM events WHERE event_type = 'view'
      |ORDER BY user_id, ts_ms, lat, lon""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_gpx_import" -> (gpxImport _))

  val oracles: Map[String, String] = Map(
    "sk_gpx_import" -> gpxImportOracle)
}
