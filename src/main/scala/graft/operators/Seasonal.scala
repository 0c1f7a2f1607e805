package graft.operators

import graft.Tables
import graft.funcs.{davg, r6}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hour-of-day seasonal decomposition — the classical-decomposition
  * member of the time-series analytics family (trend =
  * [[Analytics]] sk_trend_slope, autocorrelation/change-point/MAD =
  * Analytics2): split each event-type's hourly series into a level
  * and a periodic hour-of-day component, the profile a telemetry UI
  * draws as "typical day" and an anomaly scorer subtracts before
  * thresholding (analysis-templates.ts "Overall Performance Trends"
  * seasonality caveat made computable).
  */
object Seasonal {

  // --------------------------------------------------------------- #78
  /** Per (event_type, hour-of-day 0..23): number of contributing
    * hourly buckets, the seasonal mean (mean of that phase's bucket
    * averages), and the seasonal OFFSET vs the type's overall level
    * (mean over all its buckets).
    *
    * Scale shape: ONE corpus exchange — the hourly bucket aggregation
    * (decimal partials, map-side combine); everything after runs on
    * the bucket frame (≤ types × hours — metadata-scale at any SF):
    * the phase and level means are second-stage aggregations of ≤24
    * rows per type, the sk_power_budget tiny-frame class.
    *
    * Cross-engine determinism: bucket averages are decimal-sum/count
    * doubles 6-dp rounded BEFORE the second-stage decimal sums (the
    * graph_pagerank lesson: an unrounded double can sit on a decimal
    * cast boundary), level and offset are pure double arithmetic of
    * identical operands; the offset can be negative so the oracle
    * carries the signed-zero `+ 0.0` guard (§5a #25). */
  def seasonalHod(spark: SparkSession, dir: String): DataFrame = {
    val buckets = Tables.events(spark, dir)
      .withColumn("bucket_ms",
        (floor(col("ts_ms") / lit(3600000L)) * 3600000L).cast("long"))
      .groupBy("event_type", "bucket_ms")
      .agg(r6(davg(col("value"))).as("av"))
    val level = buckets.groupBy("event_type")
      .agg(davg(col("av")).as("type_mean"))
    buckets
      .withColumn("hod",
        pmod((col("bucket_ms") / lit(3600000L)).cast("long"), lit(24L)).cast("int"))
      .groupBy("event_type", "hod")
      .agg(count(lit(1)).as("n_buckets"), davg(col("av")).as("seasonal_avg"))
      .join(broadcast(level), "event_type")
      .select(col("event_type"), col("hod"), col("n_buckets"),
        col("seasonal_avg"),
        r6(col("seasonal_avg") - col("type_mean")).as("seasonal_offset"))
      .orderBy("event_type", "hod")
  }

  val seasonalHodOracle: String =
    """WITH b AS (
      |  SELECT event_type,
      |    CAST(FLOOR(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS bucket_ms,
      |    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 6) AS av
      |  FROM events GROUP BY 1, 2
      |), lvl AS (
      |  SELECT event_type,
      |    CAST(SUM(CAST(av AS DECIMAL(18,6))) AS DOUBLE) / COUNT(av) AS type_mean
      |  FROM b GROUP BY 1
      |), s AS (
      |  SELECT event_type, CAST((bucket_ms // 3600000) % 24 AS INT) AS hod,
      |    CAST(COUNT(*) AS BIGINT) AS n_buckets,
      |    CAST(SUM(CAST(av AS DECIMAL(18,6))) AS DOUBLE) / COUNT(av) AS seasonal_avg
      |  FROM b GROUP BY 1, 2
      |)
      |SELECT s.event_type, s.hod, s.n_buckets, s.seasonal_avg,
      |  ROUND(s.seasonal_avg - lvl.type_mean, 6) + 0.0 AS seasonal_offset
      |FROM s JOIN lvl USING (event_type)
      |ORDER BY s.event_type, s.hod""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_seasonal_hod" -> (seasonalHod _))

  val oracles: Map[String, String] = Map(
    "sk_seasonal_hod" -> seasonalHodOracle)
}
