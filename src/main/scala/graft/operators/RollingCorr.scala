package graft.operators

import graft.Tables
import graft.funcs.{davg, r6}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rolling cross-series correlation — the moving-window member of the
  * correlation family ([[Analytics]] sk_series_correlation is the
  * whole-range Pearson; Analytics2's sk_autocorr is the lagged self):
  * how the view/click coupling DRIFTS over time, the signal a
  * monitoring layer alarms on when two channels decouple
  * (analysis-templates.ts "correlation" made windowed).
  */
object RollingCorr {

  // --------------------------------------------------------------- #81
  /** Pearson r between the hourly 'view' and 'click' value series
    * over a trailing 24-aligned-bucket window (emitted only for full
    * windows).
    *
    * Scale shape: the ONLY corpus exchange is the hourly bucket
    * aggregation (decimal partials, map-side combine); the rolling
    * window then runs on the ALIGNED BUCKET frame, which is
    * calendar-bounded (one row per hour with both series present —
    * ~9 k rows/series-pair/year at ANY corpus size), the
    * sk_changepoint/api-EMA bounded-frame class, so its single-
    * partition ordered window is metadata-scale by construction.
    *
    * Determinism: bucket averages r6-rounded, then every windowed Σ
    * (x, y, xy, x², y²) accumulates in DECIMAL — the 6-dp operands
    * make the products exact 12-dp decimals (a double would need 18
    * significant digits and hit cast boundaries); the Pearson closed
    * form evaluates in doubles from identical decimal casts, sqrt is
    * IEEE-exact, degenerate windows (zero variance) NULL on the same
    * predicate, and r (±) carries the +0.0 oracle guard. */
  def rollingCorr(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click"))
      .groupBy(col("event_type"),
        (floor(col("ts_ms") / lit(3600000L)) * 3600000L).cast("long").as("bucket_ms"))
      .agg(r6(davg(col("value"))).as("av"))
    val x = b.where(col("event_type") === "view").select(col("bucket_ms"), col("av").as("x"))
    val y = b.where(col("event_type") === "click").select(col("bucket_ms"), col("av").as("y"))
    val d = DecimalType(18, 6)
    val j = x.join(y, "bucket_ms")
      .withColumn("xd", col("x").cast(d)).withColumn("yd", col("y").cast(d))
    val w = Window.orderBy("bucket_ms").rowsBetween(-23, 0)
    val s = j
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum("xd").over(w).cast("double"))
      .withColumn("sy", sum("yd").over(w).cast("double"))
      .withColumn("sxy", sum(col("xd") * col("yd")).over(w).cast("double"))
      .withColumn("sxx", sum(col("xd") * col("xd")).over(w).cast("double"))
      .withColumn("syy", sum(col("yd") * col("yd")).over(w).cast("double"))
      .where(col("n") === 24)
      .withColumn("num", lit(24.0) * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", (lit(24.0) * col("sxx") - col("sx") * col("sx")) *
        (lit(24.0) * col("syy") - col("sy") * col("sy")))
    s.select(col("bucket_ms"),
        when(col("den") > 0, r6(col("num") / sqrt(col("den"))))
          .otherwise(lit(null).cast("double")).as("r_roll"))
      .orderBy("bucket_ms")
  }

  val rollingCorrOracle: String =
    """WITH b AS (
      |  SELECT event_type,
      |    CAST(FLOOR(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS bucket_ms,
      |    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 6) AS av
      |  FROM events WHERE event_type IN ('view', 'click') GROUP BY 1, 2
      |), j AS (
      |  SELECT x.bucket_ms, CAST(x.av AS DECIMAL(18,6)) AS xd,
      |    CAST(y.av AS DECIMAL(18,6)) AS yd
      |  FROM (SELECT bucket_ms, av FROM b WHERE event_type = 'view') x
      |  JOIN (SELECT bucket_ms, av FROM b WHERE event_type = 'click') y USING (bucket_ms)
      |), s AS (
      |  SELECT bucket_ms,
      |    COUNT(*) OVER w AS n,
      |    CAST(SUM(xd) OVER w AS DOUBLE) AS sx,
      |    CAST(SUM(yd) OVER w AS DOUBLE) AS sy,
      |    CAST(SUM(xd * yd) OVER w AS DOUBLE) AS sxy,
      |    CAST(SUM(xd * xd) OVER w AS DOUBLE) AS sxx,
      |    CAST(SUM(yd * yd) OVER w AS DOUBLE) AS syy
      |  FROM j WINDOW w AS (ORDER BY bucket_ms ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
      |), f AS (
      |  SELECT bucket_ms, 24.0 * sxy - sx * sy AS num,
      |    (24.0 * sxx - sx * sx) * (24.0 * syy - sy * sy) AS den
      |  FROM s WHERE n = 24
      |)
      |SELECT bucket_ms,
      |  CASE WHEN den > 0 THEN ROUND(num / SQRT(den), 6) + 0.0 ELSE NULL END AS r_roll
      |FROM f ORDER BY bucket_ms""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_rolling_corr" -> (rollingCorr _))

  val oracles: Map[String, String] = Map(
    "sk_rolling_corr" -> rollingCorrOracle)
}
