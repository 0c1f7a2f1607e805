package graft.operators

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Series analytics backing the reference's canned analysis types
  * (analysis-templates.ts: `summary | anomaly | trend | correlation`).
  * Summary and correlation are covered by profile/track/spatial ops;
  * these add the anomaly and trend analyses as engine operators.
  *
  * Cross-engine determinism: both operators are built from exact
  * DECIMAL sufficient statistics (n, Σx, Σx², Σxy) folded per series —
  * associative, partition-order independent — with the closed-form
  * combined in DOUBLE using the same operand order in Spark and the
  * oracle SQL, then rounded. No Welford/streaming variance whose
  * accumulation order differs per engine.
  *
  * Scale: one partial-aggregated shuffle per series key for the
  * statistics; the per-row pass (z-score) re-joins stats by key —
  * broadcast-sized, since there is one row per series.
  */
object Analytics {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)

  // --------------------------------------------------------- anomaly
  /** Z-score outliers per series: |x − μ| > 3σ (sample stddev). μ and
    * σ come from exact decimal Σx and Σx²; rows flagged with their
    * rounded z-score. */
  def anomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    val xd = col("value").cast(DecimalType(18, 6))
    val stats = ev(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(xd).cast("double").as("sx"),
        sum(xd * xd).cast("double").as("sx2"))
      .withColumn("mean", col("sx") / col("n"))
      .withColumn("sd", sqrt(
        (col("sx2") - col("sx") * col("sx") / col("n")) / (col("n") - 1)))
    ev(spark, dir)
      .join(broadcast(stats), Seq("user_id", "event_type"))
      .withColumn("z", r6((col("value") - col("mean")) / col("sd")))
      .where(abs(col("z")) > 3.0)
      .select("user_id", "event_type", "event_id", "ts_ms", "value", "z")
      .orderBy("user_id", "event_type", "event_id")
  }

  val anomalyOracle: String =
    """WITH stats AS (
      |  SELECT user_id, event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx2
      |  FROM events GROUP BY 1, 2
      |), s2 AS (
      |  SELECT user_id, event_type, n, sx / n AS mean,
      |    SQRT((sx2 - sx * sx / n) / (n - 1)) AS sd
      |  FROM stats
      |)
      |SELECT e.user_id, e.event_type, e.event_id, epoch_ms(e.ts) AS ts_ms, e.value,
      |  ROUND((e.value - s.mean) / s.sd, 6) AS z
      |FROM events e JOIN s2 s ON e.user_id = s.user_id AND e.event_type = s.event_type
      |WHERE ABS(ROUND((e.value - s.mean) / s.sd, 6)) > 3.0
      |ORDER BY 1, 2, 3""".stripMargin

  // ----------------------------------------------------------- trend
  /** Least-squares trend per series: slope (per day) and mean level,
    * from exact decimal Σx, Σy, Σxy, Σx² over x = ts − min(ts). The
    * centering keeps the normal-equation cancellation benign and the
    * decimal sums within DECIMAL(38) at any realistic series length. */
  def trendSlope(spark: SparkSession, dir: String): DataFrame = {
    val base = ev(spark, dir)
      .withColumn("t0", min("ts_ms").over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id", "event_type")))
      .withColumn("x", (col("ts_ms") - col("t0")).cast(DecimalType(38, 0)))
      .withColumn("y", col("value").cast(DecimalType(18, 6)))
    base.groupBy("user_id", "event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"))
      .withColumn("slope_per_day", r6(
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * lit(86400000.0)))
      .withColumn("mean_level", r6(col("sy") / col("n")))
      .select("user_id", "event_type", "n", "slope_per_day", "mean_level")
      .orderBy("user_id", "event_type")
  }

  val trendOracle: String =
    """WITH base AS (
      |  SELECT user_id, event_type,
      |    CAST(epoch_ms(ts) - MIN(epoch_ms(ts)) OVER (PARTITION BY user_id, event_type)
      |      AS DECIMAL(38,0)) AS x,
      |    CAST(value AS DECIMAL(18,6)) AS y
      |  FROM events
      |), sums AS (
      |  SELECT user_id, event_type, COUNT(*) AS n,
      |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
      |    CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * x) AS DOUBLE) AS sxx
      |  FROM base GROUP BY 1, 2
      |)
      |SELECT user_id, event_type, n,
      |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) * 86400000.0, 6) AS slope_per_day,
      |  ROUND(sy / n, 6) AS mean_level
      |FROM sums ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_anomaly_zscore" -> (anomalyZscore _),
    "sk_trend_slope" -> (trendSlope _))

  val oracles: Map[String, String] = Map(
    "sk_anomaly_zscore" -> anomalyOracle,
    "sk_trend_slope" -> trendOracle)
}
