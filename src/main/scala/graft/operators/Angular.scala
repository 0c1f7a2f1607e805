package graft.operators

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Angular (circular) statistics — the reference's vector averaging.
  *
  * AVG(10°, 350°) must be 0°, not 180°: the reference decomposes into
  * sin/cos means and recombines with ATAN2 (HistoryAPI.ts:2550), and
  * carries `value_sin_avg`/`value_cos_avg` through aggregation tiers
  * for lossless re-rollup (aggregation-service.ts:468-527).
  */
object Angular {

  // ---------------------------------------------------------------- #7
  /** Vector average per path, value interpreted as radians. */
  def angularAvg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(r6(vectorAvg(col("value"))).as("angular_mean"),
        count(lit(1)).as("sample_count"))
      .orderBy("event_type")

  val angularAvgOracle: String =
    """SELECT event_type,
      |  ROUND(ATAN2(
      |    CAST(SUM(CAST(ROUND(SIN(value),6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value),
      |    CAST(SUM(CAST(ROUND(COS(value),6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value)
      |  ), 6) + 0.0 AS angular_mean,
      |  COUNT(*) AS sample_count
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- #10
  /** Angular tier rollup with sin/cos carry: raw→5min buckets storing
    * sin/cos averages, re-aggregated to 1h with sample-count weighting,
    * recombined to the mean angle — lossless across tiers. */
  def angularTier(spark: SparkSession, dir: String): DataFrame = {
    // The 5-min tier carries exact DECIMAL sin/cos SUMS (not avgs):
    // decimal addition is associative and engine-identical, so the 1h
    // weighted mean SUM(sums)/SUM(counts) is bit-stable — no double
    // avg·n product whose decimal quantization differs across engines.
    val t5 = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"),
        bucketOfMs(col("ts_ms"), 300000L).as("bucket_ms"))
      .agg(
        sum(r6(sin(col("value"))).cast(DecimalType(18, 6))).as("sin_sum"),
        sum(r6(cos(col("value"))).cast(DecimalType(18, 6))).as("cos_sum"),
        count(lit(1)).as("sample_count"))
    t5.groupBy(col("user_id"), col("event_type"),
        bucketOfMs(col("bucket_ms"), 3600000L).as("bucket_ms1h"))
      .agg(
        (sum("sin_sum").cast("double") / sum("sample_count")).as("w_sin"),
        (sum("cos_sum").cast("double") / sum("sample_count")).as("w_cos"),
        sum("sample_count").as("sample_count"))
      .select(col("user_id"), col("event_type"), col("bucket_ms1h").as("bucket_ms"),
        r6(atan2(col("w_sin"), col("w_cos"))).as("value_avg"),
        r6(col("w_sin")).as("value_sin_avg"),
        r6(col("w_cos")).as("value_cos_avg"),
        col("sample_count"))
      .orderBy("user_id", "event_type", "bucket_ms")
  }

  val angularTierOracle: String =
    """WITH t5 AS (
      |  SELECT user_id, event_type,
      |    CAST(FLOOR(epoch_ms(ts) / 300000) * 300000 AS BIGINT) AS bucket_ms,
      |    SUM(CAST(ROUND(SIN(value),6) AS DECIMAL(18,6))) AS sin_sum,
      |    SUM(CAST(ROUND(COS(value),6) AS DECIMAL(18,6))) AS cos_sum,
      |    COUNT(*) AS sample_count
      |  FROM events GROUP BY 1, 2, 3
      |), t1h AS (
      |  SELECT user_id, event_type,
      |    CAST(FLOOR(bucket_ms / 3600000) * 3600000 AS BIGINT) AS bucket_ms,
      |    CAST(SUM(sin_sum) AS DOUBLE) / SUM(sample_count) AS w_sin,
      |    CAST(SUM(cos_sum) AS DOUBLE) / SUM(sample_count) AS w_cos,
      |    CAST(SUM(sample_count) AS BIGINT) AS sample_count
      |  FROM t5 GROUP BY 1, 2, 3
      |)
      |SELECT user_id, event_type, bucket_ms,
      |  ROUND(ATAN2(w_sin, w_cos), 6) + 0.0 AS value_avg,
      |  ROUND(w_sin, 6) + 0.0 AS value_sin_avg,
      |  ROUND(w_cos, 6) + 0.0 AS value_cos_avg,
      |  sample_count
      |FROM t1h ORDER BY user_id, event_type, bucket_ms""".stripMargin

  // -------------------------------------------------- weighted vector
  /** Magnitude-weighted angular average — the reference's
    * WEIGHTED_ANGULAR_PATHS pairing (angular-paths.ts:39-47): wind
    * direction weighted by wind speed. Here the `click` series is the
    * angle (rad) and the bucket-mean of the paired `purchase` series
    * is the magnitude; per (user, day):
    * ATAN2(Σ w·sin̄ / Σ w, Σ w·cos̄ / Σ w) over hourly buckets. */
  def angularWeighted(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val angle = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), bucketOfMs(col("ts_ms"), 3600000L).as("bucket_ms"))
      .agg(davg(r6(sin(col("value")))).as("sin_avg"),
        davg(r6(cos(col("value")))).as("cos_avg"))
    val mag = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), bucketOfMs(col("ts_ms"), 3600000L).as("bucket_ms"))
      .agg(davg(col("value")).as("w"))
    // Quantize each factor to 6 dp BEFORE the decimal cast, then
    // multiply in the decimal domain: DECIMAL(18,6)·DECIMAL(18,6) →
    // DECIMAL(·,12) is exact in both engines, so the weighted sums are
    // bit-stable (a double·double product cast to decimal is not).
    val wD = r6(col("w")).cast(DecimalType(18, 6))
    val sinD = r6(col("sin_avg")).cast(DecimalType(18, 6))
    val cosD = r6(col("cos_avg")).cast(DecimalType(18, 6))
    angle.join(mag, Seq("user_id", "bucket_ms"))
      .groupBy(col("user_id"),
        (floor(col("bucket_ms") / lit(86400000L)).cast("long") * lit(86400000L)).as("day_ms"))
      .agg(
        (sum(wD * sinD).cast("double") / sum(wD).cast("double")).as("ws"),
        (sum(wD * cosD).cast("double") / sum(wD).cast("double")).as("wc"),
        count(lit(1)).as("n_buckets"))
      .select(col("user_id"), col("day_ms"),
        r6(atan2(col("ws"), col("wc"))).as("weighted_angle"),
        col("n_buckets"))
      .orderBy("user_id", "day_ms")
  }

  val angularWeightedOracle: String =
    """WITH angle AS (
      |  SELECT user_id, CAST(FLOOR(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS bucket_ms,
      |    CAST(SUM(CAST(ROUND(SIN(value),6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS sin_avg,
      |    CAST(SUM(CAST(ROUND(COS(value),6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS cos_avg
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
      |), mag AS (
      |  SELECT user_id, CAST(FLOOR(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS bucket_ms,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS w
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
      |)
      |SELECT a.user_id,
      |  CAST(FLOOR(a.bucket_ms / 86400000) * 86400000 AS BIGINT) AS day_ms,
      |  ROUND(ATAN2(
      |    CAST(SUM(CAST(ROUND(m.w,6) AS DECIMAL(18,6)) * CAST(ROUND(a.sin_avg,6) AS DECIMAL(18,6))) AS DOUBLE)
      |      / CAST(SUM(CAST(ROUND(m.w,6) AS DECIMAL(18,6))) AS DOUBLE),
      |    CAST(SUM(CAST(ROUND(m.w,6) AS DECIMAL(18,6)) * CAST(ROUND(a.cos_avg,6) AS DECIMAL(18,6))) AS DOUBLE)
      |      / CAST(SUM(CAST(ROUND(m.w,6) AS DECIMAL(18,6))) AS DOUBLE)
      |  ), 6) + 0.0 AS weighted_angle,
      |  COUNT(*) AS n_buckets
      |FROM angle a JOIN mag m ON a.user_id = m.user_id AND a.bucket_ms = m.bucket_ms
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_angular_avg" -> (angularAvg _),
    "sk_angular_tier" -> (angularTier _),
    "sk_angular_weighted" -> (angularWeighted _))

  val oracles: Map[String, String] = Map(
    "sk_angular_avg" -> angularAvgOracle,
    "sk_angular_tier" -> angularTierOracle,
    "sk_angular_weighted" -> angularWeightedOracle)
}
