package graft.operators

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events stream: ordered funnels
  * and cohort retention — the two analysis templates an event
  * telemetry store (the reference's domain, analysis-templates.ts
  * family) is queried with at fleet scale.
  *
  * Both are ONE-SHUFFLE shapes: everything after the user_id hash
  * exchange is per-user conditional aggregation — no self-joins, no
  * per-stage re-scans, no corpus sort (the funnel's whole-partition
  * windows need no ORDER BY). Adding stages/weeks adds columns, not
  * shuffles.
  */
object Funnel {

  // --------------------------------------------------------------- #68
  /** Ordered 3-stage funnel view → engaged click (value > 120) →
    * big purchase (value > 150): a user reaches stage 2 only with a
    * qualifying click AT OR AFTER their first view, stage 3 only with
    * a qualifying purchase at or after that first qualifying click —
    * the value thresholds keep the funnel PARTIAL (every user
    * trivially completes an unthresholded one on this dense corpus,
    * which would prove nothing). Emits per-stage user counts +
    * conversion from stage 1.
    *
    * The sequential dependency (each stage's timestamp depends on the
    * previous stage's) is three chained whole-partition window minima
    * over ONE user_id exchange — the conditional-aggregation funnel,
    * not the k-way self-join one (which re-shuffles the corpus per
    * stage and dies at 100 TB). */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    val staged = Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select("user_id", "event_type", "ts_ms", "value")
      .withColumn("t1", min(when(col("event_type") === "view", col("ts_ms"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("value") > 120.0 && col("ts_ms") >= col("t1"), col("ts_ms"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("value") > 150.0 && col("ts_ms") >= col("t2"), col("ts_ms"))).over(w))
    val perUser = staged.groupBy("user_id")
      .agg(min("t1").as("t1"), min("t2").as("t2"), min("t3").as("t3"))
    val counts = perUser.agg(
      count(col("t1")).as("n_view"),
      count(col("t2")).as("n_click_after_view"),
      count(col("t3")).as("n_purchase_after_click"))
    counts.select(
      col("n_view"), col("n_click_after_view"), col("n_purchase_after_click"),
      r6(col("n_click_after_view").cast("double") / col("n_view")).as("conv_click"),
      r6(col("n_purchase_after_click").cast("double") / col("n_view")).as("conv_purchase"))
  }

  val funnelOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, value FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')
      |), st AS (
      |  SELECT user_id, event_type, ts_ms, value,
      |    MIN(CASE WHEN event_type = 'view' THEN ts_ms END) OVER w AS t1
      |  FROM e WINDOW w AS (PARTITION BY user_id)
      |), st2 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'click' AND value > 120.0
      |      AND ts_ms >= t1 THEN ts_ms END)
      |    OVER (PARTITION BY user_id) AS t2
      |  FROM st
      |), st3 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND value > 150.0
      |      AND ts_ms >= t2 THEN ts_ms END)
      |    OVER (PARTITION BY user_id) AS t3
      |  FROM st2
      |), per_user AS (
      |  SELECT user_id, MIN(t1) AS t1, MIN(t2) AS t2, MIN(t3) AS t3
      |  FROM st3 GROUP BY user_id
      |)
      |SELECT COUNT(t1) AS n_view,
      |  COUNT(t2) AS n_click_after_view,
      |  COUNT(t3) AS n_purchase_after_click,
      |  ROUND(COUNT(t2)::DOUBLE / COUNT(t1), 6) AS conv_click,
      |  ROUND(COUNT(t3)::DOUBLE / COUNT(t1), 6) AS conv_purchase
      |FROM per_user""".stripMargin

  // --------------------------------------------------------------- #69
  /** Weekly cohort retention: users grouped by FIRST-PURCHASE week
    * (the acquisition event — every user's plain first event lands in
    * the synthetic corpus's opening week, which would collapse the
    * cohorts to one), then for each cohort the count of users active
    * again (any event) k ∈ 1..4 weeks later. One user_id shuffle; the
    * cohort assignment is a whole-partition window min and the k-week
    * flags are conditional aggregates — adding weeks adds columns,
    * never passes. Users who never purchase carry no cohort and drop. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    // integral floor-div (not double /): bit-identical to the oracle's
    // BIGINT // at any magnitude
    val flagged = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts_ms div 604800000").as("week"))
      .withColumn("cohort",
        min(when(col("event_type") === "purchase", col("week"))).over(w))
      .where(col("cohort").isNotNull)
    val weekFlags = (1 to 4).map(k =>
      max(when(col("week") === col("cohort") + k, 1L).otherwise(0L)).as(s"w$k"))
    val perUser = flagged.groupBy("user_id", "cohort")
      .agg(weekFlags.head, weekFlags.tail: _*)
    perUser.groupBy("cohort")
      .agg(count(lit(1)).as("n_users"),
        sum("w1").as("r1"), sum("w2").as("r2"),
        sum("w3").as("r3"), sum("w4").as("r4"))
      .orderBy("cohort")
  }

  val cohortRetentionOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ms(ts) // 604800000 AS week FROM events
      |), c AS (
      |  SELECT user_id, week,
      |    MIN(CASE WHEN event_type = 'purchase' THEN week END)
      |      OVER (PARTITION BY user_id) AS cohort
      |  FROM e
      |), cc AS (
      |  SELECT * FROM c WHERE cohort IS NOT NULL
      |), per_user AS (
      |  SELECT user_id, cohort,
      |    MAX(CASE WHEN week = cohort + 1 THEN 1 ELSE 0 END) AS w1,
      |    MAX(CASE WHEN week = cohort + 2 THEN 1 ELSE 0 END) AS w2,
      |    MAX(CASE WHEN week = cohort + 3 THEN 1 ELSE 0 END) AS w3,
      |    MAX(CASE WHEN week = cohort + 4 THEN 1 ELSE 0 END) AS w4
      |  FROM cc GROUP BY user_id, cohort
      |)
      |SELECT cohort, COUNT(*) AS n_users,
      |  CAST(SUM(w1) AS BIGINT) AS r1, CAST(SUM(w2) AS BIGINT) AS r2,
      |  CAST(SUM(w3) AS BIGINT) AS r3, CAST(SUM(w4) AS BIGINT) AS r4
      |FROM per_user GROUP BY cohort ORDER BY cohort""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_funnel" -> (funnel _),
    "q_cohort_retention" -> (cohortRetention _))

  val oracles: Map[String, String] = Map(
    "sk_funnel" -> funnelOracle,
    "q_cohort_retention" -> cohortRetentionOracle)
}
