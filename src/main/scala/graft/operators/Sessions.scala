package graft.operators

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stateful series operators: episode sessionization and threshold
  * automation — the reference's regimen machinery.
  */
object Sessions {

  // --------------------------------------------------------------- #15
  /** Regimen episode boundary detection
    * (claude-analyzer.ts:3206-3260): a boolean command series yields
    * episodes [start at false→true, end at the next true→false), with
    * duration and active/completed status. Here the boolean regimen is
    * derived as `value > 100` on the `click` series.
    *
    * Boundaries alternate strictly, so pairing each start with the
    * next boundary (LEAD over boundary rows) is exact — no join back.
    */
  def episodes(spark: SparkSession, dir: String): DataFrame =
    episodesUnsorted(spark, dir).orderBy("user_id", "start_ms")

  /** [[episodes]] without the final presentation sort: consumers that
    * keep working on the per-user clustering (e.g. the interval joins)
    * must not pay a range exchange that destroys it — EnsureRequirements
    * would immediately re-hash on user_id. */
  def episodesUnsorted(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val boundaries = Tables.events(spark, dir)
      .where(col("event_type") === "click")
      .withColumn("state", col("value") > 100.0)
      .withColumn("prev_state", lag("state", 1).over(w))
      .withColumn("boundary",
        when(col("state") && (col("prev_state").isNull || !col("prev_state")), "start")
          .when(!col("state") && col("prev_state"), "end"))
      .where(col("boundary").isNotNull)
    val wb = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    boundaries
      .withColumn("end_ms", lead("ts_ms", 1).over(wb))
      .where(col("boundary") === "start")
      .select(
        col("user_id"),
        col("ts_ms").as("start_ms"),
        col("end_ms"),
        when(col("end_ms").isNull, "active").otherwise("completed").as("status"),
        ((col("end_ms") - col("ts_ms")) / 1000.0).as("duration_s"))
  }

  val episodesOracle: String =
    """WITH s AS (
      |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, (value > 100.0) AS state,
      |    LAG(value > 100.0) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev_state
      |  FROM events WHERE event_type = 'click'
      |), b AS (
      |  SELECT *, CASE
      |      WHEN state AND (prev_state IS NULL OR NOT prev_state) THEN 'start'
      |      WHEN NOT state AND prev_state THEN 'end' END AS boundary
      |  FROM s
      |  WHERE (state AND (prev_state IS NULL OR NOT prev_state))
      |     OR (NOT state AND prev_state)
      |), p AS (
      |  SELECT *, LEAD(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS end_ms
      |  FROM b
      |)
      |SELECT user_id, ts_ms AS start_ms, end_ms,
      |  CASE WHEN end_ms IS NULL THEN 'active' ELSE 'completed' END AS status,
      |  (end_ms - ts_ms) / 1000.0 AS duration_s
      |FROM p WHERE boundary = 'start'
      |ORDER BY user_id, start_ms""".stripMargin

  // --------------------------------------------------------------- #16
  /** Threshold automation with hysteresis (README "Stable Triggers"):
    * fire when the condition holds, then suppress re-fires for H
    * seconds. Greedy over the ordered series. Condition: `value > 150`
    * on the `error` series, H = 24 h.
    *
    * Scale shape: condition pre-filter (pushed to the scan) →
    * repartition on the key → sortWithinPartitions → one streaming
    * pass holding only (current key, last fire time) — constant
    * memory however noisy the series, unlike the earlier per-key
    * collect_list fold whose buffer grew with the condition-true row
    * count. Same shape as the live variant
    * ([[graft.streaming.Streaming.thresholdFlow]]). */
  def thresholdHysteresis(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val cond = Tables.events(spark, dir)
      .where(col("event_type") === "error" && col("value") > 150.0)
      .select(col("user_id"), col("ts_ms"))
      .repartition(nPart, col("user_id"))
      .sortWithinPartitions("user_id", "ts_ms")
      .as[(Long, Long)]
    cond.mapPartitions { it =>
      var curUser = Long.MinValue
      var lastFire = Long.MinValue / 4
      it.flatMap { case (u, t) =>
        if (u != curUser || t >= lastFire + 86400000L) {
          curUser = u; lastFire = t
          Iterator.single((u, t))
        } else Iterator.empty
      }
    }.toDF("user_id", "fire_ms")
      .orderBy("user_id", "fire_ms")
  }

  val thresholdHysteresisOracle: String =
    """WITH RECURSIVE cond AS (
      |  SELECT user_id, epoch_ms(ts) AS ts_ms FROM events
      |  WHERE event_type = 'error' AND value > 150.0
      |), fires AS (
      |  SELECT user_id, MIN(ts_ms) AS fire_ms FROM cond GROUP BY user_id
      |  UNION ALL
      |  SELECT f.user_id,
      |    (SELECT MIN(c.ts_ms) FROM cond c WHERE c.user_id = f.user_id AND c.ts_ms >= f.fire_ms + 86400000)
      |  FROM fires f
      |  WHERE (SELECT MIN(c.ts_ms) FROM cond c WHERE c.user_id = f.user_id AND c.ts_ms >= f.fire_ms + 86400000) IS NOT NULL
      |)
      |SELECT user_id, fire_ms FROM fires ORDER BY user_id, fire_ms""".stripMargin

  // ----------------------------------------------- threshold band
  /** Two-level threshold watch (Schmitt trigger) — the reference's
    * ThresholdConfig composition (types.ts:210-245, commands.ts:913):
    * a command carries MULTIPLE level-triggered thresholds, so a
    * below-threshold watch (`operator: 'lt'`, the direction
    * [[thresholdHysteresis]]'s `gt` demo doesn't cover) pairs with an
    * above-threshold release at an INDEPENDENT level — activate when
    * value < lo (e.g. a low-voltage alarm), deactivate only when value
    * recovers past hi > lo, hold in between. Value-band hysteresis,
    * complementing #16's time-based suppression.
    *
    * Spark-first: the state is a last-decisive-event carry — rows
    * below lo are decisive ON, above hi decisive OFF, the band carries
    * the previous state — i.e. `last(decisive, ignoreNulls)` over the
    * per-key prefix window. ONE shuffle on the key, both windows
    * inside it, no iteration: the state machine that looks inherently
    * sequential is a running last-non-null, which Spark evaluates in a
    * single sorted pass per key. Emits only the transitions
    * (level-triggered edge output, commands.ts:915 "set to
    * activateOnMatch when condition met"); initial state is OFF. */
  def thresholdBand(spark: SparkSession, dir: String): DataFrame = {
    val (lo, hi) = (50.0, 150.0)
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .where(col("event_type") === "error")
      .withColumn("decisive",
        when(col("value") < lo, 1).when(col("value") > hi, 0))
      .withColumn("state", coalesce(last("decisive", ignoreNulls = true).over(wp), lit(0)))
      .withColumn("prev_state", coalesce(lag("state", 1).over(w), lit(0)))
      .where(col("state") =!= col("prev_state"))
      .select(col("user_id"), col("ts_ms"),
        when(col("state") === 1, "activated").otherwise("deactivated").as("transition"),
        col("value"))
      .orderBy("user_id", "ts_ms")
  }

  val thresholdBandOracle: String =
    """WITH s AS (
      |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, value,
      |    CASE WHEN value < 50.0 THEN 1 WHEN value > 150.0 THEN 0 END AS decisive
      |  FROM events WHERE event_type = 'error'
      |), st AS (
      |  SELECT *, COALESCE(LAST_VALUE(decisive IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts_ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS state
      |  FROM s
      |), tr AS (
      |  SELECT *, COALESCE(LAG(state) OVER (
      |    PARTITION BY user_id ORDER BY ts_ms, event_id), 0) AS prev_state
      |  FROM st
      |)
      |SELECT user_id, ts_ms,
      |  CASE WHEN state = 1 THEN 'activated' ELSE 'deactivated' END AS transition,
      |  value
      |FROM tr WHERE state <> prev_state
      |ORDER BY user_id, ts_ms""".stripMargin

  // ----------------------------------------------- session_window
  /** Gap-based sessionization via Spark's NATIVE `session_window`
    * (3.2+): per-user sessions of `purchase` events with a 12 h
    * inactivity gap — the declarative sibling of [[episodes]]'s
    * boundary-pairing (here Catalyst owns the merge: a batch
    * session_window plans as sort + one aggregation over merged
    * windows; in streaming the same expression runs on the session-
    * window state store). Session end is Spark's convention:
    * last event + gap. An event JOINS a session iff its time is
    * strictly before the current session end (t − prev < gap), so
    * the oracle's island rule is `delta >= gap → new session`;
    * event timestamps carry random sub-second offsets against the
    * exact 12 h gap, so the boundary never ties.
    *
    * Scale: one shuffle on user_id, per-partition sort, streaming
    * merge — no self-join, no window-function pass over pairs; the
    * session count is data-bounded and the aggregation is partial-
    * aggregable after the merge. */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame = {
    val gapMs = 43200000L // 12 h
    Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .groupBy(col("user_id"), session_window(col("event_time"), "12 hours").as("sw"))
      .agg(count(lit(1)).as("n_events"), davg(col("value")).as("value_avg"))
      .select(col("user_id"),
        unix_millis(col("sw.start")).as("session_start_ms"),
        unix_millis(col("sw.end")).as("session_end_ms"),
        col("n_events"), col("value_avg"))
      .orderBy("user_id", "session_start_ms")
  }

  val sessionWindowsOracle: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ms(ts) AS t, value FROM events
      |  WHERE event_type = 'purchase'
      |), flagged AS (
      |  SELECT *, CASE WHEN t - LAG(t) OVER w >= 43200000 OR LAG(t) OVER w IS NULL
      |                 THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
      |), numbered AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged
      |)
      |SELECT user_id, MIN(t) AS session_start_ms,
      |  MAX(t) + 43200000 AS session_end_ms,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS value_avg
      |FROM numbered GROUP BY user_id, sid
      |ORDER BY user_id, session_start_ms""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_episodes" -> (episodes _),
    "sk_threshold_hysteresis" -> (thresholdHysteresis _),
    "sk_threshold_band" -> (thresholdBand _),
    "sk_session_window" -> (sessionWindows _))

  val oracles: Map[String, String] = Map(
    "sk_episodes" -> episodesOracle,
    "sk_threshold_hysteresis" -> thresholdHysteresisOracle,
    "sk_threshold_band" -> thresholdBandOracle,
    "sk_session_window" -> sessionWindowsOracle)
}
