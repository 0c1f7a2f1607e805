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

  // ---------------------------------------- automation lifecycle
  /** Automation enable/disable lifecycle composed over the threshold
    * band — the reference's command state machine (commands.ts:435-508,
    * 1683-1708; README "Automation State Machine"): ENABLING automation
    * (1) forces the command OFF, (2) immediately evaluates every
    * threshold against the current value — so a below-`lo` last value
    * re-activates at the enable instant, a band/above value leaves the
    * forced OFF standing — then (3) the level-triggered watch runs
    * continuously; DISABLING stops monitoring and leaves the command
    * state untouched (value moves while disabled change nothing — but
    * they DO update the "current value" the next enable evaluates).
    *
    * Derivation here: `signup` events are the automation toggles
    * (enable when value ≥ 150), `error` is the watched path with the
    * 16b Schmitt band (activate < 50, release > 150). An enable whose
    * immediate evaluation re-activates nets NO visible transition when
    * the command was already ON (the reference's OFF→ON happens inside
    * one evaluation turn); the event-granularity state log is what the
    * operator emits.
    *
    * Spark-first: the whole lifecycle is STILL a running
    * last-non-null — the decisive stream just gains a third source:
    * enable events are decisive with (last value < lo), watched values
    * are decisive only while the last toggle is an enable, disables
    * are never decisive. ONE shuffle on the key, four windows inside
    * it, no iteration (the same seam as 16b). */
  def automationLifecycle(spark: SparkSession, dir: String): DataFrame =
    automationLifecycleOn(Tables.events(spark, dir))

  /** Core over any (user_id, ts_ms, event_id, event_type, value) frame
    * — split out so AutomationSpec can drive constructed lifecycle
    * scenarios through the real window pass. */
  private[graft] def automationLifecycleOn(events: DataFrame): DataFrame =
    lifecycleTransitions(
      lifecycleAnnotated(events, emptyLifecycleCarry(events.sparkSession)))
      .orderBy("user_id", "ts_ms")

  /** Empty lifecycle carry — the batch operator's "no history" seam
    * (the streaming twin feeds the real per-user store instead). */
  private[graft] def emptyLifecycleCarry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Int, Option[Double], Int)]
      .toDF("user_id", "enabled0", "last_val0", "state0")
  }

  /** The lifecycle window pass with an explicit CARRY seam: the three
    * per-user quantities a time-sliced prefix leaves behind — enabled
    * (last toggle), last_val (watched path's current value) and state
    * (last decisive) — arrive as join columns and replace the window
    * defaults, so running this batch-at-a-time over time slices with
    * the carried quantities reproduces the one-shot pass exactly
    * (every window here is a running last-non-null, and the carry IS
    * its prefix value). */
  private[graft] def lifecycleAnnotated(events: DataFrame, carry: DataFrame): DataFrame = {
    val (lo, hi) = (50.0, 150.0)
    val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wb = w.rowsBetween(Window.unboundedPreceding, -1)
    val isToggle = col("event_type") === "signup"
    val isEnable = isToggle && col("value") >= 150.0
    events
      .where(col("event_type").isin("error", "signup"))
      .join(carry, Seq("user_id"), "left")
      // enabled state as of THIS row (a toggle applies to itself)
      .withColumn("enabled", coalesce(
        last(when(isToggle, isEnable.cast("int")), ignoreNulls = true).over(wp),
        col("enabled0"), lit(0)))
      // the watched path's current value BEFORE this row — what an
      // enable's immediate evaluation reads
      .withColumn("last_val", coalesce(
        last(when(col("event_type") === "error", col("value")),
          ignoreNulls = true).over(wb),
        col("last_val0")))
      .withColumn("decisive",
        when(isEnable, when(col("last_val") < lo, 1).otherwise(0))
          .when(isToggle, lit(null))
          .when(col("enabled") === 1 && col("value") < lo, 1)
          .when(col("enabled") === 1 && col("value") > hi, 0))
      .withColumn("state", coalesce(
        last("decisive", ignoreNulls = true).over(wp), col("state0"), lit(0)))
      .withColumn("prev_state", coalesce(
        lag("state", 1).over(w), col("state0"), lit(0)))
  }

  private[graft] def lifecycleTransitions(ann: DataFrame): DataFrame =
    ann.where(col("state") =!= col("prev_state"))
      .select(col("user_id"), col("ts_ms"),
        when(col("state") === 1, "activated").otherwise("deactivated").as("transition"),
        when(col("event_type") === "signup", "enable_eval").otherwise("watch").as("trigger"),
        col("value"))

  val automationLifecycleOracle: String =
    """WITH s AS (
      |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type, value,
      |    (event_type = 'signup') AS is_toggle,
      |    (event_type = 'signup' AND value >= 150.0) AS is_enable
      |  FROM events WHERE event_type IN ('error', 'signup')
      |), en AS (
      |  SELECT *,
      |    COALESCE(LAST_VALUE(CASE WHEN is_toggle THEN CAST(is_enable AS INT) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS enabled,
      |    LAST_VALUE(CASE WHEN event_type = 'error' THEN value END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_val
      |  FROM s
      |), d AS (
      |  SELECT *, CASE
      |      WHEN is_enable THEN (CASE WHEN last_val < 50.0 THEN 1 ELSE 0 END)
      |      WHEN is_toggle THEN NULL
      |      WHEN enabled = 1 AND value < 50.0 THEN 1
      |      WHEN enabled = 1 AND value > 150.0 THEN 0 END AS decisive
      |  FROM en
      |), st AS (
      |  SELECT *, COALESCE(LAST_VALUE(decisive IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts_ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS state
      |  FROM d
      |), tr AS (
      |  SELECT *, COALESCE(LAG(state) OVER (
      |    PARTITION BY user_id ORDER BY ts_ms, event_id), 0) AS prev_state
      |  FROM st
      |)
      |SELECT user_id, ts_ms,
      |  CASE WHEN state = 1 THEN 'activated' ELSE 'deactivated' END AS transition,
      |  CASE WHEN is_toggle THEN 'enable_eval' ELSE 'watch' END AS trigger,
      |  value
      |FROM tr WHERE state <> prev_state
      |ORDER BY user_id, ts_ms""".stripMargin

  // ---------------------------------------- multi-threshold watch
  /** k independent threshold watchers over ONE path in ONE scan —
    * README "Multiple Thresholds Per Path" (a command registers many
    * ThresholdConfigs on the same watchPath; each holds its own
    * level-triggered state). The watcher registry — (watcher_id,
    * direction, activate level, release level) — is a metadata-scale
    * dim that BROADCASTS onto the value stream (the sk_geofence
    * registry shape applied to thresholds): the events table is
    * scanned once, fans out to k state machines per row in place, and
    * the per-(key, watcher) Schmitt carry runs in the same single
    * shuffle a one-watcher band pays — adding watchers adds zero scans
    * and zero exchanges (plan-pinned in MultiThresholdSpec).
    * Directions per types.ts ThresholdConfig operators: `lt` activates
    * below its level and releases above the paired release level;
    * `gt` activates above and releases below. */
  def multiThreshold(spark: SparkSession, dir: String): DataFrame =
    multiThresholdOn(Tables.events(spark, dir))

  private[graft] def multiThresholdOn(events: DataFrame): DataFrame =
    multiThresholdAnnotated(events, emptyWatcherCarry(events.sparkSession))
      .where(col("state") =!= col("prev_state"))
      .select(col("user_id"), col("watcher_id"), col("ts_ms"),
        when(col("state") === 1, "activated").otherwise("deactivated").as("transition"),
        col("value"))
      .orderBy("user_id", "watcher_id", "ts_ms")

  /** The demo watcher registry (one row per ThresholdConfig on the
    * watched path) — shared with the streaming twin. */
  private[graft] def watcherRegistry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("low_alarm", "lt", 50.0, 150.0),
      ("mid_watch", "lt", 100.0, 200.0),
      ("overload", "gt", 250.0, 120.0))
      .toDF("watcher_id", "direction", "act_level", "rel_level")
  }

  private[graft] def emptyWatcherCarry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String, Int)].toDF("user_id", "watcher_id", "state0")
  }

  /** The k-watcher window pass with an explicit per-(user, watcher)
    * CARRY seam (see [[lifecycleAnnotated]]): `state0` replaces the
    * initial-OFF default, so slice-at-a-time evaluation with carried
    * states reproduces the one-shot pass exactly. */
  private[graft] def multiThresholdAnnotated(events: DataFrame, carry: DataFrame): DataFrame = {
    val spark = events.sparkSession
    val w = Window.partitionBy("user_id", "watcher_id").orderBy("ts_ms", "event_id")
    val wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .where(col("event_type") === "click")
      .join(broadcast(watcherRegistry(spark)))
      .join(carry, Seq("user_id", "watcher_id"), "left")
      .withColumn("decisive",
        when(col("direction") === "lt",
          when(col("value") < col("act_level"), 1)
            .when(col("value") > col("rel_level"), 0))
          .otherwise(
            when(col("value") > col("act_level"), 1)
              .when(col("value") < col("rel_level"), 0)))
      .withColumn("state", coalesce(
        last("decisive", ignoreNulls = true).over(wp), col("state0"), lit(0)))
      .withColumn("prev_state", coalesce(
        lag("state", 1).over(w), col("state0"), lit(0)))
  }

  val multiThresholdOracle: String =
    """WITH reg(watcher_id, direction, act_level, rel_level) AS (
      |  VALUES ('low_alarm', 'lt', 50.0, 150.0),
      |         ('mid_watch', 'lt', 100.0, 200.0),
      |         ('overload', 'gt', 250.0, 120.0)
      |), s AS (
      |  SELECT e.user_id, epoch_ms(e.ts) AS ts_ms, e.event_id, e.value,
      |    r.watcher_id, r.direction, r.act_level, r.rel_level
      |  FROM events e CROSS JOIN reg r
      |  WHERE e.event_type = 'click'
      |), d AS (
      |  SELECT *, CASE WHEN direction = 'lt' THEN
      |      (CASE WHEN value < act_level THEN 1 WHEN value > rel_level THEN 0 END)
      |    ELSE
      |      (CASE WHEN value > act_level THEN 1 WHEN value < rel_level THEN 0 END)
      |    END AS decisive
      |  FROM s
      |), st AS (
      |  SELECT *, COALESCE(LAST_VALUE(decisive IGNORE NULLS) OVER (
      |      PARTITION BY user_id, watcher_id ORDER BY ts_ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS state
      |  FROM d
      |), tr AS (
      |  SELECT *, COALESCE(LAG(state) OVER (
      |    PARTITION BY user_id, watcher_id ORDER BY ts_ms, event_id), 0) AS prev_state
      |  FROM st
      |)
      |SELECT user_id, watcher_id, ts_ms,
      |  CASE WHEN state = 1 THEN 'activated' ELSE 'deactivated' END AS transition,
      |  value
      |FROM tr WHERE state <> prev_state
      |ORDER BY user_id, watcher_id, ts_ms""".stripMargin

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
    "sk_automation_lifecycle" -> (automationLifecycle _),
    "sk_multi_threshold" -> (multiThreshold _),
    "sk_session_window" -> (sessionWindows _))

  val oracles: Map[String, String] = Map(
    "sk_episodes" -> episodesOracle,
    "sk_threshold_hysteresis" -> thresholdHysteresisOracle,
    "sk_threshold_band" -> thresholdBandOracle,
    "sk_automation_lifecycle" -> automationLifecycleOracle,
    "sk_multi_threshold" -> multiThresholdOracle,
    "sk_session_window" -> sessionWindowsOracle)
}
