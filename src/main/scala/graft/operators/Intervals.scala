package graft.operators

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval (range) containment join — the reference's episode-scoped
  * analysis: once regimen episodes exist (claude-analyzer.ts:3206-3260
  * boundary pairing, see [[Sessions.episodes]]), the follow-up question
  * is "what did series Y do DURING each episode" (analysis-templates.ts
  * correlation/"Weather Impact" joins one path's values onto another's
  * active windows).
  *
  * Spark has no native range join: the naive formulation
  * `points JOIN intervals ON user = user AND start <= ts AND ts < end`
  * plans as BroadcastNestedLoopJoin — O(|points|·|intervals|) per key,
  * dead at scale. The scalable Spark-first shape is time-chunk
  * bucketing (the standard interval-join decomposition used by Spark
  * itself for stream-stream range joins):
  *
  *   - each interval explodes to the fixed-width chunks it overlaps
  *     (`sequence(start div C, (end-1) div C)` — bounded fanout
  *     `len/C`),
  *   - each point maps to exactly ONE chunk (`ts div C`),
  *   - an equi-join on (key, chunk) + the exact containment filter
  *     yields each (interval, point) pair exactly once — a point's
  *     single chunk appears at most once per interval, so no distinct
  *     is needed.
  *
  * One hash shuffle on (key, chunk); both sides partial-aggregate
  * before the final per-interval rollup. Chunk width trades shuffle
  * fanout (long intervals → many chunks) against join selectivity
  * (wide chunks → more filtered pairs); at 100 TB pick C near the
  * median interval length so the fanout stays O(1).
  */
object Intervals {

  /** Points joined into containing intervals via chunked equi-join.
    * `points` needs (key, ts); `intervals` needs (key, start, end)
    * with end exclusive and non-null. Returns one row per
    * (interval, contained point). */
  def intervalJoin(points: DataFrame, intervals: DataFrame, key: String,
      ts: String, start: String, end: String, chunkMs: Long): DataFrame = {
    // `div` = integer division: exact at epoch-millis magnitudes where
    // a double-divide-then-truncate could round across a chunk edge.
    val chunked = intervals.withColumn("chunk",
      explode(expr(s"sequence($start div ${chunkMs}L, ($end - 1) div ${chunkMs}L)")))
    val bucketed = points.withColumn("chunk", expr(s"$ts div ${chunkMs}L"))
    bucketed.join(chunked,
      bucketed(key) === chunked(key) && bucketed("chunk") === chunked("chunk") &&
        col(ts) >= col(start) && col(ts) < col(end))
      .drop(chunked(key)).drop(chunked("chunk")).drop(bucketed("chunk"))
  }

  // --------------------------------------------------------------- #53
  /** During each completed click-regimen episode: the same user's
    * `error` samples contained in [start, end), counted and averaged.
    * Inner join — episodes without any error sample carry no signal
    * here (the oracle mirrors the inner semantics). Chunk = 1 day. */
  def skIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val episodes = Sessions.episodesUnsorted(spark, dir)
      .where(col("status") === "completed")
      .select("user_id", "start_ms", "end_ms")
    val errors = Tables.events(spark, dir)
      .where(col("event_type") === "error")
      .select("user_id", "ts_ms", "value")
    intervalJoin(errors, episodes, "user_id", "ts_ms", "start_ms", "end_ms",
        chunkMs = 86400000L)
      .groupBy("user_id", "start_ms", "end_ms")
      .agg(count(lit(1)).as("n_points"), r6(davg(col("value"))).as("value_avg"))
      .orderBy("user_id", "start_ms")
  }

  val intervalJoinOracle: String =
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
      |), ep AS (
      |  SELECT user_id, ts_ms AS start_ms,
      |    LEAD(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS end_ms,
      |    boundary
      |  FROM b
      |)
      |SELECT e.user_id, e.start_ms, e.end_ms,
      |  COUNT(*) AS n_points,
      |  ROUND(CAST(SUM(CAST(p.value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(p.value), 6) AS value_avg
      |FROM ep e
      |JOIN (SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events
      |      WHERE event_type = 'error') p
      |  ON p.user_id = e.user_id AND p.ts_ms >= e.start_ms AND p.ts_ms < e.end_ms
      |WHERE e.boundary = 'start' AND e.end_ms IS NOT NULL
      |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------- #54
  /** Per-path value histogram: 20 equal-width bins between the path's
    * global [min, max] — the data-distribution profile behind the
    * reference's analysis templates (schema-examiner.ts column stats,
    * generalized to a full distribution).
    *
    * Scale shape: pass 1 computes per-path (min, max) — an algebraic
    * aggregate that partial-aggregates map-side to one row per path;
    * the bounds then broadcast back onto the scan for pass 2's bin
    * count (itself partial-aggregated: at most paths×20 rows cross the
    * wire). No driver collect, no sort until the final tiny output.
    * Bit-stability: bin index and bounds come from the same IEEE
    * double ops in both engines ((v-lo)/w, floor, lo+bin·w), with the
    * max value clamped into the last bin. A degenerate path (every
    * value identical → w=0) puts all rows in bin 0 — without the guard
    * 0/0=NaN clamps to bin 19 in Spark but errors in DuckDB's
    * CAST(NaN AS BIGINT): the engines would diverge on legal input. */
  def skHistogram(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val bounds = ev.groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"))
      .withColumn("w", (col("hi") - col("lo")) / lit(20.0))
    ev.join(broadcast(bounds), "event_type")
      .withColumn("bin", when(col("w") === 0.0, 0L).otherwise(
        least(floor((col("value") - col("lo")) / col("w")).cast("long"), lit(19L))))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"),
        r6(first(col("lo") + col("bin") * col("w"))).as("bin_lo"),
        r6(first(col("lo") + (col("bin") + lit(1L)) * col("w"))).as("bin_hi"))
      .orderBy("event_type", "bin")
  }

  val histogramOracle: String =
    """WITH bounds AS (
      |  SELECT event_type, MIN(value) AS lo, MAX(value) AS hi,
      |    (MAX(value) - MIN(value)) / 20.0 AS w
      |  FROM events GROUP BY 1
      |), binned AS (
      |  SELECT e.event_type,
      |    CASE WHEN b.w = 0 THEN 0
      |         ELSE LEAST(CAST(FLOOR((e.value - b.lo) / b.w) AS BIGINT), 19) END AS bin,
      |    b.lo, b.w
      |  FROM events e JOIN bounds b USING (event_type)
      |)
      |SELECT event_type, bin, COUNT(*) AS n,
      |  ROUND(ANY_VALUE(lo + bin * w), 6) AS bin_lo,
      |  ROUND(ANY_VALUE(lo + (bin + 1) * w), 6) AS bin_hi
      |FROM binned GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_interval_join" -> (skIntervalJoin _),
    "sk_histogram" -> (skHistogram _))

  val oracles: Map[String, String] = Map(
    "sk_interval_join" -> intervalJoinOracle,
    "sk_histogram" -> histogramOracle)
}
