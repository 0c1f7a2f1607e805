package graft.api

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checked queries exercising the History facade and the two
  * remaining reference surfaces: JSON value extraction (the
  * `value_json` column / source-filter path) and column profiling
  * (schema-examiner.ts).
  */
object ApiQueries {

  /** events as the canonical series frame the facade consumes. */
  def series(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      concat(lit("vessels.urn-"), col("user_id")).as("context"),
      col("event_type").as("path"),
      col("ts_ms"), col("value"), col("event_id").as("order_id"))

  // ------------------------------------------------------- history API
  /** Full `/history/values` round-trip through the facade: pattern-5
    * range, 6 h resolution, four aggregate methods and a trailing SMA,
    * aligned into one frame. */
  def historyValues(spark: SparkSession, dir: String): DataFrame = {
    import History._
    val (fromMs, toMs) = History.resolveRange(
      from = Some(1704412800000L), // 2024-01-05T00:00:00Z
      to = Some(1706140800000L), // 2024-01-25T00:00:00Z
      durationMs = None, now = 0L)
    val specs = Seq(
      PathSpec.parse("click:average:sma:5"),
      PathSpec.parse("purchase:max"),
      PathSpec.parse("view:first"),
      PathSpec.parse("error:mid"))
    History.values(series(spark, dir), "vessels.urn-3", specs, fromMs, toMs,
        resolutionMs = 21600000L)
      .select(col("bucket_ms"),
        col("`click:average:sma`").as("click_sma"),
        col("`purchase:max`").as("purchase_max"),
        col("`view:first`").as("view_first"),
        col("`error:mid`").as("error_mid"))
      .orderBy("bucket_ms")
  }

  val historyValuesOracle: String =
    """WITH s AS (
      |  SELECT event_type AS path, epoch_ms(ts) AS ts_ms, value, event_id
      |  FROM events
      |  WHERE user_id = 3 AND epoch_ms(ts) >= 1704412800000 AND epoch_ms(ts) < 1706140800000
      |    AND event_type IN ('click', 'purchase', 'view', 'error')
      |), b AS (
      |  SELECT CAST(FLOOR(ts_ms / 21600000) * 21600000 AS BIGINT) AS bucket_ms,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE path = 'click') AS DOUBLE)
      |      / COUNT(value) FILTER (WHERE path = 'click') AS click_avg,
      |    MAX(value) FILTER (WHERE path = 'purchase') AS purchase_max,
      |    arg_min(value, event_id) FILTER (WHERE path = 'view') AS view_first,
      |    ROUND(median(value) FILTER (WHERE path = 'error'), 6) AS error_mid
      |  FROM s GROUP BY 1
      |)
      |SELECT bucket_ms,
      |  CAST(SUM(CAST(click_avg AS DECIMAL(18,6))) OVER w AS DOUBLE)
      |    / COUNT(click_avg) OVER w AS click_sma,
      |  purchase_max, view_first, error_mid
      |FROM b
      |WINDOW w AS (ORDER BY bucket_ms ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
      |ORDER BY bucket_ms""".stripMargin

  // ------------------------------------------------ vessel enrichment
  /** Vessel-context enrichment — vessel-context.ts:10
    * (VesselContextManager): the reference extracts vessel identity
    * metadata (name, MMSI/callsign, flag, classification) and attaches
    * it to every analysis response. Re-expressed as a dimension join:
    * the per-context history summary (the data response) broadcast-
    * joined with the vessel registry derived from customer ⋈ nation —
    * name, flag state, and class carried onto each response row, with
    * the reference's "Not available" fallback for unregistered
    * contexts. Aggregate-then-join: the summary collapses to one row
    * per context BEFORE the join, and the registry is the broadcast
    * side — no shuffle of the fact table against the dim at any scale. */
  def historyEnriched(spark: SparkSession, dir: String): DataFrame = {
    val summary = series(spark, dir)
      .where(col("ts_ms") >= 1704412800000L && col("ts_ms") < 1706140800000L &&
        col("path") === "click")
      .groupBy(col("context"))
      .agg(count(lit(1)).as("n_points"), davg(col("value")).as("value_avg"),
        max(col("ts_ms")).as("last_ts_ms"))
    val registry = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .select(concat(lit("vessels.urn-"), col("c_custkey")).as("context"),
        col("c_name").as("vessel_name"), col("n_name").as("flag"),
        col("c_mktsegment").as("vessel_class"))
    summary.join(broadcast(registry), Seq("context"), "left")
      .select(col("context"),
        coalesce(col("vessel_name"), lit("Not available")).as("vessel_name"),
        coalesce(col("flag"), lit("Not available")).as("flag"),
        coalesce(col("vessel_class"), lit("Not available")).as("vessel_class"),
        col("n_points"), col("value_avg"), col("last_ts_ms"))
      .orderBy("context")
  }

  val historyEnrichedOracle: String =
    """WITH s AS (
      |  SELECT 'vessels.urn-' || user_id AS context, user_id,
      |    COUNT(*) AS n_points,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS value_avg,
      |    MAX(epoch_ms(ts)) AS last_ts_ms
      |  FROM events
      |  WHERE epoch_ms(ts) >= 1704412800000 AND epoch_ms(ts) < 1706140800000
      |    AND event_type = 'click'
      |  GROUP BY 1, 2
      |)
      |SELECT s.context,
      |  COALESCE(c.c_name, 'Not available') AS vessel_name,
      |  COALESCE(n.n_name, 'Not available') AS flag,
      |  COALESCE(c.c_mktsegment, 'Not available') AS vessel_class,
      |  s.n_points, s.value_avg, s.last_ts_ms
      |FROM s
      |LEFT JOIN customer c ON c.c_custkey = s.user_id
      |LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
      |ORDER BY s.context""".stripMargin

  // ----------------------------------------------- server-local time
  /** Timezone round-trip through the facade (HistoryAPI.ts:403-419
    * parseDateTime + 653-673 utcToLocalTimestamp): the request's BARE
    * timestamps ("2024-01-05T00:00", no Z/offset) are parsed as
    * SERVER-LOCAL time in the configured zone (America/New_York, so
    * the UTC range actually starts at 05:00Z — the oracle re-derives
    * that conversion independently with DuckDB's tz functions), and
    * every response bucket is rendered back as a local ISO string
    * with explicit offset next to the epoch. DST-gap/overlap parsing
    * and cross-DST offset rendering are pinned in LocaltimeSpec (the
    * January data window sits inside EST). */
  def historyLocaltime(spark: SparkSession, dir: String): DataFrame = {
    import History._
    val zone = "America/New_York"
    val fromMs = History.parseDateTimeMs("2024-01-05T00:00", zone)
    val toMs = History.parseDateTimeMs("2024-01-25T12:30:00", zone)
    val specs = Seq(PathSpec.parse("click:average"), PathSpec.parse("error:max"))
    History.values(series(spark, dir), "vessels.urn-3", specs, fromMs, toMs,
        resolutionMs = 21600000L)
      .select(col("bucket_ms"),
        History.localTimestamp(col("bucket_ms"), zone).as("bucket_local"),
        col("`click:average`").as("click_avg"),
        col("`error:max`").as("error_max"))
      .orderBy("bucket_ms")
  }

  /** The oracle recomputes BOTH directions of the zone conversion from
    * the IANA name itself (timezone(tz, naive) for the request parse,
    * timezone(tz, tstz) for the response render) — the constants in
    * the Spark query come from java.time, the oracle's from DuckDB's
    * tzdb, so the gate fails if either disagrees. */
  val historyLocaltimeOracle: String =
    """WITH rng AS (
      |  SELECT epoch_ms(timezone('America/New_York', TIMESTAMP '2024-01-05 00:00:00')) AS from_ms,
      |         epoch_ms(timezone('America/New_York', TIMESTAMP '2024-01-25 12:30:00')) AS to_ms
      |), s AS (
      |  SELECT event_type AS path, epoch_ms(ts) AS ts_ms, value FROM events, rng
      |  WHERE user_id = 3 AND epoch_ms(ts) >= from_ms AND epoch_ms(ts) < to_ms
      |    AND event_type IN ('click', 'error')
      |), b AS (
      |  SELECT CAST(FLOOR(ts_ms / 21600000) * 21600000 AS BIGINT) AS bucket_ms,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE path = 'click') AS DOUBLE)
      |      / COUNT(value) FILTER (WHERE path = 'click') AS click_avg,
      |    MAX(value) FILTER (WHERE path = 'error') AS error_max
      |  FROM s GROUP BY 1
      |), loc AS (
      |  SELECT *,
      |    timezone('America/New_York', to_timestamp(bucket_ms / 1000.0)) AS lt,
      |    (epoch_ms(timezone('America/New_York', to_timestamp(bucket_ms / 1000.0))) - bucket_ms)
      |      // 60000 AS off_min
      |  FROM b
      |)
      |SELECT bucket_ms,
      |  strftime(lt, '%Y-%m-%dT%H:%M:%S') ||
      |    printf('%s%02d:%02d', CASE WHEN off_min < 0 THEN '-' ELSE '+' END,
      |      abs(off_min) // 60, abs(off_min) % 60) AS bucket_local,
      |  click_avg, error_max
      |FROM loc ORDER BY bucket_ms""".stripMargin

  // ------------------------------------------------------- units meta
  /** Units metadata in the facade response (HistoryAPI.ts:529-538: the
    * wrapper's optional `units` map): one row per requested path with
    * its unit resolved from a broadcast metadata registry — the
    * sk_history_enriched dim-join pattern applied to path metadata —
    * plus the window's per-path data summary; `error` is deliberately
    * absent from the registry and takes the reference's
    * "Not available" placeholder. */
  def historyUnits(spark: SparkSession, dir: String): DataFrame = {
    import History._
    import spark.implicits._
    val specs = Seq(PathSpec.parse("click:average"), PathSpec.parse("purchase:max"),
      PathSpec.parse("view:first"), PathSpec.parse("error:mid"))
    val registry = Seq(("click", "m/s"), ("purchase", "V"), ("view", "m"),
      ("login", "rad")).toDF("path", "units")
    val meta = History.unitsFor(registry, specs)
    val stats = series(spark, dir)
      .where(col("context") === "vessels.urn-3" &&
        col("ts_ms") >= 1704412800000L && col("ts_ms") < 1706140800000L &&
        col("path").isin(specs.map(_.path): _*))
      .groupBy("path")
      .agg(count(lit(1)).as("n_points"), davg(col("value")).as("value_avg"))
    meta.join(stats, Seq("path"), "left")
      .select("path", "method", "units", "n_points", "value_avg")
      .orderBy("path")
  }

  val historyUnitsOracle: String =
    """WITH req(path, method) AS (
      |  VALUES ('click', 'average'), ('purchase', 'max'),
      |         ('view', 'first'), ('error', 'mid')
      |), reg(path, units) AS (
      |  VALUES ('click', 'm/s'), ('purchase', 'V'), ('view', 'm'), ('login', 'rad')
      |), stats AS (
      |  SELECT event_type AS path, COUNT(*) AS n_points,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS value_avg
      |  FROM events
      |  WHERE user_id = 3 AND epoch_ms(ts) >= 1704412800000 AND epoch_ms(ts) < 1706140800000
      |    AND event_type IN ('click', 'purchase', 'view', 'error')
      |  GROUP BY 1
      |)
      |SELECT r.path, r.method, COALESCE(g.units, 'Not available') AS units,
      |  s.n_points, s.value_avg
      |FROM req r LEFT JOIN reg g USING (path) LEFT JOIN stats s USING (path)
      |ORDER BY r.path""".stripMargin

  // ------------------------------------------------------ object paths
  /** Object-path expansion through the facade — one
    * `navigation.position` pathspec returning aligned latitude /
    * longitude / fix_type columns ([[History.objectValues]];
    * history-provider.ts:347-417). The object series is synthesized
    * from view events like the spatial family (lat/lon affine in
    * `value`): every 11th sample is an ALL-NULL malformed row (must
    * contribute to no bucket — the componentWhereConditions OR), and
    * `fix_type` is a STRING component, so its `average` request
    * falls back to FIRST per the reference's numeric dispatch. */
  def objectPath(spark: SparkSession, dir: String): DataFrame = {
    import History._
    val bad = col("event_id") % 11 === 0
    val objSeries = Tables.events(spark, dir)
      .where(col("event_type") === "view")
      .select(
        concat(lit("vessels.urn-"), col("user_id")).as("context"),
        lit("navigation.position").as("path"),
        col("ts_ms"), col("event_id").as("order_id"),
        when(!bad, lit(40.0) + col("value") * 0.001).as("value_latitude"),
        when(!bad, lit(-74.0) + col("value") * 0.002).as("value_longitude"),
        when(!bad, when(col("event_id") % 3 === 0, "gps").otherwise("dgps"))
          .as("value_fixtype"))
    History.objectValues(objSeries, "vessels.urn-3", "navigation.position",
        Seq(
          Component("latitude", "value_latitude"),
          Component("longitude", "value_longitude"),
          Component("fix_type", "value_fixtype", numeric = false)),
        Method.Average,
        fromMs = 1704412800000L, toMs = 1706140800000L,
        resolutionMs = 21600000L)
  }

  val objectPathOracle: String =
    """WITH s AS (
      |  SELECT epoch_ms(ts) AS ts_ms, event_id,
      |    CASE WHEN event_id % 11 = 0 THEN NULL ELSE 40.0 + value * 0.001 END AS lat,
      |    CASE WHEN event_id % 11 = 0 THEN NULL ELSE -74.0 + value * 0.002 END AS lon,
      |    CASE WHEN event_id % 11 = 0 THEN NULL
      |         WHEN event_id % 3 = 0 THEN 'gps' ELSE 'dgps' END AS ft
      |  FROM events
      |  WHERE user_id = 3 AND event_type = 'view'
      |    AND epoch_ms(ts) >= 1704412800000 AND epoch_ms(ts) < 1706140800000
      |)
      |SELECT CAST(FLOOR(ts_ms / 21600000) * 21600000 AS BIGINT) AS bucket_ms,
      |  CAST(SUM(CAST(lat AS DECIMAL(18,6))) AS DOUBLE) / COUNT(lat) AS latitude,
      |  CAST(SUM(CAST(lon AS DECIMAL(18,6))) AS DOUBLE) / COUNT(lon) AS longitude,
      |  arg_min(ft, event_id) AS fix_type
      |FROM s
      |WHERE lat IS NOT NULL OR lon IS NOT NULL OR ft IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------------- value_json
  /** JSON value extraction + filter — the reference's `value_json`
    * column and source-filter semantics: extract a field from the
    * JSON payload, filter on it, aggregate. */
  def jsonFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .where(col("k") % 10 === 0)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), davg(col("value")).as("value_avg"))
      .orderBy("event_type")

  val jsonFilterOracle: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS value_avg
      |FROM events
      |WHERE CAST(json_extract(props, '$.k') AS INT) % 10 = 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------- profiling
  /** Column profiling — schema-examiner.ts: per-column row count,
    * nulls, exact distinct count, min/max. */
  def profile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val cols = Seq("l_quantity", "l_discount", "l_extendedprice", "l_tax")
    cols.map { c =>
      li.agg(
        count(lit(1)).as("n_rows"),
        count(when(col(c).isNull, 1)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).as("min_value"),
        max(col(c)).as("max_value"))
        .withColumn("column_name", lit(c))
        .select("column_name", "n_rows", "n_null", "n_distinct", "min_value", "max_value")
    }.reduce(_.unionAll(_)).orderBy("column_name")
  }

  val profileOracle: String =
    """SELECT 'l_discount' AS column_name, COUNT(*) AS n_rows,
      |  COUNT(CASE WHEN l_discount IS NULL THEN 1 END) AS n_null,
      |  COUNT(DISTINCT l_discount) AS n_distinct,
      |  MIN(l_discount) AS min_value, MAX(l_discount) AS max_value FROM lineitem
      |UNION ALL
      |SELECT 'l_extendedprice', COUNT(*),
      |  COUNT(CASE WHEN l_extendedprice IS NULL THEN 1 END),
      |  COUNT(DISTINCT l_extendedprice), MIN(l_extendedprice), MAX(l_extendedprice) FROM lineitem
      |UNION ALL
      |SELECT 'l_quantity', COUNT(*),
      |  COUNT(CASE WHEN l_quantity IS NULL THEN 1 END),
      |  COUNT(DISTINCT l_quantity), MIN(l_quantity), MAX(l_quantity) FROM lineitem
      |UNION ALL
      |SELECT 'l_tax', COUNT(*),
      |  COUNT(CASE WHEN l_tax IS NULL THEN 1 END),
      |  COUNT(DISTINCT l_tax), MIN(l_tax), MAX(l_tax) FROM lineitem
      |ORDER BY column_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_history_values" -> (historyValues _),
    "sk_history_enriched" -> (historyEnriched _),
    "sk_history_localtime" -> (historyLocaltime _),
    "sk_history_units" -> (historyUnits _),
    "sk_object_path" -> (objectPath _),
    "sk_json_filter" -> (jsonFilter _),
    "sk_profile" -> (profile _))

  val oracles: Map[String, String] = Map(
    "sk_history_values" -> historyValuesOracle,
    "sk_history_enriched" -> historyEnrichedOracle,
    "sk_history_localtime" -> historyLocaltimeOracle,
    "sk_history_units" -> historyUnitsOracle,
    "sk_object_path" -> objectPathOracle,
    "sk_json_filter" -> jsonFilterOracle,
    "sk_profile" -> profileOracle)
}
