package graft.operators

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OLAP grouping shapes: multi-level ROLLUP cubes and wide PIVOT
  * tables — the two "shape of the result" operators every dashboard
  * layer on top of a warehouse asks for (the reference serves exactly
  * these shapes to its web UI: per-path aggregate tables and
  * wide-by-path time grids, api-routes.ts aggregate endpoints), and
  * standard SQL surface (GROUP BY ROLLUP / conditional aggregation)
  * so the DuckDB oracle runs the identical query.
  *
  * Scale notes (100 TB):
  *  - ROLLUP is ONE aggregation: Catalyst plans it as Expand (one
  *    input row → one row per grouping set) followed by a single
  *    hash aggregate with map-side partials — NOT one job per level.
  *    The expand factor equals the number of levels (3 here), paid
  *    map-side before the single shuffle on the grouping-set key, so
  *    the network cost is the union of the per-level partial maps —
  *    the same as running the levels separately but with one scan.
  *  - PIVOT with an explicit value list is a single groupBy whose
  *    aggregates are conditional (`FILTER`-style) — one scan, one
  *    shuffle keyed by the row dimension, no per-pivot-value pass.
  *    The value list is declared, not discovered, so the plan needs
  *    no driver-side distinct pre-query (Spark's auto-pivot runs one;
  *    at warehouse scale the dictionary is metadata you know).
  */
object Olap {

  // ---------------------------------------------------------- rollup
  /** Revenue cube by (region, nation) with ROLLUP: per-nation rows,
    * per-region subtotals, and the grand total in one result, each
    * level tagged by `grouping_id()` (0 = nation row, 1 = region
    * subtotal, 3 = grand total — a bit per rolled-up column; DuckDB's
    * GROUPING(a, b) emits the identical bitmask). Rolled-up name
    * columns are COALESCEd to 'ALL' on both engines so the level key
    * is a plain string, not an engine-specific NULL. */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val line = Tables.lineitem(spark, dir)
    val orders = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val nation = broadcast(Tables.nation(spark, dir))
    val region = broadcast(Tables.region(spark, dir))
    line
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping_id().cast("long").as("level"),
        count(lit(1)).as("n_lines"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("r_name"),
        coalesce(col("n_name"), lit("ALL")).as("n_name"),
        col("level"), col("n_lines"), col("revenue"))
      .orderBy("level", "r_name", "n_name")
  }

  val rollupRevenueOracle: String =
    """SELECT COALESCE(r_name, 'ALL') AS r_name,
      |       COALESCE(n_name, 'ALL') AS n_name,
      |       CAST(GROUPING(r_name, n_name) AS BIGINT) AS level,
      |       COUNT(*) AS n_lines,
      |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY level, r_name, n_name""".stripMargin

  // ----------------------------------------------------------- pivot
  /** Known event-type dictionary for the wide grid — declared, not
    * discovered (see scale note above). */
  private[graft] val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Wide per-user event grid: one row per user, one (count, mean
    * value) column pair per event type — the wide-by-path table shape
    * the reference's UI renders from its per-path aggregates. Explicit
    * pivot value list keeps the plan to one conditional-aggregate
    * groupBy; means are decimal-accumulated and 6-dp rounded for the
    * cross-engine hash. Users with no events of a type get count 0
    * and NULL mean (count, not sum, so the zero is unambiguous). */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val aggs = EventTypes.flatMap { t =>
      val hit = col("event_type") === t
      Seq(
        count(when(hit, 1)).as(s"${t}_n"),
        r6(sum(when(hit, col("value")).cast("decimal(18,6)")).cast("double") /
          count(when(hit, 1))).as(s"${t}_avg"))
    }
    ev.groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("user_id")
  }

  val pivotEventsOracle: String = {
    val cols = EventTypes.map { t =>
      s"""COUNT(*) FILTER (event_type = '$t') AS ${t}_n,
         |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (event_type = '$t') AS DOUBLE)
         |        / COUNT(*) FILTER (event_type = '$t'), 6) AS ${t}_avg""".stripMargin
    }.mkString(",\n  ")
    s"""SELECT user_id,
       |  $cols
       |FROM events
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin
  }

  // --------------------------------------------------- grouping sets
  /** Two INDEPENDENT dimension summaries in one aggregation — the
    * multi-dashboard-tile query: order-priority totals and return-flag
    * totals from a single scan via GROUP BY GROUPING SETS (neither
    * dimension nests in the other, so neither ROLLUP nor CUBE fits
    * without paying extra grouping sets). Catalyst plans it exactly
    * like the ROLLUP above — one Expand (factor = number of sets,
    * here 2) into ONE map-side-partial hash aggregate — so N summary
    * tables cost one scan and one shuffle, not N jobs; at 100 TB
    * that's the difference between one pass over the fact table and
    * a pass per dashboard tile. `grouping_id()` tags which set each
    * row belongs to with the same bitmask DuckDB's GROUPING() emits
    * (verified by the rollup operator's oracle), and rolled columns
    * COALESCE to 'ALL' so the key is engine-neutral. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("gs_lineitem")
    Tables.orders(spark, dir).createOrReplaceTempView("gs_orders")
    spark.sql(
      """SELECT COALESCE(o_orderpriority, 'ALL') AS dim_priority,
        |       COALESCE(l_returnflag, 'ALL') AS dim_returnflag,
        |       CAST(grouping_id() AS BIGINT) AS level,
        |       COUNT(*) AS n_lines,
        |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM gs_lineitem JOIN gs_orders ON l_orderkey = o_orderkey
        |GROUP BY GROUPING SETS ((o_orderpriority), (l_returnflag))
        |ORDER BY level, dim_priority, dim_returnflag""".stripMargin)
  }

  val groupingSetsOracle: String =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS dim_priority,
      |       COALESCE(l_returnflag, 'ALL') AS dim_returnflag,
      |       CAST(GROUPING(o_orderpriority, l_returnflag) AS BIGINT) AS level,
      |       COUNT(*) AS n_lines,
      |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY GROUPING SETS ((o_orderpriority), (l_returnflag))
      |ORDER BY level, dim_priority, dim_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rollup" -> (rollupRevenue _),
    "sk_pivot_wide" -> (pivotEvents _),
    "q_grouping_sets" -> (groupingSets _))

  val oracles: Map[String, String] = Map(
    "q_rollup" -> rollupRevenueOracle,
    "sk_pivot_wide" -> pivotEventsOracle,
    "q_grouping_sets" -> groupingSetsOracle)
}
