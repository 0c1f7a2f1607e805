package graft.operators

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational breadth, part 2: the remaining TPC-H query shapes the
  * trimmed testdata schema can express — nation-pair volume (Q7),
  * promo share (Q14), max-revenue supplier (Q15), correlated-subquery
  * decorrelation (Q17), HAVING-filtered large orders (Q18), and a
  * disjunctive multi-range predicate (Q19).
  *
  * Scale notes: dims (nation, supplier, part at these SFs) broadcast;
  * the lineitem⋈orders join shuffles on the order key — the natural
  * co-partition key for both tables at 100 TB (bucketed layout keeps
  * it shuffle-free). Q17's per-part average is a broadcast of a
  * part-keyed aggregate, the standard decorrelation of TPC-H's
  * correlated subquery.
  */
object Relational3 {

  private val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  // ------------------------------------------------------------- Q7
  /** Nation-pair shipping volume by year: supplier nation ↔ customer
    * nation, both directions, yearly revenue. */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val ns = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val nc = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(ns), col("s_nationkey") === col("s_nk"))
      .join(broadcast(nc), col("c_nationkey") === col("c_nk"))
      .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
             (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum(rev, 4).as("volume"), count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7Oracle: String =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS volume,
      |  COUNT(*) AS n_items
      |FROM (
      |  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |    l_extendedprice * (1.0 - l_discount) AS volume
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ns ON s_nationkey = ns.n_nationkey
      |  JOIN nation nc ON c_nationkey = nc.n_nationkey
      |  WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
      |     OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
      |)
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ------------------------------------------------------------ Q14
  /** Promo revenue share for one ship month: 100·Σ(promo rev)/Σ(rev).
    * Both sums carry exact decimal partials; the final double division
    * is deterministic given identical operands. */
  def q14Promo(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1995-09-01") && col("l_shipdate") < lit("1995-10-01"))
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .agg(
        r6(lit(100.0) * dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)), 4) /
          dsum(rev, 4)).as("promo_pct"),
        count(lit(1)).as("n_items"))

  val q14Oracle: String =
    """SELECT
      |  ROUND(100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
      |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 6) AS promo_pct,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1995-09-01' AND l_shipdate < TIMESTAMP '1995-10-01'""".stripMargin

  // ------------------------------------------------------------ Q15
  /** Top supplier(s) by quarter revenue — the revenue "view" plus a
    * max-equality filter (ties all surface, ordering total). */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val srev = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
      .groupBy("l_suppkey")
      .agg(dsum(rev, 4).as("total_rev"))
    val top = srev.agg(max("total_rev").as("max_rev"))
    srev.join(broadcast(top), col("total_rev") === col("max_rev"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), r6(col("total_rev")).as("total_rev"))
      .orderBy("s_suppkey")
  }

  val q15Oracle: String =
    """WITH srev AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, ROUND(total_rev, 6) AS total_rev
      |FROM supplier JOIN srev ON s_suppkey = l_suppkey
      |WHERE total_rev = (SELECT MAX(total_rev) FROM srev)
      |ORDER BY s_suppkey""".stripMargin

  // ------------------------------------------------------------ Q17
  /** Small-quantity revenue: lineitems under 20% of their part's mean
    * quantity, for a brand/size slice — TPC-H's correlated subquery
    * decorrelated into a broadcast per-part aggregate. */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val partSel = Tables.part(spark, dir)
      .where(col("p_brand") === "Brand#3" && col("p_size") < 10)
      .select("p_partkey")
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(partSel), col("l_partkey") === col("p_partkey"))
    val perPart = li.groupBy(col("l_partkey").as("ap_partkey"))
      .agg(davg(col("l_quantity")).as("avg_qty"))
    li.join(broadcast(perPart), col("l_partkey") === col("ap_partkey"))
      .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(r6(dsum(col("l_extendedprice"), 4) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  val q17Oracle: String =
    """WITH li AS (
      |  SELECT l_partkey, l_quantity, l_extendedprice
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_brand = 'Brand#3' AND p_size < 10
      |), pa AS (
      |  SELECT l_partkey AS ap_partkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
      |  FROM li GROUP BY 1
      |)
      |SELECT
      |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 6) AS avg_yearly,
      |  COUNT(*) AS n_items
      |FROM li JOIN pa ON l_partkey = ap_partkey
      |WHERE l_quantity < 0.2 * avg_qty""".stripMargin

  // ------------------------------------------------------------ Q18
  /** Large-volume orders: HAVING on the order's total quantity, then
    * the customer report, top-100 by quantity. */
  def q18Large(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .where(col("sum_qty") > 210)
    big.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        // o_orderdate is TIMESTAMP_NTZ; session TZ is UTC, so the cast
        // makes unix_millis agree with DuckDB's epoch_ms of the naive ts.
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Oracle: String =
    """SELECT c_custkey, c_name, o_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms,
      |  o_totalprice, sum_qty
      |FROM (
      |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
      |  FROM lineitem GROUP BY 1
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 210)
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY sum_qty DESC, o_orderkey LIMIT 100""".stripMargin

  // ------------------------------------------------------------ Q19
  /** Disjunctive multi-range predicate (brand × size × quantity OR
    * groups). The whole disjunction is a single Catalyst filter after
    * the broadcast join — partial pushdown extracts the common
    * conjuncts (p_partkey join key; quantity bounds per branch). */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) && col("l_quantity").between(10, 25)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) && col("l_quantity").between(20, 40)))
      .agg(dsum(rev, 4).as("revenue"), count(lit(1)).as("n_items"))

  val q19Oracle: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 25)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  // ------------------------------------------------------------ Q13
  /** Customer order-count distribution: LEFT OUTER join keeps
    * zero-order customers, then a second aggregation over the counts —
    * the classic two-level group-by. The outer join shuffles on the
    * customer key; the distribution aggregation is tiny. */
  def q13Distribution(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
    counts.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Oracle: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY 1)
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_distribution" -> (q13Distribution _),
    "q7_volume" -> (q7Volume _),
    "q14_promo" -> (q14Promo _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q17_small_qty" -> (q17SmallQty _),
    "q18_large" -> (q18Large _),
    "q19_disjunctive" -> (q19Disjunctive _))

  val oracles: Map[String, String] = Map(
    "q13_distribution" -> q13Oracle,
    "q7_volume" -> q7Oracle,
    "q14_promo" -> q14Oracle,
    "q15_top_supplier" -> q15Oracle,
    "q17_small_qty" -> q17Oracle,
    "q18_large" -> q18Oracle,
    "q19_disjunctive" -> q19Oracle)
}
