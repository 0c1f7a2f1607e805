package graft.operators

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational breadth, part 3: the last TPC-H query shapes the trimmed
  * testdata schema can express, adapted where a column is absent
  * (there is no partsupp table and no commit/receipt dates, so Q9's
  * supply cost becomes a retail-price proxy and Q12's lateness is
  * ship-vs-order delay).
  *
  * Scale notes: every dimension (nation, region, supplier, part,
  * customer at these ratios) broadcasts; the only shuffles are
  * lineitem⋈orders on the order key and the final group-bys. Q11/Q22's
  * global scalar aggregates are broadcast back (one row), never a
  * driver collect. Q21 windows partition by the order key — the same
  * key the join just shuffled on, so the window adds no exchange.
  */
object Relational4 {

  private val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  // ------------------------------------------------------------- Q8
  /** National market share: of all revenue delivered to ASIA customers
    * in 1996-1997, the fraction supplied by NATION_2, per year. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
      .select(col("n_nationkey").as("c_nk"))
    val suppNation = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .where(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("c_nk"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        r6(dsum(when(col("supp_nation") === "NATION_2", rev).otherwise(lit(0.0)), 4) /
          dsum(rev, 4)).as("mkt_share"),
        count(lit(1)).as("n_items"))
      .orderBy("o_year")
  }

  val q8Oracle: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  ROUND(CAST(SUM(CAST(CASE WHEN ns.n_name = 'NATION_2'
      |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 6) AS mkt_share,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation nc ON c_nationkey = nc.n_nationkey
      |JOIN region ON nc.n_regionkey = r_regionkey AND r_name = 'ASIA'
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ns ON s_nationkey = ns.n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------- Q9
  /** Product-line profit by supplier nation and year. No partsupp
    * table, so cost is proxied as half the part's retail price per
    * unit (the shape — star join, derived measure, two-level group —
    * is what matters). */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    val profit = rev - lit(0.5) * col("p_retailprice") * col("l_quantity")
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
          .where(col("p_name").contains("red")).select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum(profit, 4).as("sum_profit"), count(lit(1)).as("n_items"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9Oracle: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    - 0.5 * p_retailprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  // ------------------------------------------------------------ Q11
  /** Important parts: parts whose revenue exceeds a fixed fraction of
    * total revenue — the global scalar is a one-row broadcast joined
    * back, TPC-H's HAVING-over-subquery shape without a driver
    * collect. */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(dsum(rev, 4).as("part_value"))
    val total = perPart.agg(dsum(col("part_value"), 4).as("total_value"))
    perPart.join(broadcast(total))
      .where(col("part_value") > lit(0.0008) * col("total_value"))
      .select(col("l_partkey"), r6(col("part_value")).as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  val q11Oracle: String =
    """WITH pv AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS part_value
      |  FROM lineitem GROUP BY 1)
      |SELECT l_partkey, ROUND(part_value, 6) AS part_value
      |FROM pv
      |WHERE part_value > 0.0008 * (
      |  SELECT CAST(SUM(CAST(part_value AS DECIMAL(18,4))) AS DOUBLE) FROM pv)
      |ORDER BY part_value DESC, l_partkey""".stripMargin

  // ------------------------------------------------------------ Q12
  /** Late-shipment priority mix (Q12 without ship modes / receipt
    * dates): lines shipped 60-120 days after the order date, counted
    * per return flag as urgent-vs-other order priority. */
  def q12LateLines(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .where(datediff(col("l_shipdate"), col("o_orderdate")).between(60, 120))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy("l_returnflag")

  val q12Oracle: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE datediff('day', o_orderdate, l_shipdate) BETWEEN 60 AND 120
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------ Q16
  /** Supplier breadth per part attribute combo: distinct suppliers who
    * shipped each (brand, type, size) slice, excluding suppliers in
    * deficit — the NOT-IN becomes a broadcast anti-join. */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val partSel = Tables.part(spark, dir)
      .where(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val badSupp = Tables.supplier(spark, dir)
      .where(col("s_acctbal") < 0).select("s_suppkey")
    Tables.lineitem(spark, dir)
      .join(broadcast(partSel), col("l_partkey") === col("p_partkey"))
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16Oracle: String =
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ------------------------------------------------------------- Q2
  /** Minimum-cost supplier per part (Q2's correlated-min shape without
    * partsupp): among AMERICA suppliers who shipped each economy/standard part,
    * the one with the lowest account balance — the correlated
    * `= (SELECT MIN ...)` decorrelated to a per-part min aggregate
    * joined back on (part, min value), ties broken by supplier name
    * order in the final sort. */
  def q2MinCost(spark: SparkSession, dir: String): DataFrame = {
    val americaSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey") && col("r_name") === "AMERICA")
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val brassParts = Tables.part(spark, dir)
      .where(col("p_type").isin("ECONOMY", "STANDARD") && col("p_size") < 15)
      .select("p_partkey", "p_brand")
    val shipped = Tables.lineitem(spark, dir)
      .join(broadcast(brassParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(americaSupp), col("l_suppkey") === col("s_suppkey"))
      .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
      .distinct()
    val minBal = shipped.groupBy(col("p_partkey").as("m_partkey"))
      .agg(min("s_acctbal").as("min_bal"))
    shipped
      .join(broadcast(minBal),
        col("p_partkey") === col("m_partkey") && col("s_acctbal") === col("min_bal"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"), col("p_brand"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val q2Oracle: String =
    """WITH shipped AS (
      |  SELECT DISTINCT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE p_type IN ('ECONOMY', 'STANDARD') AND p_size < 15 AND r_name = 'AMERICA'
      |), mb AS (
      |  SELECT p_partkey, MIN(s_acctbal) AS min_bal FROM shipped GROUP BY 1
      |)
      |SELECT s.s_acctbal, s.s_name, s.n_name, s.p_partkey, s.p_brand
      |FROM shipped s JOIN mb ON s.p_partkey = mb.p_partkey AND s.s_acctbal = mb.min_bal
      |ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, s.p_partkey
      |LIMIT 100""".stripMargin

  // ------------------------------------------------------------ Q20
  /** Excess-share suppliers (Q20's nested-subquery shape without
    * partsupp): suppliers whose 1997 shipped quantity of a blue part
    * exceeds 30% of that part's total 1997 shipments — part filter
    * decorrelated to a broadcast semi-join, the per-part threshold to
    * a join against the part-level aggregate, and the EXISTS head to a
    * distinct + broadcast supplier/nation join. */
  def q20Excess(spark: SparkSession, dir: String): DataFrame = {
    val greenParts = Tables.part(spark, dir)
      .where(col("p_name").contains("blue")).select("p_partkey")
    val shipped = Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01"))
      .join(broadcast(greenParts), col("l_partkey") === col("p_partkey"))
    val perSuppPart = shipped.groupBy("l_suppkey", "l_partkey")
      .agg(dsum(col("l_quantity"), 2).as("supp_qty"))
    val perPart = shipped.groupBy(col("l_partkey").as("t_partkey"))
      .agg(dsum(col("l_quantity"), 2).as("total_qty"))
    perSuppPart
      .join(broadcast(perPart), col("l_partkey") === col("t_partkey"))
      .where(col("supp_qty") > lit(0.3) * col("total_qty"))
      .select("l_suppkey").distinct()
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("n_name").as("nation"))
      .orderBy("s_name")
  }

  val q20Oracle: String =
    """WITH shipped AS (
      |  SELECT l_suppkey, l_partkey, l_quantity
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%blue%'
      |    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |), per_supp AS (
      |  SELECT l_suppkey, l_partkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS supp_qty
      |  FROM shipped GROUP BY 1, 2
      |), per_part AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |  FROM shipped GROUP BY 1
      |)
      |SELECT DISTINCT s_name, n_name AS nation
      |FROM per_supp JOIN per_part USING (l_partkey)
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE supp_qty > 0.3 * total_qty
      |ORDER BY s_name""".stripMargin

  // ------------------------------------------------------------ Q21
  /** Suppliers who kept finished orders waiting: in multi-supplier
    * orders, the unique supplier whose latest line shipped strictly
    * after every other supplier's. Windows partition on the order key
    * the preceding aggregation already shuffled on — no extra
    * exchange. */
  def q21Waiting(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).where(col("o_orderstatus") === "F")
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(col("l_shipdate")).as("supp_last"))
    val w = Window.partitionBy("l_orderkey")
    val flagged = perSupp
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("order_last", max(col("supp_last")).over(w))
      .withColumn("n_at_last",
        sum(when(col("supp_last") === col("order_last"), 1).otherwise(0)).over(w))
      .where(col("n_supp") >= 2 && col("n_at_last") === 1 &&
        col("supp_last") === col("order_last"))
    flagged
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(Tables.supplier(spark, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q21Oracle: String =
    """WITH per_supp AS (
      |  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_last
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |  GROUP BY 1, 2
      |), win1 AS (
      |  SELECT l_suppkey, supp_last,
      |    COUNT(*) OVER w AS n_supp,
      |    MAX(supp_last) OVER w AS order_last,
      |    l_orderkey
      |  FROM per_supp
      |  WINDOW w AS (PARTITION BY l_orderkey)
      |), flagged AS (
      |  SELECT l_suppkey
      |  FROM (
      |    SELECT l_suppkey, supp_last, n_supp, order_last,
      |      SUM(CASE WHEN supp_last = order_last THEN 1 ELSE 0 END)
      |        OVER (PARTITION BY l_orderkey) AS n_at_last
      |    FROM win1)
      |  WHERE n_supp >= 2 AND n_at_last = 1 AND supp_last = order_last
      |)
      |SELECT s_name, COUNT(*) AS numwait
      |FROM flagged JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  // ------------------------------------------------------------ Q22
  /** Idle wealthy customers: above the positive-balance average with
    * no orders since 1999 (TPC-H's "no orders for 7 years") — scalar
    * broadcast threshold + anti-join, per nation. */
  def q22IdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val avgBal = cust.where(col("c_acctbal") > 0.0)
      .agg(davg(col("c_acctbal")).as("avg_bal"))
    cust.join(broadcast(avgBal))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(spark, dir)
          .where(col("o_orderdate") >= lit("1999-01-01")).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("numcust"), r6(dsum(col("c_acctbal"))).as("totacctbal"))
      .orderBy("nationkey")
  }

  val q22Oracle: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, COUNT(*) AS numcust,
      |  ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 6) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(c_acctbal)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND c_custkey NOT IN (
      |    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q8_market_share" -> (q8MarketShare _),
    "q9_profit" -> (q9Profit _),
    "q11_important_parts" -> (q11ImportantParts _),
    "q12_late_lines" -> (q12LateLines _),
    "q16_supplier_cnt" -> (q16SupplierCnt _),
    "q2_mincost" -> (q2MinCost _),
    "q20_excess" -> (q20Excess _),
    "q21_waiting" -> (q21Waiting _),
    "q22_idle_customers" -> (q22IdleCustomers _))

  val oracles: Map[String, String] = Map(
    "q8_market_share" -> q8Oracle,
    "q9_profit" -> q9Oracle,
    "q11_important_parts" -> q11Oracle,
    "q12_late_lines" -> q12Oracle,
    "q16_supplier_cnt" -> q16Oracle,
    "q2_mincost" -> q2Oracle,
    "q20_excess" -> q20Oracle,
    "q21_waiting" -> q21Oracle,
    "q22_idle_customers" -> q22Oracle)
}
