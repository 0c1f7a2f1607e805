package graft.operators

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core queries — engine sanity + scale patterns.
  *
  * Scale notes: dims (nation/region/customer at TPC-H ratios) are
  * broadcast; fact-side aggregations are algebraic so Catalyst emits
  * partial (map-side) aggregation before the single shuffle on the
  * group keys. At 100 TB the same plans hold: the only wide exchange
  * is on the final group-by keys.
  */
object Relational {

  /** TPC-H Q1-style pricing summary over lineitem. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Revenue per market segment: customer ⋈ orders ⋈ lineitem.
    * customer is small relative to the facts → broadcast. */
  def q2JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(dsum(rev, 4).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("c_mktsegment")
  }

  val q2Oracle: String =
    """SELECT c_mktsegment,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Top-10 customers by revenue — orderBy + limit (TopK, no full sort
    * at scale: Spark plans TakeOrderedAndProject). */
  def q3TopK(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(dsum(rev, 4).as("revenue"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(10)
  }

  val q3Oracle: String =
    """SELECT o_custkey,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY revenue DESC, o_custkey LIMIT 10""".stripMargin

  /** Suppliers per region — pure broadcast dim joins. */
  def q4DimBroadcast(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_suppliers"), dsum(col("s_acctbal"), 2).as("total_acctbal"))
      .orderBy("r_name")

  val q4Oracle: String =
    """SELECT r_name, COUNT(*) AS n_suppliers,
      |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_join_agg" -> (q2JoinAgg _),
    "q3_topk" -> (q3TopK _),
    "q4_dim_broadcast" -> (q4DimBroadcast _))

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1Oracle,
    "q2_join_agg" -> q2Oracle,
    "q3_topk" -> q3Oracle,
    "q4_dim_broadcast" -> q4Oracle)
}
