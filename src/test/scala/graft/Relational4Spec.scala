package graft

import graft.operators.Relational4

class Relational4Spec extends SparkSpec {

  test("q8_market_share yields one share per year in [0,1]") {
    val rows = Relational4.q8MarketShare(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("q9_profit broadcasts part/supplier/nation dims") {
    val plan = Relational4.q9Profit(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
  }

  test("q11_important_parts keeps only parts above the revenue fraction") {
    val df = Relational4.q11ImportantParts(spark, sfDir)
    val rows = df.collect()
    val vals = rows.map(_.getDouble(1))
    assert(vals.zip(vals.sorted.reverse).forall { case (a, b) => a == b },
      "must be ordered by value desc")
    // every kept part must clear the fixed fraction of the total
    import org.apache.spark.sql.functions._
    val total = Tables.lineitem(spark, sfDir)
      .agg(funcs.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
      .head.getDouble(0)
    assert(rows.forall(_.getDouble(1) > 0.0008 * total * 0.999))
  }

  test("q12_late_lines high+low counts partition the late lines") {
    import org.apache.spark.sql.functions._
    val rows = Relational4.q12LateLines(spark, sfDir).collect()
    val totalLate = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .where(datediff(col("l_shipdate"), col("o_orderdate")).between(60, 120))
      .count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == totalLate)
  }

  test("q16_supplier_cnt excludes deficit suppliers via anti-join") {
    val plan = Relational4.q16SupplierCnt(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected left-anti join:\n$plan")
  }

  test("q21_waiting flags a unique laggard per multi-supplier order") {
    val rows = Relational4.q21Waiting(spark, sfDir).collect()
    // counts are positive and ordered desc with name tie-break
    assert(rows.forall(_.getLong(1) > 0))
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.sorted.reverse).forall { case (a, b) => a == b })
  }

  test("q22_idle_customers only counts above-average balances") {
    import org.apache.spark.sql.functions._
    val cust = Tables.customer(spark, sfDir)
    val avg = cust.where(col("c_acctbal") > 0.0)
      .agg(funcs.davg(col("c_acctbal"))).head.getDouble(0)
    val rows = Relational4.q22IdleCustomers(spark, sfDir).collect()
    // each nation's total balance must exceed numcust * avg
    assert(rows.forall(r => r.getDouble(2) > r.getLong(1) * avg))
  }
}
