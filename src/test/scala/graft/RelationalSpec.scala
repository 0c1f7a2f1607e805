package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("q1_agg groups lineitem and aggregates exactly") {
    val rows = Relational.q1Agg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val schema = Relational.q1Agg(spark, sfDir).schema
    assert(schema.fieldNames.toSeq ==
      Seq("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "avg_disc", "count_order"))
    // total row count must equal lineitem count
    val total = rows.map(_.getLong(5)).sum
    assert(total == Tables.lineitem(spark, sfDir).count())
  }

  test("q2_join_agg broadcasts customer dim") {
    val plan = Relational.q2JoinAgg(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in plan:\n$plan")
  }

  test("q3_topk returns exactly 10 rows ordered by revenue desc") {
    val rows = Relational.q3TopK(spark, sfDir).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.sorted.reverse).forall { case (a, b) => a == b })
  }

  test("q4_dim_broadcast covers all 5 regions") {
    assert(Relational.q4DimBroadcast(spark, sfDir).count() == 5)
  }

  test("q1 scan prunes columns") {
    val plan = Relational.q1Agg(spark, sfDir).queryExecution.executedPlan.toString
    // projection should not read l_shipdate / l_partkey etc.
    assert(!plan.contains("l_shipdate"))
  }
}
