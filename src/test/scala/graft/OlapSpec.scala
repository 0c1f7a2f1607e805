package graft

import graft.operators.Olap
import org.apache.spark.sql.functions._

/** ROLLUP cube and wide pivot (operators/Olap.scala). */
class OlapSpec extends SparkSpec {

  test("q_rollup: levels are consistent — nations sum to their region, regions to the grand total") {
    val df = Olap.rollupRevenue(spark, sfDir).cache()
    val nations = df.where(col("level") === 0)
    val regions = df.where(col("level") === 1)
    val grand = df.where(col("level") === 3).collect()
    assert(grand.length === 1)
    assert(grand.head.getAs[String]("r_name") === "ALL")

    // per-region subtotal == sum of its nation rows (counts are exact)
    val perRegion = nations.groupBy("r_name")
      .agg(sum("n_lines").as("n")).collect()
      .map(r => r.getAs[String]("r_name") -> r.getAs[Long]("n")).toMap
    regions.collect().foreach { r =>
      assert(r.getAs[Long]("n_lines") === perRegion(r.getAs[String]("r_name")))
    }
    // grand total == sum over nations
    assert(grand.head.getAs[Long]("n_lines") ===
      nations.agg(sum("n_lines")).collect().head.getLong(0))
    df.unpersist()
  }

  test("q_rollup: grouping_id bitmask tags exactly the rolled-up columns") {
    val df = Olap.rollupRevenue(spark, sfDir)
    val byLevel = df.groupBy("level").count().collect()
      .map(r => r.getAs[Long]("level") -> r.getAs[Long]("count")).toMap
    // level 2 (r_name rolled up but n_name kept) cannot occur in ROLLUP
    assert(!byLevel.contains(2L))
    assert(byLevel(3L) === 1L)
    // every level-1 row has n_name = ALL, every level-0 row has a real nation
    assert(df.where(col("level") === 1 && col("n_name") =!= "ALL").count() === 0)
    assert(df.where(col("level") === 0 &&
      (col("n_name") === "ALL" || col("r_name") === "ALL")).count() === 0)
  }

  test("sk_pivot_wide: one row per user; counts sum back to the event count") {
    val df = Olap.pivotEvents(spark, sfDir).cache()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(df.count() === users)
    val totalFromPivot = df.select(
      Olap.EventTypes.map(t => sum(col(s"${t}_n"))).reduce(_ + _).as("n"))
      .collect().head.getLong(0)
    assert(totalFromPivot === Tables.events(spark, sfDir).count())
    df.unpersist()
  }

  test("sk_pivot_wide: a type absent for a user yields count 0 and NULL mean") {
    val df = Olap.pivotEvents(spark, sfDir)
    val zeroRows = df.where(col("click_n") === 0)
    // whenever the count is 0 the mean must be NULL, and vice versa
    assert(zeroRows.where(col("click_avg").isNotNull).count() === 0)
    assert(df.where(col("click_n") > 0 && col("click_avg").isNull).count() === 0)
  }

  test("q_rollup plan: a single aggregate over Expand — not one job per level") {
    val plan = Olap.rollupRevenue(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
  }

  test("q_grouping_sets: each set reproduces its own GROUP BY; levels partition the output") {
    val rows = Olap.groupingSets(spark, sfDir).collect()
    val byLevel = rows.groupBy(_.getAs[Long]("level"))
    assert(byLevel.keySet == Set(1L, 2L), byLevel.keySet.toString)
    // level 1 = priority rows (returnflag rolled), level 2 = the reverse
    assert(byLevel(1L).forall(_.getAs[String]("dim_returnflag") == "ALL"))
    assert(byLevel(2L).forall(_.getAs[String]("dim_priority") == "ALL"))
    // both sets total the same joined row count
    val n1 = byLevel(1L).map(_.getAs[Long]("n_lines")).sum
    val n2 = byLevel(2L).map(_.getAs[Long]("n_lines")).sum
    assert(n1 == n2 && n1 > 0)
  }

  test("q_grouping_sets plan: one Expand + one aggregate, not a union of jobs") {
    val plan = Olap.groupingSets(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan.take(3000))
    assert(!plan.contains("Union"), plan.take(3000))
  }
}
