package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both sides on the join key
  * lets SortMergeJoin run without any Exchange — the 100 TB pattern
  * for repeated fact-to-fact joins (bucket once, join many times). */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans no shuffle") {
    // default warehouse (./spark-warehouse, gitignored) — the conf is
    // static and cannot be redirected at runtime
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // a previously failed run may leave orphan table dirs behind
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) {
        d.listFiles().foreach(_.delete()); d.delete()
      }
    }
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    // force the sort-merge path (small test tables would otherwise
    // broadcast, which hides the bucketing property being tested)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .agg(sum("l_quantity"))
    // correctness: equals the unbucketed join
    val expected = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .agg(sum("l_quantity")).head().getDouble(0)
    assert(joined.head().getDouble(0) == expected)
    // plan: the join itself must not exchange either side
    val plan = joined.queryExecution.executedPlan.toString
    val joinSection = plan.split("\n").dropWhile(!_.contains("SortMergeJoin"))
    val exchanges = joinSection.count(_.contains("Exchange hashpartitioning"))
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(exchanges == 0, s"expected no exchange under the bucketed join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
