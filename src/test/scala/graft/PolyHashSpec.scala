package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._

/** The native codegen PolyHash must agree with the SQL fold (the
  * oracle-checked formulation) on ASCII input. */
class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  test("native polyhash equals the SQL fold on ASCII strings") {
    val df = Seq("hello", "a", "the quick brown fox 123", "", "zzzzzzzzzzzzzzzzzzzz")
      .toDF("t")
    val rows = df.select(
      TextOps.polyHash("t", 31).as("sql31"),
      TextOps.polyHashNative(spark, "t", 31).as("native31"),
      TextOps.polyHash("t", 37).as("sql37"),
      TextOps.polyHashNative(spark, "t", 37).as("native37")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(2) == r.getLong(3))
    }
  }

  test("native polyhash known value (DuckDB cross-check)") {
    val h = Seq("hello").toDF("t")
      .select(TextOps.polyHashNative(spark, "t", 31)).head().getLong(0)
    assert(h == 99162322L)
  }

  test("native polyhash participates in whole-stage codegen") {
    // A parquet-backed frame (a literal Seq constant-folds to a
    // LocalTableScan with no codegen stage at all).
    val df = Tables.documents(spark, sfDir)
      .select(TextOps.polyHashNative(spark, "text", 31).as("h"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") && plan.contains("graft_polyhash"), plan)
  }
}
