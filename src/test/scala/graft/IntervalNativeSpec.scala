package graft

import graft.plans.IntervalJoinNative
import org.apache.spark.sql.functions._

class IntervalNativeSpec extends SparkSpec {
  import spark.implicits._

  test("native interval join: containment boundaries, overlaps, multi-key") {
    val intervals = Seq(
      (1L, 100L, 250L),
      (1L, 200L, 400L), // overlaps the first -> points in [200,250) match both
      (2L, 0L, 50L)
    ).toDF("user_id", "s_ms", "e_ms")
    val points = Seq(
      (1L, 100L, 1.0), // at start -> in first only
      (1L, 220L, 2.0), // in both
      (1L, 250L, 3.0), // at first's end -> second only
      (1L, 400L, 4.0), // at second's end -> out
      (2L, 49L, 5.0), // in
      (2L, 50L, 6.0), // at end -> out
      (3L, 10L, 7.0) // keyless
    ).toDF("user_id", "ts_ms", "value")
    val out = IntervalJoinNative.intervalJoin(points, intervals,
        "user_id", "ts_ms", "s_ms", "e_ms")
      .select("user_id", "start_ms", "ts_ms")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(out == Seq(
      (1L, 100L, 100L), (1L, 100L, 220L), (1L, 200L, 220L), (1L, 200L, 250L),
      (2L, 0L, 49L)))
  }

  test("native interval join matches the chunk-decomposed operator on real data") {
    val native = IntervalJoinNative.skIntervalNative(spark, sfDir).collect().toSeq
    val composed = graft.operators.Intervals.skIntervalJoin(spark, sfDir).collect().toSeq
    assert(native == composed && native.nonEmpty)
  }

  test("native interval plan: one exchange per side, no nested loop, no explode") {
    val plan = IntervalJoinNative.skIntervalNative(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    // the episode (interval) side derives from windows that already
    // cluster by user_id; the join itself must add no third exchange
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected at most 2 key exchanges, got $exchanges:\n$plan")
  }

  test("self-lineage interval join does not collide on attribute ids") {
    val df = Seq((1L, 100L, 5.0), (1L, 300L, 6.0)).toDF("user_id", "ts_ms", "value")
    val ivals = df.groupBy("user_id")
      .agg(min("ts_ms").as("s_ms"), (max("ts_ms") + 1L).as("e_ms"))
    val out = IntervalJoinNative.intervalJoin(df, ivals, "user_id", "ts_ms", "s_ms", "e_ms")
      .select("ts_ms").as[Long].collect().sorted.toSeq
    assert(out == Seq(100L, 300L))
  }
}
