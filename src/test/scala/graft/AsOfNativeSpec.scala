package graft

import graft.plans.AsOfJoinNative
import org.apache.spark.sql.functions._

class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of join picks the latest quote at-or-before each probe") {
    val probes = Seq(
      (1L, 1L, 100L, 9.0), (2L, 1L, 250L, 9.0), (3L, 1L, 50L, 9.0),
      (4L, 2L, 100L, 9.0), (5L, 3L, 100L, 9.0)
    ).toDF("event_id", "user_id", "ts_ms", "value")
    val quotes = Seq(
      (10L, 1L, 100L, 1.0), (11L, 1L, 100L, 2.0), // tie at ts=100 -> max event_id wins
      (12L, 1L, 200L, 3.0),
      (13L, 2L, 150L, 4.0) // after user 2's probe
    ).toDF("event_id", "user_id", "ts_ms", "value")
    val out = AsOfJoinNative.asOfJoin(probes, quotes,
        "user_id", "ts_ms", "value", "event_id")
      .orderBy("event_id")
      .select("event_id", "asof_value")
      .as[(Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      1L -> Some(2.0), // quote AT probe ts visible, tie broken by event_id
      2L -> Some(3.0), // latest earlier quote
      3L -> None, // before any quote
      4L -> None, // quote later than probe
      5L -> None)) // no quotes for key
  }

  test("native as-of join matches the composed union+LOCF operator on real data") {
    val native = AsOfJoinNative.skAsOfNative(spark, sfDir).collect().toSeq
    val composed = graft.operators.AsOf.skAsOfJoin(spark, sfDir).collect().toSeq
    assert(native.size == composed.size)
    assert(native == composed)
  }

  test("native as-of plan is one exchange per side and no window") {
    val plan = AsOfJoinNative.skAsOfNative(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), "no window operator expected:\n" + plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 key exchanges, got $exchanges:\n$plan")
  }

  test("self-as-of (same frame both sides) does not collide on attribute ids") {
    val df = Seq((1L, 1L, 100L, 5.0), (2L, 1L, 200L, 6.0))
      .toDF("event_id", "user_id", "ts_ms", "value")
    val out = AsOfJoinNative.asOfJoin(df, df, "user_id", "ts_ms", "value", "event_id")
      .orderBy("event_id")
      .select("event_id", "asof_value").as[(Long, Option[Double])].collect().toSeq
    assert(out == Seq(1L -> Some(5.0), 2L -> Some(6.0)))
  }
}
