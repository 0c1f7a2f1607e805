package graft

import graft.operators.{AsOf, Sessions}
import graft.streaming.Streaming
import org.apache.spark.sql.functions._

/** Nearest-direction as-of join (operators/AsOf.scala asOfNearest) and
  * the streaming session-window twin (streaming/Streaming.scala
  * streamSessionWindow). */
class AsOfNearestSessionStreamSpec extends SparkSpec {

  test("asOfNearest picks the time-closest quote, ties to backward") {
    val out = AsOf.asOfNearest(spark, sfDir).cache()
    // brute-force model: per probe, min |Δ|; tie -> earlier quote
    val quotes = Tables.events(spark, sfDir)
      .where(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts_ms").as("q_ts"))
      .agg(max_by(col("value"), col("event_id")).as("q_value"))
    val probes = Tables.events(spark, sfDir)
      .where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val model = probes.join(quotes, "user_id")
      .withColumn("delta", abs(col("ts_ms") - col("q_ts")))
      .groupBy("event_id")
      .agg(min_by(struct(col("delta"), col("q_ts"), col("q_value")),
        // tie-break: smaller delta first, then the EARLIER quote,
        // which is the backward one when deltas are equal
        struct(col("delta"), col("q_ts"))).as("pick"))
      .select(col("event_id"), col("pick.q_value").as("m_value"),
        col("pick.q_ts").as("m_ts"))
    val joined = out.join(model, "event_id").cache()
    assert(joined.where(col("nearest_value") =!= col("m_value") ||
      col("nearest_ts_ms") =!= col("m_ts")).count() === 0)
    // probes with no quote for their user keep NULLs and no direction
    val userHasQuote = quotes.select("user_id").distinct()
    val orphan = out.join(userHasQuote, Seq("user_id"), "left_anti")
    assert(orphan.where(col("nearest_value").isNotNull ||
      col("direction").isNotNull).count() === 0)
  }

  test("asOfNearest direction labels are consistent with the timestamps") {
    val out = AsOf.asOfNearest(spark, sfDir).cache()
    assert(out.where(col("direction") === "backward" &&
      col("nearest_ts_ms") > col("ts_ms")).count() === 0)
    assert(out.where(col("direction") === "forward" &&
      col("nearest_ts_ms") <= col("ts_ms")).count() === 0)
    // both directions actually occur in the data
    assert(out.where(col("direction") === "backward").count() > 0)
    assert(out.where(col("direction") === "forward").count() > 0)
  }

  test("asOfNearest plans one exchange and one sort for both window passes") {
    spark.catalog.clearCache() // earlier tests cache this exact frame
    val plan = AsOf.asOfNearest(spark, sfDir).queryExecution.executedPlan.toString
    // the forward pass must reuse the backward pass's partitioning AND
    // ordering: exactly one single-key hashpartitioning(user_id)
    // exchange feeds ALL the Window nodes (the other hash exchange in
    // the plan is the quote-dedup groupBy(user_id, ts_ms), keyed on
    // two columns), and one window Sort plus the presentation orderBy
    val windowEx = "hashpartitioning\\(user_id#\\d+L?, \\d+\\)".r.findAllIn(plan).size
    assert(windowEx === 1, s"expected 1 single-key window exchange, plan:\n$plan")
    val sorts = "Sort \\[".r.findAllIn(plan).size
    assert(sorts <= 2, s"expected <=2 sorts (window + presentation), plan:\n$plan")
  }

  test("streamSessionWindow drains to the exact batch session table") {
    val streamed = Streaming.queries("stream_session_window")(spark, sfDir)
    val batch = Sessions.sessionWindows(spark, sfDir)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    assert(batch.count() > 0)
  }
}
