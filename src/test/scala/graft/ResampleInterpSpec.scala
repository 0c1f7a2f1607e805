package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** Linear-interpolation resampling (operators/AsOf.scala). */
class ResampleInterpSpec extends SparkSpec {

  private val res = 21600000L // 6 h

  test("grid points are exactly the 6h multiples inside each series' half-open span") {
    val out = AsOf.resampleInterp(spark, sfDir).cache()
    assert(out.where(col("grid_ms") % res =!= 0).count() === 0)
    // per-user count: #{g multiple of res : t_first <= g < t_last} —
    // the pair windows [ceil(t0), t1) tile [t_first, t_last) disjointly
    val spans = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(min("ts_ms").as("t0"), max("ts_ms").as("t1"))
      .withColumn("expected",
        greatest(lit(0L),
          expr(s"((t1 - 1) DIV $res) - ((t0 + ${res - 1}) DIV $res) + 1")))
    val counts = out.groupBy("user_id").agg(count(lit(1)).as("actual"))
    val joined = spans.join(counts, Seq("user_id"), "left")
      .withColumn("actual", coalesce(col("actual"), lit(0L)))
    assert(joined.where(col("actual") =!= col("expected")).count() === 0)
    out.unpersist()
  }

  test("interpolated values are convex combinations: within the bracketing pair's range") {
    // recompute each grid point's bracketing pair independently (as-of
    // style) and check v in [min(v0,v1), max(v0,v1)]
    val obs = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_ms").as("t"))
      .agg(funcs.davg(col("value")).as("v"))
    val out = AsOf.resampleInterp(spark, sfDir)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("t")
    val pairs = obs
      .withColumn("t_next", lead("t", 1).over(w))
      .withColumn("v_next", lead("v", 1).over(w))
      .where(col("t_next").isNotNull)
    val checked = out.join(pairs,
      out("user_id") === pairs("user_id") &&
        out("grid_ms") >= pairs("t") && out("grid_ms") < pairs("t_next"))
    assert(checked.count() === out.count()) // every grid point has its pair
    val eps = 1e-6
    assert(checked.where(
      out("value") < least(col("v"), col("v_next")) - eps ||
        out("value") > greatest(col("v"), col("v_next")) + eps).count() === 0)
  }

  test("a grid point landing exactly on an observation reproduces it; interior points split the difference") {
    import spark.implicits._
    // synthetic: one user, observations at 0h and 12h → grid at 0h and
    // 6h; v(0h)=10 exact hit, v(6h)=midpoint
    val df = Seq((1L, 0L, 10.0), (1L, 43200000L, 30.0))
      .toDF("user_id", "ts_ms", "value")
    // drive the same arithmetic through a local copy of the operator's
    // core (the operator itself reads the events table)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("ts_ms")
    val o = df
      .withColumn("t1", lead("ts_ms", 1).over(w))
      .withColumn("v1", lead("value", 1).over(w))
      .where(col("t1").isNotNull)
      .withColumn("g0", expr(s"((ts_ms + ${res - 1}) DIV $res) * $res"))
      .where(col("g0") < col("t1"))
      .select(col("user_id"), col("ts_ms").as("t0"), col("value").as("v0"),
        col("t1"), col("v1"),
        explode(sequence(col("g0"), col("t1") - 1, lit(res))).as("grid_ms"))
      .withColumn("value", funcs.r6(col("v0") + (col("v1") - col("v0")) *
        (col("grid_ms") - col("t0")).cast("double") / (col("t1") - col("t0")).cast("double")))
      .select("grid_ms", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(o === Map(0L -> 10.0, 21600000L -> 20.0))
  }
}
