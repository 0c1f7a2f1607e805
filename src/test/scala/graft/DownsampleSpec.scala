package graft

import graft.operators.Downsample
import org.apache.spark.sql.functions._

class DownsampleSpec extends SparkSpec {
  import spark.implicits._

  test("lttb keeps first/last, 52 real samples per series, extremes preserved") {
    val out = Downsample.lttb(spark, sfDir)
    val in = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts_ms"), col("value"))
    // every output point is a real input sample
    assert(out.join(in, Seq("event_type", "ts_ms", "value"), "left_anti").count() == 0)
    val perSeries = out.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      min("ts_ms").as("first_out"), max("ts_ms").as("last_out")).collect()
    val bounds = in.groupBy("event_type").agg(
      min("ts_ms").as("first_in"), max("ts_ms").as("last_in"),
      max("value").as("vmax")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    perSeries.foreach { r =>
      val (fi, li, vmax) = bounds(r.getString(0))
      assert(r.getLong(1) == 52, s"${r.getString(0)}: ${r.getLong(1)} points") // 50 buckets + endpoints
      assert(r.getLong(2) == fi && r.getLong(3) == li)
      // the global maximum forms the largest triangle in its bucket
      // against any anchor/next pair on this data, so LTTB must keep a
      // sample close to it — the property that bucket-averaging loses
      val kept = Downsample.lttb(spark, sfDir)
        .where(col("event_type") === r.getString(0))
        .agg(max("value")).as[Double].head()
      assert(kept >= 0.95 * vmax, s"kept max $kept vs true max $vmax")
    }
  }

  test("m4 keeps exact global extremes + endpoints, ≤4 real samples per bucket") {
    val out = Downsample.m4(spark, sfDir)
    val in = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts_ms"), col("value"))
    // every output point is a real input sample
    assert(out.join(in, Seq("event_type", "ts_ms", "value"), "left_anti").count() == 0)
    // ≤ 4 roles × 50 buckets per series, and the EXACT global min/max
    // values and first/last timestamps are all present (M4's
    // error-free-rendering guarantee — LTTB only approximates this)
    val gotBounds = out.groupBy("event_type").agg(
      count(lit(1)).as("n"), min("value").as("vmin"), max("value").as("vmax"),
      min("ts_ms").as("tmin"), max("ts_ms").as("tmax")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))).toMap
    val trueBounds = in.groupBy("event_type").agg(
      min("value").as("vmin"), max("value").as("vmax"),
      min("ts_ms").as("tmin"), max("ts_ms").as("tmax")).collect()
    assert(trueBounds.nonEmpty)
    trueBounds.foreach { r =>
      val (n, vmin, vmax, tmin, tmax) = gotBounds(r.getString(0))
      assert(n <= 4L * 50, s"${r.getString(0)}: $n points")
      assert(vmin == r.getDouble(1) && vmax == r.getDouble(2))
      assert(tmin == r.getLong(3) && tmax == r.getLong(4))
    }
  }
}
