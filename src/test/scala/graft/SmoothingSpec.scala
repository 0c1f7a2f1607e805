package graft

import graft.operators.Smoothing
import org.apache.spark.sql.functions._

class SmoothingSpec extends SparkSpec {
  import spark.implicits._

  test("emaSeries matches the sequential recurrence per series") {
    val df = Seq(
      ("a", "p", 1L, 1L, 10.0), ("a", "p", 2L, 2L, 20.0), ("a", "p", 3L, 3L, 30.0),
      ("b", "p", 1L, 4L, 5.0), ("b", "p", 2L, 5L, 15.0)
    ).toDF("context", "path", "ts_ms", "order_id", "value")
    val out = Smoothing.emaSeries(df, alpha = 0.2, smaWindow = 2)
      .collect().map(p => ((p.context, p.ts_ms), (p.ema, p.sma))).toMap
    // series a: ema 10, 0.2*20+0.8*10=12, 0.2*30+0.8*12=15.6
    assert(math.abs(out(("a", 1L))._1 - 10.0) < 1e-12)
    assert(math.abs(out(("a", 2L))._1 - 12.0) < 1e-12)
    assert(math.abs(out(("a", 3L))._1 - 15.6) < 1e-12)
    // sma window 2: 10, 15, 25
    assert(math.abs(out(("a", 3L))._2 - 25.0) < 1e-12)
    // series b restarts
    assert(math.abs(out(("b", 1L))._1 - 5.0) < 1e-12)
    assert(math.abs(out(("b", 2L))._1 - 0.2 * 15 + -0.0 + 0.8 * 5 - 0.0) < 1e-9 ||
      math.abs(out(("b", 2L))._1 - (0.2 * 15 + 0.8 * 5)) < 1e-12)
  }

  test("emaSeries on the events series is deterministic and complete") {
    val series = graft.api.ApiQueries.series(spark, sfDir)
    val n = series.count()
    val out = Smoothing.emaSeries(series, 0.2, 10)
    assert(out.count() == n)
  }
}
