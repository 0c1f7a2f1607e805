package graft

import graft.operators.Analytics2
import org.apache.spark.sql.DataFrame

/** Semantics + plan shape for the round-13 analytics batch
  * (autocorrelation, change-point, MAD outliers). */
class Analytics2Spec extends SparkSpec {

  private def planStr(df: DataFrame): String =
    df.queryExecution.executedPlan.toString
  private def exchanges(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).size

  test("autocorr: r bounded, all three lags present, pairs shrink with lag") {
    val rows = Analytics2.autocorr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val acf = r.getAs[Double]("acf")
      assert(acf >= -1.0 - 1e-6 && acf <= 1.0 + 1e-6, s"acf $acf")
    }
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      assert(rs.map(_.getAs[Long]("lag")).sorted.toSeq == Seq(1L, 2L, 3L), s"$t lags")
      val byLag = rs.sortBy(_.getAs[Long]("lag")).map(_.getAs[Long]("n_pairs"))
      assert(byLag.zip(byLag.tail).forall { case (a, b) => b <= a }, s"$t pairs grow")
    }
  }

  test("autocorr plan: three lags from one ordered window — no per-lag self-join") {
    val p = planStr(Analytics2.autocorr(spark, sfDir))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(3000))
    // bucket agg + series window; the final series agg reuses the
    // window's partitioning
    assert(exchanges(p) <= 2, p.take(4000))
  }

  test("changepoint: one interior split per series, delta consistent with means") {
    val rows = Analytics2.changepoint(spark, sfDir).collect()
    assert(rows.length >= 3)
    val types = rows.map(_.getAs[String]("event_type"))
    assert(types.distinct.length == types.length, "duplicate series row")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_buckets") > 1)
      val d = r.getAs[Double]("delta")
      val ml = r.getAs[Double]("mean_left"); val mr = r.getAs[Double]("mean_right")
      // ml/mr are rounded after the fact; delta was rounded on the raw means
      assert(math.abs(d - math.abs(ml - mr)) < 2e-6, s"delta $d vs |$ml-$mr|")
      assert(d >= 0.0)
    }
  }

  test("changepoint is the true arg-max over brute-force splits") {
    import org.apache.spark.sql.functions._
    // brute force one series on the driver (test-scale only)
    val h = Tables.events(spark, sfDir)
      .where(col("event_type") === "click")
      .groupBy(graft.funcs.bucketOfMs(col("ts_ms"), 3600000L).as("b"))
      .agg(graft.funcs.r6(graft.funcs.davg(col("value"))).as("v"))
      .orderBy("b").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val n = h.length
    val best = (1 until n).map { i =>
      val (l, r) = h.splitAt(i)
      val d = math.abs(l.map(_._2).sum / i - r.map(_._2).sum / (n - i))
      (math.round(d * 1e6) / 1e6, h(i - 1)._1)
    }.max._1
    val got = Analytics2.changepoint(spark, sfDir)
      .where(col("event_type") === "click").collect().head.getAs[Double]("delta")
    assert(math.abs(got - best) < 2e-6, s"operator $got vs brute $best")
  }

  test("outlier MAD: every flagged row clears the 3-sigma-equivalent robust bar") {
    val rows = Analytics2.outlierMad(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getAs[Double]("score")
      assert(score > 3.0 - 1e-6, s"score $score under bar")
      val dev = math.abs(r.getAs[Double]("value") - r.getAs[Double]("med"))
      assert(dev > 3.0 * 1.4826 * r.getAs[Double]("mad") - 1e-5)
    }
  }

  test("outlier MAD plan: per-path stats broadcast back — the corpus never shuffles") {
    val p = planStr(Analytics2.outlierMad(spark, sfDir))
    // 3 = med join under the MAD aggregate + med and mad joins on the
    // report scan (MAD is inherently two-phase; the corpus is scanned,
    // never exchanged)
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p.take(4000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }
}
