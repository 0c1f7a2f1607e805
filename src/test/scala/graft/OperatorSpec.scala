package graft

import graft.funcs._
import graft.operators._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Semantics specs for the reference-derived operators. */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("vectorAvg: mean of 10 and 350 degrees is 0, not 180") {
    val deg10 = math.toRadians(10)
    val deg350 = math.toRadians(350)
    val out = Seq(deg10, deg350).toDF("value")
      .agg(vectorAvg(col("value")).as("m")).head().getDouble(0)
    assert(math.abs(out) < 1e-6, s"vector mean was $out rad")
  }

  test("haversineM: 1 degree of latitude is ~111.2 km") {
    val d = Seq((40.0, -74.0, 41.0, -74.0)).toDF("a", "b", "c", "d")
      .select(haversineM(col("a"), col("b"), col("c"), col("d"))).head().getDouble(0)
    assert(math.abs(d - 111194.9) < 100, s"distance $d")
  }

  test("bearingDeg: due east is 90") {
    val b = Seq((0.0, 0.0, 0.0, 1.0)).toDF("a", "b", "c", "d")
      .select(bearingDeg(col("a"), col("b"), col("c"), col("d"))).head().getDouble(0)
    assert(math.abs(b - 90.0) < 1e-6)
  }

  test("inBbox handles 180-meridian wrap") {
    val df = Seq((0.0, 179.5), (0.0, -179.5), (0.0, 0.0)).toDF("lat", "lon")
    val n = df.where(inBbox(col("lat"), col("lon"), 170.0, -10.0, -170.0, 10.0)).count()
    assert(n == 2)
  }

  test("bucketMs floors to the resolution grid") {
    val b = Seq(1704067798778L).toDF("ts_ms")
      .select(bucketOfMs(col("ts_ms"), 3600000L)).head().getLong(0)
    assert(b == 1704067200000L)
  }

  test("episodes: boundaries pair starts with next end") {
    val rows = Sessions.episodes(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.filter(_.getAs[String]("status") == "completed").foreach { r =>
      assert(r.getAs[Long]("end_ms") > r.getAs[Long]("start_ms"))
      assert(r.getAs[Double]("duration_s") > 0)
    }
    // at most one active episode per user
    val actives = rows.filter(_.getAs[String]("status") == "active")
      .groupBy(_.getAs[Long]("user_id")).values.map(_.size)
    assert(actives.forall(_ == 1))
  }

  test("thresholdHysteresis: fires are >= 24h apart per user") {
    val fires = Sessions.thresholdHysteresis(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    fires.values.foreach { fs =>
      fs.map(_._2).sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(b - a >= 86400000L)
        case _ =>
      }
    }
  }

  test("thresholdBand: activates below lo, releases only above hi, holds in the band") {
    val out = Sessions.thresholdBand(spark, sfDir).collect()
    assert(out.nonEmpty)
    // both directions occur: a below-lo activation AND an above-hi release
    val byT = out.groupBy(_.getAs[String]("transition"))
    assert(byT.contains("activated") && byT.contains("deactivated"))
    // level semantics: every activation row is strictly below lo, every
    // release strictly above hi — a band-valued row can never transition
    byT("activated").foreach(r => assert(r.getAs[Double]("value") < 50.0))
    byT("deactivated").foreach(r => assert(r.getAs[Double]("value") > 150.0))
    // transitions strictly alternate per user, starting with an
    // activation (initial state is OFF) — no flapping inside the band
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      val seq = rs.sortBy(_.getLong(1)).map(_.getAs[String]("transition")).toSeq
      assert(seq.headOption.forall(_ == "activated"))
      seq.sliding(2).foreach {
        case Seq(a, b) => assert(a != b, s"flap: $seq")
        case _ =>
      }
    }
  }

  test("funnel stages are monotone and genuinely partial") {
    val r = operators.Funnel.funnel(spark, sfDir).head()
    val (v, c, p) = (r.getAs[Long]("n_view"),
      r.getAs[Long]("n_click_after_view"), r.getAs[Long]("n_purchase_after_click"))
    assert(v >= c && c >= p, s"funnel not monotone: $v $c $p")
    assert(v > 0 && p < v, "thresholds must keep the funnel partial")
    assert(r.getAs[Double]("conv_click") <= 1.0 &&
      r.getAs[Double]("conv_purchase") < 1.0)
  }

  test("cohort retention: multiple cohorts, each r_k bounded by its cohort size") {
    val rows = operators.Funnel.cohortRetention(spark, sfDir).collect()
    assert(rows.length >= 2, "first-purchase weeks must spread cohorts")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_users")
      Seq("r1", "r2", "r3", "r4").foreach(k => assert(r.getAs[Long](k) <= n))
    }
  }

  test("tier re-aggregation equals direct aggregation on counts and min/max") {
    val direct = TimeSeries.tierRollup(Tables.events(spark, sfDir), 3600000L)
      .select(sum("sample_count"), min("value_min"), max("value_max")).head()
    val reagg = TimeSeries.tierReagg(spark, sfDir)
      .select(sum("sample_count"), min("value_min"), max("value_max")).head()
    assert(direct == reagg)
  }

  test("sma equals mean of trailing window") {
    val rows = TimeSeries.sma(spark, sfDir)
      .where(col("event_type") === "click").orderBy("ts_ms", "event_id")
      .select("value", "sma").collect()
    val vals = rows.map(_.getDouble(0))
    rows.zipWithIndex.foreach { case (r, i) =>
      val window = vals.slice(math.max(0, i - 9), i + 1)
      assert(math.abs(r.getDouble(1) - window.sum / window.length) < 1e-9)
    }
  }

  test("ema matches sequential recurrence") {
    val pts = Tables.events(spark, sfDir)
      .where(col("user_id") === 0 && col("event_type") === "click")
      .orderBy("ts_ms", "event_id").select("value").collect().map(_.getDouble(0))
    val expected = pts.reduceLeft((acc, x) => acc * 0.8 + x * 0.2)
    val got = TimeSeries.ema(spark, sfDir)
      .where(col("user_id") === 0 && col("event_type") === "click")
      .head().getAs[Double]("ema")
    assert(math.abs(got - BigDecimal(expected).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }
}
