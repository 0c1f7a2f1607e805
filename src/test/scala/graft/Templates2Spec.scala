package graft

import graft.spatial.Templates2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantics + plan shape for the round-13 analysis-template
  * completions (route-optimization, power-consumption,
  * equipment-monitoring — analysis-templates.ts:65/200/251). */
class Templates2Spec extends SparkSpec {

  private def planStr(df: DataFrame): String =
    df.queryExecution.executedPlan.toString
  private def exchanges(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).size

  test("route efficiency: displacement never exceeds track, directness in (0,1]") {
    val rows = Templates2.routeEfficiency(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val track = r.getAs[Double]("track_m")
      val straight = r.getAs[Double]("straight_m")
      val nFix = r.getAs[Long]("n_fixes")
      val nTurns = r.getAs[Long]("n_course_changes")
      // triangle inequality: the within-day legs cover first→last, and
      // track additionally carries the overnight leg (3 dp slack)
      assert(straight <= track + 0.01, s"straight $straight > track $track")
      assert(nTurns <= nFix, "more turns than fixes")
      if (!r.isNullAt(r.fieldIndex("directness"))) {
        val d = r.getAs[Double]("directness")
        // 0.0 is reachable: a day ending where it started
        assert(d >= 0.0 && d <= 1.0 + 1e-6, s"directness $d out of range")
      }
    }
    // the synthetic zig-zag track is far from a rhumb line: course
    // changes must actually fire somewhere
    assert(rows.map(_.getAs[Long]("n_course_changes")).sum > 0)
  }

  test("route efficiency plan: two key exchanges (vessel window, vessel-day report), no cartesian") {
    val p = planStr(Templates2.routeEfficiency(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(exchanges(p) <= 2, p.take(4000))
  }

  test("power budget: 24-hour profile, shares sum to 1, exactly one peak per vessel") {
    val df = Templates2.powerBudget(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val h = r.getAs[Long]("hour"); h >= 0 && h <= 23
    })
    val perUser = rows.groupBy(_.getAs[Long]("user_id"))
    perUser.foreach { case (u, rs) =>
      assert(rs.length <= 24, s"user $u has ${rs.length} hours")
      assert(rs.count(_.getAs[Boolean]("is_peak")) == 1, s"user $u peak count")
      val shareSum = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(shareSum - 1.0) < 1e-3, s"user $u shares sum $shareSum")
      val peak = rs.find(_.getAs[Boolean]("is_peak")).get
      assert(peak.getAs[Double]("avg_w") >= rs.map(_.getAs[Double]("avg_w")).max - 1e-9)
    }
  }

  test("power budget plan: profile aggregates partially; window runs over the 24-row frame") {
    val p = planStr(Templates2.powerBudget(spark, sfDir))
    assert(p.contains("partial_"), p.take(3000))
    // (vessel, hour) aggregation + vessel window = exactly two exchanges
    assert(exchanges(p) == 2, p.take(4000))
  }

  test("equipment drift: split is interior, flag matches the 5% rule") {
    val rows = Templates2.equipmentDrift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val nRec = r.getAs[Long]("n_recent")
      assert(nRec > 0 && nRec < n, s"split not interior: $nRec of $n")
      val drift = r.getAs[Double]("drift_pct")
      assert(r.getAs[Boolean]("drifting") == (math.abs(drift) > 0.05))
      assert(!r.isNullAt(r.fieldIndex("baseline")) && !r.isNullAt(r.fieldIndex("recent")))
    }
  }

  test("equipment drift plan: bounds window and aggregation share ONE series-key exchange") {
    val p = planStr(Templates2.equipmentDrift(spark, sfDir))
    assert(exchanges(p) == 1, p.take(4000))
    assert(!p.contains("CartesianProduct"))
  }
}
