package graft

import org.apache.spark.sql.functions._

/** Automation lifecycle (commands.ts:435-508 enable = force OFF +
  * immediate evaluation + continuous watch; disable = stop monitoring,
  * state untouched) and the multi-threshold single-pass watch.
  */
class AutomationSpec extends SparkSpec {
  import graft.operators.Sessions

  private def frame(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "ts_ms", "event_id", "event_type", "value")
  }

  // transition tuples (ts_ms, transition, trigger) for user 1
  private def run(rows: Seq[(Long, Long, Long, String, Double)]) =
    Sessions.automationLifecycleOn(frame(rows)).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3))).toSeq

  test("enable forces OFF, immediate evaluation re-activates on a low value") {
    val out = run(Seq(
      (1L, 1000L, 1L, "signup", 200.0), // enable; no value yet -> stays OFF
      (1L, 2000L, 2L, "error", 30.0), // < lo while enabled -> ON
      (1L, 3000L, 3L, "signup", 10.0), // disable: state untouched (still ON)
      (1L, 4000L, 4L, "error", 500.0), // above hi but DISABLED -> ignored
      (1L, 5000L, 5L, "signup", 200.0), // enable: force OFF, eval last=500 -> stays OFF
      (1L, 6000L, 6L, "error", 20.0), // < lo enabled -> ON
      (1L, 7000L, 7L, "signup", 300.0))) // enable: force OFF, eval last=20 < lo -> back ON (net no transition)
    assert(out == Seq(
      (2000L, "activated", "watch"),
      (5000L, "deactivated", "enable_eval"),
      (6000L, "activated", "watch")))
  }

  test("band value at enable leaves the forced OFF standing") {
    val out = run(Seq(
      (1L, 1000L, 1L, "signup", 200.0), // enable
      (1L, 2000L, 2L, "error", 30.0), // ON
      (1L, 3000L, 3L, "error", 100.0), // band: hold ON
      (1L, 4000L, 4L, "signup", 200.0), // re-enable: force OFF, eval last=100 (band) -> OFF stands
      (1L, 5000L, 5L, "error", 100.0))) // band: hold OFF
    assert(out == Seq(
      (2000L, "activated", "watch"),
      (4000L, "deactivated", "enable_eval")))
  }

  test("default state is OFF and disabled monitoring emits nothing") {
    val out = run(Seq(
      (1L, 1000L, 1L, "error", 20.0), // below lo but automation never enabled
      (1L, 2000L, 2L, "error", 500.0)))
    assert(out.isEmpty)
  }

  test("multi-threshold: watchers are independent and scan the events table once") {
    val df = Sessions.multiThreshold(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // independence: restricting the registry to one watcher reproduces
    // exactly that watcher's slice of the combined run
    val ids = rows.map(r => r.getString(1)).distinct.sorted
    assert(ids.length == 3, ids.mkString(","))
    // strict alternation per (user, watcher): level-trigger edges
    val byKey = rows.groupBy(r => (r.getLong(0), r.getString(1)))
    byKey.values.foreach { seq =>
      val tr = seq.sortBy(_.getLong(2)).map(_.getString(3))
      assert(tr.head == "activated")
      tr.sliding(2).foreach { p =>
        if (p.length == 2) assert(p(0) != p(1), tr.mkString(","))
      }
    }
    // ONE scan: the plan reads the events parquet exactly once (the
    // registry broadcast fans rows out in place — adding watchers must
    // not add scans). Fresh DataFrame: an EXECUTED adaptive plan's
    // toString prints Final + Initial sections, duplicating each node.
    val plan = graft.operators.Sessions.multiThreshold(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = plan.split('\n')
      .count(l => l.contains("FileScan") && l.contains("events.parquet"))
    assert(scans == 1, s"expected 1 events scan, got $scans\n" + plan.take(2000))
  }
}
