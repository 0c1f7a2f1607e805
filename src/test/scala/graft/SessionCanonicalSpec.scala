package graft

import graft.dedup.Canonical
import graft.operators.Sessions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native session windows (operators/Sessions.scala) and canonical
  * keeper selection (dedup/Canonical.scala). */
class SessionCanonicalSpec extends SparkSpec {

  test("session_window equals the LAG+cumsum island model exactly") {
    val gap = 43200000L
    val e = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ms").as("t"), col("value"))
    val w = Window.partitionBy("user_id").orderBy("t")
    val islands = e
      .withColumn("new_s", when(col("t") - lag("t", 1).over(w) >= gap ||
        lag("t", 1).over(w).isNull, 1).otherwise(0))
      .withColumn("sid", sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("t").as("session_start_ms"),
        (max("t") + gap).as("session_end_ms"),
        count(lit(1)).as("n_events"),
        funcs.davg(col("value")).as("value_avg"))
      .drop("sid")
    val native = Sessions.sessionWindows(spark, sfDir)
      .select("user_id", "session_start_ms", "session_end_ms", "n_events", "value_avg")
    assert(native.exceptAll(islands).count() === 0)
    assert(islands.exceptAll(native).count() === 0)
  }

  test("sessions tile the event stream: counts sum up, no per-user overlap") {
    val out = Sessions.sessionWindows(spark, sfDir).cache()
    val total = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase").count()
    assert(out.agg(sum("n_events")).collect().head.getLong(0) === total)
    val w = Window.partitionBy("user_id").orderBy("session_start_ms")
    val overlaps = out
      .withColumn("prev_end", lag("session_end_ms", 1).over(w))
      .where(col("prev_end").isNotNull && col("session_start_ms") < col("prev_end"))
    assert(overlaps.count() === 0)
    out.unpersist()
  }

  test("canonical keeper: best source rank in its cluster, tie-broken by doc_id") {
    import spark.implicits._
    // synthetic corpus: cluster A spans src3/src1/src1 (keeper = lower
    // doc_id at rank 1), cluster B is rank-tied (keeper = min doc_id),
    // doc 6 is a singleton and must not appear
    val docs = Seq(
      (1L, "aaa", "src3"), (2L, "aaa", "src1"), (3L, "aaa", "src1"),
      (4L, "bbb", "src7"), (5L, "bbb", "src7"),
      (6L, "ccc", "src2")
    ).toDF("doc_id", "text", "source")
    val out = Canonical.canonicalOf(docs).collect()
      .map(r => (r.getAs[Long]("keeper_id"), r.getAs[String]("keeper_source"),
        r.getAs[Long]("best_rank"), r.getAs[Long]("n_docs"))).toSet
    assert(out === Set((2L, "src1", 1L, 3L), (4L, "src7", 7L, 2L)))
  }

  test("canonical on the real corpus: every keeper carries its cluster's best rank") {
    // the seeded mirror-site union guarantees clusters at every SF
    // (round-13 de-vacuation), so this is never a vacuous invariant
    val out = Canonical.canonicalDedup(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.where(
      regexp_extract(col("keeper_source"), "(\\d+)", 1).cast("long") =!= col("best_rank"))
      .count() === 0)
    // the mirror slice CAN win the keeper pick: at least one keeper is
    // a seeded doc (rank src0..src6 beats most base sources)
    assert(out.where(col("keeper_id") >= (1L << 40)).count() > 0)
    out.unpersist()
  }
}
