package graft

import org.apache.spark.sql.functions._

/** Streaming Schmitt trigger: trigger-at-a-time with a per-user
  * carried state must reproduce the batch threshold band exactly.
  */
class BandStreamSpec extends SparkSpec {

  test("drained stream equals the batch threshold band bit-for-bit") {
    val streamed = graft.streaming.BandStream.streamThresholdBand(spark, sfDir).collect()
    val batch = graft.operators.Sessions.thresholdBand(spark, sfDir).collect()
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    assert(streamed.nonEmpty)
  }

  test("the cross-trigger seam is actually exercised by the data") {
    // recompute the slice bounds Slices.stage used (thirds of the
    // archive-time range) and require some user to transition in more
    // than one slice — i.e. at least one emitted transition depended
    // on state carried across a trigger boundary
    val ev = Tables.events(spark, sfDir).where(col("event_type") === "error")
    val b = ev.agg(min("ts_ms"), max("ts_ms")).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val w = (hi - lo) / 3 + 1
    val trans = graft.operators.Sessions.thresholdBand(spark, sfDir)
      .withColumn("slice", ((col("ts_ms") - lo) / w).cast("int"))
    val multiSlice = trans.groupBy("user_id")
      .agg(countDistinct("slice").as("n_slices"))
      .where(col("n_slices") > 1).count()
    assert(multiSlice > 0, "no user transitions span a trigger boundary — seam untested")
  }
}
