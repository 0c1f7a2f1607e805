package graft

import graft.streaming.LateData
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Watermark late-data semantics (streaming/LateData.scala): the
  * streamed result must equal an independent batch recomputation of
  * the same watermark bookkeeping, and the two watermark effects
  * (late drop, append withholding) must each be visible. */
class LateDataSpec extends SparkSpec {

  private val startMs = 1704412800000L // 2024-01-05
  private val sliceMs = 3L * 24 * 3600 * 1000
  private val delayMs = 259200000L // 72 h
  private val winMs = 7200000L // 2 h

  /** Batch model of the stream, with Spark's two-watermark split
    * (SPARK-24634): late events are filtered with the PREVIOUS
    * watermark (max event time through positions ≤ p−2, minus delay);
    * windows are emitted when the final eviction watermark passes
    * their end. */
  private def model: DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .where(col("ts_ms") >= startMs && col("ts_ms") < startMs + 5 * sliceMs)
      .select(col("ts_ms").as("t"), col("event_type"), col("value"))
      .withColumn("slice", ((col("t") - startMs) / sliceMs).cast("long"))
      .withColumn("p", expr("CASE slice WHEN 0 THEN 0 WHEN 2 THEN 1 WHEN 3 THEN 2 WHEN 1 THEN 3 ELSE 4 END"))
    val wm = ev.groupBy("p").agg(max("t").as("mx"))
      .withColumn("wm_late", max("mx").over(
        Window.orderBy("p").rowsBetween(Window.unboundedPreceding, -2)) - delayMs)
    val finalWm = ev.agg(max("t")).collect().head.getLong(0) - delayMs
    ev.join(wm.select("p", "wm_late"), "p")
      .withColumn("wend", (floor(col("t") / winMs) + 1) * winMs)
      .where(col("wm_late").isNull || col("wend") > col("wm_late"))
      .where(col("wend") <= finalWm)
      .groupBy((col("wend") - winMs).as("bucket_ms"), col("event_type"))
      .agg(
        (sum(col("value").cast(DecimalType(18, 6))).cast("double") /
          count(col("value"))).as("value_avg"),
        count(lit(1)).as("sample_count"))
  }

  test("streamed result equals the batch watermark model exactly") {
    val streamed = LateData.streamLateData(spark, sfDir)
      .select("bucket_ms", "event_type", "value_avg", "sample_count")
    val expected = model.select("bucket_ms", "event_type", "value_avg", "sample_count")
    assert(streamed.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(streamed).count() === 0)
  }

  test("late drop: the two-positions-late slice contributes only its final window") {
    val out = LateData.streamLateData(spark, sfDir)
    // archive slice 1 covers days 3..6 → buckets in [start+3d, start+6d);
    // arriving at position 3, its late-events watermark is
    // max(slices 0, 2) − 72 h ≈ day 6 − ε
    val lateLo = startMs + sliceMs
    val lateHi = startMs + 2 * sliceMs
    val lateBuckets = out
      .where(col("bucket_ms") >= lateLo && col("bucket_ms") < lateHi)
      .select("bucket_ms").distinct().collect().map(_.getLong(0))
    // only the last 2 h window (end = day 6 boundary) beats that filter
    assert(lateBuckets.toSet === Set(lateHi - winMs))
  }

  test("append withholding: no window within the 72 h delay of stream max is emitted") {
    val out = LateData.streamLateData(spark, sfDir)
    val maxT = Tables.events(spark, sfDir)
      .where(col("ts_ms") >= startMs && col("ts_ms") < startMs + 5 * sliceMs)
      .agg(max("ts_ms")).collect().head.getLong(0)
    assert(out.where(col("bucket_ms") + winMs > maxT - delayMs).count() === 0)
    // ...but data does exist there (the withholding is the stream's doing)
    assert(Tables.events(spark, sfDir)
      .where(col("ts_ms") >= maxT - delayMs && col("ts_ms") < startMs + 5 * sliceMs)
      .count() > 0)
  }

  test("no duplicate emission: (bucket, type) appears once") {
    val out = LateData.streamLateData(spark, sfDir)
    assert(out.groupBy("bucket_ms", "event_type").count()
      .where(col("count") > 1).count() === 0)
  }
}
