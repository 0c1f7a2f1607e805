package graft.streaming

import graft.operators.Funnel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Live funnel maintenance — the streaming twin of
  * [[graft.operators.Funnel.funnel]]: per-stage conversion kept
  * current as events arrive.
  *
  * Why it streams exactly: with TIME-ordered slices, each user's
  * stage minima are monotone — t1 is fixed the moment the first view
  * arrives (later events have larger ts), a click can only qualify
  * (ts ≥ t1) in the first-view batch or later, so evaluating each
  * batch against carried state reproduces the one-shot qualification
  * of every event. The state is the per-user ARGMIN EVENT ROWS
  * themselves (first view, first qualifying click, first qualifying
  * purchase — ≤ 3 rows per converting user): a non-chosen event can
  * never become a stage minimum later, so carrying only the chosen
  * rows is lossless, and each trigger simply reruns the batch
  * operator's chained-window core over state ∪ batch. Store swaps
  * atomically per trigger (tier-maintenance discipline); the final
  * drain reuses the BATCH oracle verbatim. At 100 TB/day the state is
  * ≤ 3 rows per user — user-count-bounded like the
  * [[MarkovStream]] carry-in, never throughput-bounded.
  */
object FunnelStream {

  // --------------------------------------------------------------- #79
  def streamFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select("user_id", "event_type", "ts_ms", "value")
    val srcDir = Slices.stage(ev, "funnel", 3)
    val store = java.nio.file.Files.createTempDirectory("graft_funnel_store").toString + "/state"
    ev.limit(0).write.parquet(store)
    val fs = graft.util.Fs.of(spark, store)
    def staged(u: DataFrame): DataFrame = {
      val w = Window.partitionBy("user_id")
      u.withColumn("t1", min(when(col("event_type") === "view", col("ts_ms"))).over(w))
        .withColumn("t2", min(when(col("event_type") === "click" &&
          col("value") > 120.0 && col("ts_ms") >= col("t1"), col("ts_ms"))).over(w))
        .withColumn("t3", min(when(col("event_type") === "purchase" &&
          col("value") > 150.0 && col("ts_ms") >= col("t2"), col("ts_ms"))).over(w))
    }
    val q = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val st = staged(sp.read.parquet(store).unionByName(batch.localCheckpoint()))
        // keep only the argmin event rows — the lossless funnel state
        val next = st.where(
            (col("event_type") === "view" && col("ts_ms") === col("t1")) ||
            (col("event_type") === "click" && col("value") > 120.0 &&
              col("ts_ms") === col("t2")) ||
            (col("event_type") === "purchase" && col("value") > 150.0 &&
              col("ts_ms") === col("t3")))
          .select("user_id", "event_type", "ts_ms", "value")
        val tmp = store + "_next"
        next.coalesce(1).write.mode("overwrite").parquet(tmp)
        fs.delete(new org.apache.hadoop.fs.Path(store), true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(store))
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ckpt_funnel").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // drain: the batch operator's roll-up over the argmin state rows
    val perUser = staged(spark.read.parquet(store))
      .groupBy("user_id")
      .agg(min("t1").as("t1"), min("t2").as("t2"), min("t3").as("t3"))
    perUser.agg(
        count(col("t1")).as("n_view"),
        count(col("t2")).as("n_click_after_view"),
        count(col("t3")).as("n_purchase_after_click"))
      .select(col("n_view"), col("n_click_after_view"),
        col("n_purchase_after_click"),
        graft.funcs.r6(col("n_click_after_view").cast("double") / col("n_view")).as("conv_click"),
        graft.funcs.r6(col("n_purchase_after_click").cast("double") / col("n_view")).as("conv_purchase"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_funnel" -> (streamFunnel _))

  val oracles: Map[String, String] = Map(
    // monotone stage minima over time-ordered slices ≡ one-shot funnel
    "stream_funnel" -> Funnel.funnelOracle)
}
