package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Live transition-matrix maintenance — the streaming twin of
  * [[graft.operators.Markov.transitionMatrix]]: the empirical
  * P(to|from) kept current as events arrive, the way a live anomaly
  * scorer consumes it (reference analog: the command state machine
  * watched continuously, commands.ts, generalized to data).
  *
  * Shape: per-user LAG is the one window a time-sliced stream CAN'T
  * compute per batch — the first event of a batch pairs with the last
  * event of the PREVIOUS batch. So the state is exactly that seam: a
  * per-user LAST-EVENT store (one row per user — the
  * `streamLastTimestamps` idea from historical-streaming.ts:693
  * applied per key) unioned into each batch as a carry-in before the
  * batch's own LAG window, plus an O(types²) transition-count store
  * the per-batch pair counts ADD into (integer adds — associative, so
  * trigger-at-a-time ≡ one-shot over the concatenated slices and the
  * BATCH oracle carries over verbatim). Both stores swap atomically
  * per trigger (the tier-maintenance discipline). At 100 TB/day the
  * carry-in store is user-count-sized and the count store stays
  * types², independent of throughput — the corpus is never rescanned.
  *
  * Slices are consecutive archive-TIME ranges (one file per trigger
  * via [[Slices.stage]], keeping event_id for the deterministic
  * same-ms tiebreak), so each user's carry-in always sorts strictly
  * before the batch's own rows.
  */
object MarkovStream {

  private val tableRef = new java.util.concurrent.atomic.AtomicReference[String]()

  // --------------------------------------------------------------- #74
  def streamTransitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val sch = graft.Tables.events(spark, dir)
      .select("user_id", "ts_ms", "event_id", "event_type").schema
    val ev = graft.Tables.events(spark, dir)
      .select("user_id", "ts_ms", "event_id", "event_type")
    val srcDir = Slices.stage(ev, "markov", 3)
    val base = java.nio.file.Files.createTempDirectory("graft_markov_store").toString
    val lastStore = base + "/last"; val countStore = base + "/counts"
    ev.limit(0).write.parquet(lastStore)
    ev.limit(0).select(col("event_type").as("from_type"),
      col("event_type").as("to_type"), col("event_id").as("n"))
      .write.parquet(countStore)
    val fs = graft.util.Fs.of(spark, base)
    def swap(tmp: String, dst: String): Unit = {
      fs.delete(new org.apache.hadoop.fs.Path(dst), true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(dst))
    }
    val q = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val carry = sp.read.parquet(lastStore)
        // carry-in rows sort strictly first per user (slice time
        // ranges are disjoint), so their own lag stays null and the
        // batch's first event pairs with them — the cross-trigger seam
        val u = carry.unionByName(batch.localCheckpoint())
        val ww = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
        val pairs = u.withColumn("from_type", lag(col("event_type"), 1).over(ww))
          .where(col("from_type").isNotNull)
          .groupBy(col("from_type"), col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val mergedCounts = sp.read.parquet(countStore)
          .unionByName(pairs)
          .groupBy("from_type", "to_type").agg(sum("n").as("n"))
        val cTmp = countStore + "_next"
        mergedCounts.coalesce(1).write.mode("overwrite").parquet(cTmp)
        val newLast = u
          .groupBy("user_id")
          .agg(max_by(struct(col("ts_ms"), col("event_id"), col("event_type")),
            struct(col("ts_ms"), col("event_id"))).as("m"))
          .select(col("user_id"), col("m.ts_ms"), col("m.event_id"), col("m.event_type"))
        val lTmp = lastStore + "_next"
        newLast.coalesce(1).write.mode("overwrite").parquet(lTmp)
        swap(cTmp, countStore); swap(lTmp, lastStore)
        ()
      }
      .option("checkpointLocation", {
        val d = java.nio.file.Files.createTempDirectory("graft_ckpt_markov")
        tableRef.set(d.toString); d.toString
      })
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val perFrom = Window.partitionBy("from_type")
    spark.read.parquet(countStore)
      .withColumn("p", graft.funcs.r6(col("n") / sum(col("n")).over(perFrom)))
      .orderBy("from_type", "to_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_transition_matrix" -> (streamTransitionMatrix _))

  val oracles: Map[String, String] = Map(
    // integer count adds are associative over the time-sliced
    // partition of the corpus, so the batch oracle carries verbatim
    "stream_transition_matrix" -> graft.operators.Markov.transitionMatrixOracle)
}
