package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming operators: the reference's live pipeline re-
  * expressed as streams — tier rollup as a windowed aggregation and
  * threshold automation as a stateful per-key operator
  * (flatMapGroupsWithState), the streaming-native form of the
  * reference's threshold monitors (index.ts).
  *
  * Both run here with the file source + Trigger.AvailableNow so the
  * driver can validate results against the batch oracle; in production
  * the same code runs against a live source with watermarks bounding
  * state.
  */
object Streaming {

  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts_ms", expr("ts div 1000000"))
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
  }

  private def tmpCheckpoint(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_ckpt_$tag")
    d.toString
  }

  private val runCounter = new java.util.concurrent.atomic.AtomicLong()

  private def uniqueName(tag: String): String =
    s"graft_${tag}_${runCounter.incrementAndGet()}"


  private val bucketTable = new java.util.concurrent.atomic.AtomicReference[String]()
  private val thresholdTable = new java.util.concurrent.atomic.AtomicReference[String]()

  // --------------------------------------------------------------- #41
  /** Streaming tier rollup: 1 h windowed avg/min/max/count per path.
    * Complete-mode memory sink for the verify round-trip; with a live
    * source this runs append-mode behind the 10 min watermark. */
  def streamBucketAgg(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(spark, dir)
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(
        (sum(col("value").cast(DecimalType(18, 6))).cast("double") / count(col("value"))).as("value_avg"),
        min("value").as("value_min"),
        max("value").as("value_max"),
        count(lit(1)).as("sample_count"))
    val q = agg
      .select(unix_millis(col("window.start")).as("bucket_ms"), col("event_type"),
        col("value_avg"), col("value_min"), col("value_max"), col("sample_count"))
      .writeStream
      .format("memory").queryName({ val n = uniqueName("stream_bucket"); bucketTable.set(n); n })
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", tmpCheckpoint("bucket"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(bucketTable.get()).orderBy("event_type", "bucket_ms")
  }

  val streamBucketAggOracle: String =
    """SELECT CAST(FLOOR(epoch_ms(ts) / 3600000) * 3600000 AS BIGINT) AS bucket_ms,
      |  event_type,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS value_avg,
      |  MIN(value) AS value_min, MAX(value) AS value_max,
      |  COUNT(*) AS sample_count
      |FROM events GROUP BY 1, 2 ORDER BY event_type, bucket_ms""".stripMargin

  // --------------------------------------------------------------- #42
  case class ThresholdEvent(user_id: Long, ts_ms: Long, value: Double)
  case class ThresholdState(lastFireMs: Long)
  case class Fire(user_id: Long, fire_ms: Long)

  /** Stateful threshold automation: fire when value > 120, suppress
    * re-fires for 12 h (hysteresis), state = last fire time per user —
    * the streaming form of Sessions.thresholdHysteresis. Events are
    * sorted within each invocation; state carries across batches. */
  def thresholdFlow(events: Dataset[ThresholdEvent]): Dataset[Fire] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[ThresholdState, Fire](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[ThresholdEvent], state: GroupState[ThresholdState]) =>
          var last = state.getOption.map(_.lastFireMs).getOrElse(Long.MinValue / 4)
          val fires = scala.collection.mutable.ArrayBuffer[Fire]()
          it.toSeq.sortBy(e => (e.ts_ms, e.value)).foreach { e =>
            if (e.value > 120.0 && e.ts_ms >= last + 43200000L) {
              fires += Fire(user, e.ts_ms)
              last = e.ts_ms
            }
          }
          state.update(ThresholdState(last))
          fires.iterator
      }
  }

  def streamThreshold(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = eventStream(spark, dir)
      .where(col("event_type") === "error")
      .select(col("user_id"), col("ts_ms"), col("value"))
      .as[ThresholdEvent]
    val q = thresholdFlow(src).toDF()
      .writeStream
      .format("memory").queryName({ val n = uniqueName("stream_threshold"); thresholdTable.set(n); n })
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmpCheckpoint("threshold"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(thresholdTable.get()).orderBy("user_id", "fire_ms")
  }

  val streamThresholdOracle: String =
    """WITH RECURSIVE cond AS (
      |  SELECT user_id, epoch_ms(ts) AS ts_ms FROM events
      |  WHERE event_type = 'error' AND value > 120.0
      |), fires AS (
      |  SELECT user_id, MIN(ts_ms) AS fire_ms FROM cond GROUP BY user_id
      |  UNION ALL
      |  SELECT f.user_id,
      |    (SELECT MIN(c.ts_ms) FROM cond c WHERE c.user_id = f.user_id AND c.ts_ms >= f.fire_ms + 43200000)
      |  FROM fires f
      |  WHERE (SELECT MIN(c.ts_ms) FROM cond c WHERE c.user_id = f.user_id AND c.ts_ms >= f.fire_ms + 43200000) IS NOT NULL
      |)
      |SELECT user_id, fire_ms FROM fires ORDER BY user_id, fire_ms""".stripMargin

  private val dedupTable = new java.util.concurrent.atomic.AtomicReference[String]()

  // --------------------------------------------------------------- #43
  /** Streaming dedup: collapse each series' 5-min burst to one row —
    * `dropDuplicates` on (series, bucket) with the watermark bounding
    * the dedup state (expired buckets are evicted, so state is
    * O(active keys), not O(stream)). Which row of a burst survives is
    * racy under parallel read, so the verified output is the
    * deterministic part: the per-series count of distinct buckets. */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val deduped = eventStream(spark, dir)
      .withColumn("bucket_ms",
        (floor(col("ts_ms") / lit(300000L)).cast("long") * lit(300000L)))
      .withWatermark("event_time", "10 minutes")
      .dropDuplicates("user_id", "event_type", "bucket_ms")
      .select("user_id", "event_type", "bucket_ms")
    val q = deduped.writeStream
      .format("memory").queryName({ val n = uniqueName("stream_dedup"); dedupTable.set(n); n })
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", tmpCheckpoint("dedup"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(dedupTable.get())
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_unique_buckets"))
      .orderBy("user_id", "event_type")
  }

  val streamDedupOracle: String =
    """SELECT user_id, event_type,
      |  COUNT(DISTINCT CAST(FLOOR(epoch_ms(ts) / 300000) * 300000 AS BIGINT)) AS n_unique_buckets
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_bucket_agg" -> (streamBucketAgg _),
    "stream_threshold" -> (streamThreshold _),
    "stream_dedup" -> (streamDedup _))

  val oracles: Map[String, String] = Map(
    "stream_bucket_agg" -> streamBucketAggOracle,
    "stream_threshold" -> streamThresholdOracle,
    "stream_dedup" -> streamDedupOracle)
}
