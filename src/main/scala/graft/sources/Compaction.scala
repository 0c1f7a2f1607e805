package graft.sources

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the reference's compaction service
  * (compaction-service.ts:1-30: merge the per-day parquet files of a
  * (tier, context, path, year) group into one consolidated file, sorted
  * by timestamp, published atomically; data-handler.ts:870's earlier
  * consolidateMissedDays did the same at day granularity).
  *
  * Spark-native re-expression: instead of the reference's sequential
  * per-group loop (glob → DuckDB COPY → rename, one group at a time),
  * compaction here is ONE distributed job over every group at once:
  *
  *   - the day-partition predicate prunes the live-store scan to the
  *     cold days only (no full-store read),
  *   - `repartition(keys)` gives each output group exactly one writing
  *     task (no tasks×partitions file explosion),
  *   - `sortWithinPartitions(keys, ts)` preserves the reference's
  *     sorted-by-timestamp file invariant AND gives parquet tight
  *     row-group min/max stats on the time column — the stats that
  *     make post-compaction time-range scans skip row groups,
  *   - `maxRecordsPerFile` bounds file size at scale (a year of a hot
  *     path may exceed one sane file; the reference's single-file-per-
  *     year rule does not survive 100 TB),
  *   - the archive is written to a temp root and atomically renamed
  *     into place BEFORE any source deletion, and the read path
  *     resolves the overlap by construction (see [[compactedRead]]) —
  *     so a crash at any point never loses or double-counts a row.
  *
  * The compacted archive is a separate hive root partitioned by
  * (tier, context, path, year) — the `day=` level is folded back into
  * the data (recoverable from ts_ms), which is exactly the reference's
  * post-compaction state ("day becomes NULL for compacted years",
  * compaction-service.ts:22-27). Keeping hot day-files and cold year-
  * files under different roots is the Spark-idiomatic equivalent of
  * the reference's mixed-depth directory tree (Spark's partition
  * discovery rejects mixed depths; DuckDB's glob tolerates them).
  */
object Compaction {

  /** Fold every day-partition strictly before `cutoffDay` (day-of-year,
    * zero-padded string as in the store layout) into the per-year
    * archive, then drop the folded day directories from the live store.
    * Crash-safe ordering: archive commit (atomic rename) happens before
    * any source delete. */
  def compactDays(spark: SparkSession, liveDir: String, archiveDir: String,
      cutoffDay: String, maxRecordsPerFile: Long = 4000000L): Unit = {
    val live = HiveStore.withConf(spark,
      "spark.sql.sources.partitionColumnTypeInference.enabled", "false") {
      HiveStore.read(spark, liveDir)
    }
    // Partition-column predicate → directory pruning: only cold day
    // dirs are ever opened.
    val cold = live.where(col("day") < cutoffDay).drop("day")
    val keys = Seq("tier", "context", "path", "year")
    val tmp = archiveDir + "_compacting"
    cold
      .repartition(32, keys.map(col): _*)
      .sortWithinPartitions((keys.map(col) :+ col("ts_ms")): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(keys: _*)
      .parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(archiveDir), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(archiveDir))
    // Source cleanup — only after the archive is published.
    for (d <- fs.globStatus(new org.apache.hadoop.fs.Path(
        liveDir, "tier=*/context=*/path=*/year=*/day=*"))
        if d.getPath.getName.stripPrefix("day=") < cutoffDay) {
      fs.delete(d.getPath, true)
    }
  }

  /** Unified read over (live ∪ archive) with the cutoff as the
    * precedence rule: days < cutoff come from the archive, days ≥
    * cutoff from the live store. Because precedence is decided by the
    * same predicate compaction used, the result is identical before,
    * during, and after the live-store cleanup — reads stay correct
    * even if compaction crashed between archive publish and source
    * delete. Both scans stay partition-pruned; no shuffle is added. */
  def compactedRead(spark: SparkSession, liveDir: String, archiveDir: String,
      cutoffDay: String): DataFrame = {
    val (live, archive) = HiveStore.withConf(spark,
      "spark.sql.sources.partitionColumnTypeInference.enabled", "false") {
      (HiveStore.read(spark, liveDir), HiveStore.read(spark, archiveDir))
    }
    val dayOf = lpad(dayofyear(timestamp_millis(col("ts_ms"))).cast("string"), 3, "0")
    live.where(col("day") >= cutoffDay).drop("day")
      .withColumn("src", lit("live"))
      .unionByName(archive.where(dayOf < cutoffDay).withColumn("src", lit("archive")))
  }

  // --------------------------------------------------------------- #52
  /** Round-trip: events slice → day-partitioned live store → cold days
    * folded into the per-year archive → unified read-back aggregated
    * per (context, path, year). `n_archived` pins the compaction
    * boundary; `n_days`/`value_avg` prove no row was lost, duplicated,
    * or altered by the layout change. The oracle recomputes everything
    * from raw events. File-count/sort invariants are spec-asserted
    * (CompactionSpec) — they are filesystem facts, not SQL. */
  def skCompaction(spark: SparkSession, dir: String): DataFrame = {
    val slice = Tables.events(spark, dir)
      .where(col("event_type") === "purchase" && col("user_id") < 6)
      .withColumn("tier", lit("raw"))
      .withColumn("context", concat(lit("vessels__urn-"), col("user_id")))
      .withColumn("path", col("event_type"))
      .withColumn("ts2", timestamp_millis(col("ts_ms")))
      .withColumn("year", year(col("ts2")))
      .withColumn("day", lpad(dayofyear(col("ts2")).cast("string"), 3, "0"))
      .drop("ts2")
    val (live, archive) = (HiveStore.scratchDir(), HiveStore.scratchDir())
    HiveStore.write(slice, live)
    compactDays(spark, live, archive, cutoffDay = "016")
    compactedRead(spark, live, archive, cutoffDay = "016")
      .groupBy("context", "path", "year")
      .agg(
        count(lit(1)).as("n_records"),
        countDistinct(dayofyear(timestamp_millis(col("ts_ms")))).as("n_days"),
        sum(when(col("src") === "archive", 1L).otherwise(0L)).as("n_archived"),
        r6(davg(col("value"))).as("value_avg"))
      .withColumn("year", col("year").cast("int"))
      .orderBy("context")
  }

  val compactionOracle: String =
    """SELECT 'vessels__urn-' || CAST(user_id AS VARCHAR) AS context,
      |  event_type AS path, CAST(year(ts) AS INT) AS year,
      |  COUNT(*) AS n_records,
      |  COUNT(DISTINCT dayofyear(ts)) AS n_days,
      |  CAST(SUM(CASE WHEN dayofyear(ts) < 16 THEN 1 ELSE 0 END) AS BIGINT) AS n_archived,
      |  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 6) AS value_avg
      |FROM events WHERE event_type = 'purchase' AND user_id < 6
      |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_compaction" -> (skCompaction _))

  val oracles: Map[String, String] = Map(
    "sk_compaction" -> compactionOracle)
}
