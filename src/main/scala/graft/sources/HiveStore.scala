package graft.sources

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-partitioned store mirroring the reference's layout
  * (`tier=…/context=…/path=…/year=YYYY/day=DDD/`, hive-path-builder.ts)
  * via Spark's native partitioned parquet — partition pruning on any
  * prefix of (tier, context, path, year, day) is then free, exactly
  * the property the reference's time/path-ranged queries rely on.
  */
object HiveStore {

  /** Sanitize a context/path value for use as a partition directory —
    * mirrors hive-path-builder.ts (`.`→`__`, `:`→`-`). */
  def sanitize(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(c, "\\.", "__"), ":", "-")

  /** Write records into the reference layout. Expects columns
    * `tier, context, path, year, day` plus payload.
    *
    * The repartition on the partition keys is load-bearing: without
    * it every input task opens a writer per output partition
    * (tasks × partitions file handles — the classic dynamic-partition
    * small-file explosion); with it each output directory is written
    * by exactly one task. */
  def write(df: DataFrame, dir: String): Unit =
    // Explicit partition count: AQE would otherwise coalesce the tiny
    // pre-write shuffle to a handful of tasks and serialize the
    // (per-file) filesystem calls.
    df.repartition(32, col("context"), col("path"), col("day"))
      .write.mode("overwrite")
      .partitionBy("tier", "context", "path", "year", "day")
      .parquet(dir)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Compaction (compaction-service.ts analog): rewrite each hive
    * partition's small files into one file per partition. Same layout,
    * same rows, ~1 file per (tier, context, path, year, day).
    *
    * Publish is rename-aside (dir → dir_precompact, tmp → dir, drop
    * aside), never delete-then-rename: the source stays on disk until
    * the rewrite is in place, and a crash inside the two-rename window
    * is repaired by the recovery step at the head of the next run. */
  def compact(spark: SparkSession, dir: String): Unit = {
    val fs = graft.util.Fs.of(spark, dir)
    val (root, aside, tmp) = (new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "_precompact"),
      new org.apache.hadoop.fs.Path(dir + "_compacting"))
    // Recovery: a previous run crashed between its two renames.
    if (!fs.exists(root) && fs.exists(aside)) fs.rename(aside, root)
    fs.delete(aside, true)
    fs.delete(tmp, true)
    val df = read(spark, dir)
    df.repartition(32, col("tier"), col("context"), col("path"), col("year"), col("day"))
      .sortWithinPartitions("tier", "context", "path", "year", "day")
      .write.mode("overwrite")
      .partitionBy("tier", "context", "path", "year", "day")
      .parquet(tmp.toString)
    fs.rename(root, aside)
    fs.rename(tmp, root)
    fs.delete(aside, true)
  }

  /** Retention sweep — aggregation-service.ts:cleanupOldData: delete
    * partitions whose day is older than the per-tier retention,
    * comparing at day granularity (midnight UTC) so a 1-day retention
    * never deletes yesterday mid-afternoon. Returns deleted partition
    * paths. */
  def retentionSweep(spark: SparkSession, dir: String,
      retentionDays: Map[String, Int], nowMs: Long): Seq[String] = {
    val fs = graft.util.Fs.of(spark, dir)
    val base = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(base)) return Seq.empty
    val midnight = nowMs - Math.floorMod(nowMs, 86400000L)
    val deleted = scala.collection.mutable.ArrayBuffer[String]()
    for (tierDir <- fs.listStatus(base) if tierDir.isDirectory) {
      val tier = tierDir.getPath.getName.stripPrefix("tier=")
      retentionDays.get(tier).filter(_ > 0).foreach { days =>
        val cutoff = midnight - days.toLong * 86400000L
        val dayDirs = fs.globStatus(new org.apache.hadoop.fs.Path(
          tierDir.getPath, "context=*/path=*/year=*/day=*"))
        for (d <- dayDirs) {
          val year = d.getPath.getParent.getName.stripPrefix("year=").toInt
          val day = d.getPath.getName.stripPrefix("day=").toInt
          val dayStart = java.time.LocalDate.ofYearDay(year, day)
            .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
          if (dayStart < cutoff) {
            fs.delete(d.getPath, true)
            deleted += d.getPath.toString
          }
        }
      }
    }
    deleted.toSeq
  }

  // --------------------------------------------------------------- #28
  /** Round-trip: events → hive layout → pruned read-back of one path
    * partition, counted per (path, year, day). The oracle counts the
    * same slice relationally; the Spark side proves layout + pruning
    * (the read filter hits only `path=click` directories). */
  /** Run `body` with a session conf set, restoring the previous value
    * (or unsetting) afterwards — keeps demo queries from permanently
    * mutating shared session state. */
  private[sources] def withConf[A](spark: SparkSession, key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Unique per-run scratch dir (concurrent Verify/Bench runs on one
    * machine must not race on a shared path), deleted on JVM exit. */
  private[graft] def scratchDir(): String = {
    val p = java.nio.file.Files.createTempDirectory("graft_hive_store_")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(p.toFile)
    }
    p.toString
  }

  def hiveWrite(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchDir()
    // The round-trip writes the slice the pruned read-back checks
    // (path=click): full layout fidelity, bounded file count — local
    // FS metadata calls shell out when the hadoop native lib is absent,
    // so file count, not bytes, dominates this demo's cost.
    val df = Tables.events(spark, dir)
      .where(col("event_type") === "click" && col("user_id") < 8)
      .withColumn("tier", lit("raw"))
      .withColumn("context", concat(lit("vessels__urn-"), col("user_id")))
      .withColumn("path", col("event_type"))
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withColumn("year", year(col("ts")))
      .withColumn("day", lpad(dayofyear(col("ts")).cast("string"), 3, "0"))
      .drop("ts")
    write(df, out)
    // Partition values stay strings on read-back (day "003" must not be
    // inferred back to int 3); conf is scoped to the eager file-index /
    // schema-inference step and restored immediately.
    val readBack = withConf(spark,
      "spark.sql.sources.partitionColumnTypeInference.enabled", "false") {
      read(spark, out)
    }
    readBack
      .where(col("tier") === "raw" && col("path") === "click")
      .groupBy("path", "year", "day")
      .agg(count(lit(1)).as("n_records"))
      .withColumn("year", col("year").cast("int"))
      .withColumn("day", col("day").cast("string"))
      .orderBy("path", "year", "day")
  }

  val hiveWriteOracle: String =
    """SELECT event_type AS path,
      |  CAST(year(ts) AS INT) AS year,
      |  lpad(CAST(dayofyear(ts) AS VARCHAR), 3, '0') AS day,
      |  COUNT(*) AS n_records
      |FROM events WHERE event_type = 'click' AND user_id < 8
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ------------------------------------------------------ backup sync
  /** Incremental backup sync — the write side of the reference's cloud
    * archive (README "Cloud Integration", utils/cloud-endpoint.ts):
    * copy to the archive exactly the hive partitions it does not hold
    * yet. The partition diff is a broadcast anti-join of the primary's
    * partition tuples against the archive's (metadata-sized both
    * sides); only the missing partitions' data is then scanned —
    * partition pruning makes a nightly 100 TB sync cost one listing
    * plus the new day's bytes. Append-only, so a re-run after a crash
    * copies nothing twice (same idempotence contract as
    * [[Migration.migrate]]). */
  def backupSync(spark: SparkSession, primary: String, archive: String): Long = {
    val keys = Seq("tier", "context", "path", "year", "day")
    val fs = graft.util.Fs.of(spark, archive)
    val archivePath = new org.apache.hadoop.fs.Path(archive)
    val archiveHasData = fs.exists(archivePath) &&
      fs.listStatus(archivePath).exists(_.getPath.getName.startsWith("tier="))
    val p = withConf(spark,
      "spark.sql.sources.partitionColumnTypeInference.enabled", "false") {
      read(spark, primary)
    }
    val missing =
      if (archiveHasData) {
        val have = withConf(spark,
          "spark.sql.sources.partitionColumnTypeInference.enabled", "false") {
          read(spark, archive)
        }.select(keys.map(col): _*).distinct()
        p.join(broadcast(have), keys, "left_anti")
      } else p
    val staged = missing.localCheckpoint(false)
    val copied = staged.count()
    if (copied > 0)
      staged.repartition(32, col("context"), col("path"), col("day"))
        .write.mode("append").partitionBy(keys: _*).parquet(archive)
    copied
  }

  /** Round-trip: primary holds users < 6; the archive already holds a
    * stale backup of users < 2 (value+1000 marks it). One sync copies
    * ONLY the missing partitions (stale data stays untouched — backup
    * never rewrites); a second sync copies nothing. The read-back
    * proves both via per-context counts and the stale marker. */
  def skBackupSync(spark: SparkSession, dir: String): DataFrame = {
    def slice(maxUser: Int, shift: Double) =
      Tables.events(spark, dir)
        .where(col("event_type") === "signup" && col("user_id") < maxUser)
        .withColumn("value", col("value") + shift)
        .withColumn("tier", lit("raw"))
        .withColumn("context", concat(lit("vessels__urn-"), col("user_id")))
        .withColumn("path", col("event_type"))
        .withColumn("ts2", timestamp_millis(col("ts_ms")))
        .withColumn("year", year(col("ts2")))
        .withColumn("day", lpad(dayofyear(col("ts2")).cast("string"), 3, "0"))
        .drop("ts2")
    val (primary, archive) = (scratchDir(), scratchDir())
    write(slice(6, 0.0), primary)
    write(slice(2, 1000.0), archive)
    val first = backupSync(spark, primary, archive)
    val second = backupSync(spark, primary, archive)
    require(second == 0L, s"re-sync must copy nothing, copied $second")
    withConf(spark,
      "spark.sql.sources.partitionColumnTypeInference.enabled", "false") {
      read(spark, archive)
    }
      .groupBy("context")
      .agg(count(lit(1)).as("n_records"),
        sum(when(col("value") >= 1000.0, 1L).otherwise(0L)).as("n_stale"))
      .withColumn("first_sync_copied", lit(first > 0))
      .orderBy("context")
  }

  val backupSyncOracle: String =
    """SELECT 'vessels__urn-' || CAST(user_id AS VARCHAR) AS context,
      |  COUNT(*) AS n_records,
      |  CAST(SUM(CASE WHEN user_id < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_stale,
      |  TRUE AS first_sync_copied
      |FROM events WHERE event_type = 'signup' AND user_id < 6
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------- retention sweep
  /** Round-trip for [[retentionSweep]] (aggregation-service.ts
    * cleanupOldData): write a slice into the layout, sweep with a
    * fixed "now" (2024-01-31 UTC) and a 10-day raw-tier retention —
    * day dirs whose UTC midnight is older than Jan 21 are deleted at
    * partition granularity — then count what survived. The oracle
    * applies the same day-of-year cutoff relationally. */
  def skRetention(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchDir()
    val df = Tables.events(spark, dir)
      .where(col("event_type") === "click" && col("user_id") < 4)
      .withColumn("tier", lit("raw"))
      .withColumn("context", concat(lit("vessels__urn-"), col("user_id")))
      .withColumn("path", col("event_type"))
      .withColumn("ts2", timestamp_millis(col("ts_ms")))
      .withColumn("year", year(col("ts2")))
      .withColumn("day", lpad(dayofyear(col("ts2")).cast("string"), 3, "0"))
      .drop("ts2")
    write(df, out)
    retentionSweep(spark, out, Map("raw" -> 10), nowMs = 1706659200000L)
    withConf(spark,
      "spark.sql.sources.partitionColumnTypeInference.enabled", "false") {
      read(spark, out)
    }
      .groupBy("context", "day")
      .agg(count(lit(1)).as("n_records"))
      .withColumn("day", col("day").cast("string"))
      .orderBy("context", "day")
  }

  val retentionOracle: String =
    """SELECT 'vessels__urn-' || CAST(user_id AS VARCHAR) AS context,
      |  lpad(CAST(dayofyear(ts) AS VARCHAR), 3, '0') AS day,
      |  COUNT(*) AS n_records
      |FROM events
      |WHERE event_type = 'click' AND user_id < 4 AND dayofyear(ts) >= 21
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------- federated read
  /** Federated store read — the reference's cloud-archive fallback
    * (README "Cloud Integration": query local parquet first, fall back
    * to the S3/R2 archive for partitions the local store no longer
    * holds). Primary and archive are unioned with PRIMARY precedence
    * at hive-partition granularity: an archive partition contributes
    * only when the primary has no directory for that
    * (tier, context, path, year, day).
    *
    * The precedence test is a left-anti join of the archive rows
    * against the primary's distinct partition tuples — metadata-sized,
    * so it broadcasts; the data-bearing scans stay pruned and are never
    * shuffled. */
  def federatedRead(spark: SparkSession, primary: String, archive: String): DataFrame = {
    val keys = Seq("tier", "context", "path", "year", "day")
    val p = read(spark, primary)
    val a = read(spark, archive)
    val pParts = p.select(keys.map(col): _*).distinct()
    val archiveOnly = a.join(broadcast(pParts), keys, "left_anti")
    p.unionByName(archiveOnly)
  }

  /** Round-trip proving precedence: the primary holds users < 3, the
    * archive holds a STALE copy (value+1000) of users < 5. Federated
    * counts/averages must show original values for the overlap and
    * stale values only for the archive-only contexts (3–4). */
  def skFederatedRead(spark: SparkSession, dir: String): DataFrame = {
    def slice(maxUser: Int, valueShift: Double) =
      Tables.events(spark, dir)
        .where(col("event_type") === "click" && col("user_id") < maxUser)
        .withColumn("value", col("value") + valueShift)
        .withColumn("tier", lit("raw"))
        .withColumn("context", concat(lit("vessels__urn-"), col("user_id")))
        .withColumn("path", col("event_type"))
        .withColumn("ts2", timestamp_millis(col("ts_ms")))
        .withColumn("year", year(col("ts2")))
        .withColumn("day", lpad(dayofyear(col("ts2")).cast("string"), 3, "0"))
        .drop("ts2")
    val (primary, archive) = (scratchDir(), scratchDir())
    write(slice(3, 0.0), primary)
    write(slice(5, 1000.0), archive)
    val fed = withConf(spark,
      "spark.sql.sources.partitionColumnTypeInference.enabled", "false") {
      federatedRead(spark, primary, archive)
    }
    fed.groupBy("context")
      .agg(count(lit(1)).as("n_records"), davg(col("value")).as("value_avg"))
      .orderBy("context")
  }

  val federatedOracle: String =
    """SELECT 'vessels__urn-' || CAST(user_id AS VARCHAR) AS context,
      |  COUNT(*) AS n_records,
      |  CAST(SUM(CAST(value + (CASE WHEN user_id >= 3 THEN 1000.0 ELSE 0.0 END)
      |    AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS value_avg
      |FROM events WHERE event_type = 'click' AND user_id < 5
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_hive_write" -> (hiveWrite _),
    "sk_retention_sweep" -> (skRetention _),
    "sk_backup_sync" -> (skBackupSync _),
    "sk_federated_read" -> (skFederatedRead _))

  val oracles: Map[String, String] = Map(
    "sk_hive_write" -> hiveWriteOracle,
    "sk_retention_sweep" -> retentionOracle,
    "sk_backup_sync" -> backupSyncOracle,
    "sk_federated_read" -> federatedOracle)
}
