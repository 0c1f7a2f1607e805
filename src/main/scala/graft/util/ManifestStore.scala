package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** THE mutable-store publish protocol: a per-store FILE MANIFEST with an
  * atomic commit marker — snapshot isolation for every partitioned store
  * that is rewritten in place (the kNN-graph trigger swap, the
  * IVFADC/BM25 delete repairs, live-index compaction).
  *
  * This replaces the previous per-partition rename-aside swap, whose
  * two-rename window made a touched partition briefly ABSENT to a
  * concurrent reader (and whose `removeMissing` recovery could
  * resurrect a purposely-deleted partition — a deletion-durability gap).
  * Here readers never observe renames at all, because data files are
  * immutable once written and visibility is decided ONLY by the
  * manifest (the transaction-log discipline of Delta/Iceberg, reduced
  * to the one table-shape these stores need):
  *
  *   root/<part>=<v>/part-*.parquet   — immutable data files
  *   root/_manifest_v<N>              — the file list of version N
  *   root/_commit_v<N>                — atomic publish marker
  *   root/_lease                      — single-writer maintenance lease
  *
  * Readers resolve max(committed N), read `_manifest_v<N>`, and scan
  * exactly those files (passed explicitly with `basePath = root`, so
  * partition columns and their static/dynamic pruning behave exactly
  * as a whole-root read). A reader concurrent with ANY writer therefore
  * sees only old-or-new COMPLETE state — never an absent partition,
  * never a half-replaced one. Writers append new uniquely-named files
  * (Spark's task-UUID part files), then commit by writing the next
  * manifest and atomically creating its marker: a crash at any point
  * before the marker leaves invisible orphans (cleared lazily at the
  * next publish of their partitions), and a crash after it is already
  * the new committed state.
  *
  * Garbage collection runs at the TAIL of each publish with a ONE
  * VERSION grace window: committing v<N+1> retires the files that only
  * versions ≤ N−1 referenced (an in-flight reader is safe as long as it
  * is less than two publishes stale — the same grace rule as the
  * blue/green index rotation's retired-version GC). Manifest/marker
  * files older than N are dropped with their retired data files, so the
  * steady state is two manifests and at most one grace copy per
  * rewritten partition.
  *
  * Writer-vs-writer safety is an explicit LEASE (`_lease`, atomic
  * create-exclusive): every publish holds it, so two maintenance jobs
  * (a delete colliding with a compaction sweep, a trigger colliding
  * with a re-stage) cannot interleave manifest versions and silently
  * lose one job's commit — the loser fails loudly at acquisition. The
  * lease releases on ANY in-process failure; only a process death
  * leaves it behind, and the operator remedy is [[breakLease]] (a
  * production deployment would fence with a TTL/epoch — out of scope
  * here, spec-pinned as the loud-failure contract instead).
  *
  * Scale shape: one publish costs O(markers + touched dirs) namespace
  * operations plus one manifest read/write (O(total files) bytes —
  * compaction keeps file counts ≈ partition counts; a store whose
  * manifest outgrows a single file would shard it per partition range,
  * the Delta checkpoint discipline). Untouched partitions are never
  * listed, read, or rewritten by a touched-partition publish.
  */
object ManifestStore {

  /** Injected crash points for the crash-window specs:
    * "publish" fires after the data files are written but before the
    * manifest commit (the window a reader must see OLD state across);
    * "gc" fires after the commit but before garbage collection. */
  private[graft] var crashPoint: Option[String] = None
  private def maybeCrash(step: String): Unit =
    if (crashPoint.contains(step))
      throw new IllegalStateException(s"injected crash at $step")

  private def manifestPath(root: String, v: Int) = new Path(root, s"_manifest_v$v")
  private def markerPath(root: String, v: Int) = new Path(root, s"_commit_v$v")

  /** Max committed version at `root` (0 = nothing published). */
  def committedVersion(fs: FileSystem, root: String): Int = {
    val p = new Path(root)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("_commit_v")).map(_.stripPrefix("_commit_v").toInt)
      .maxOption.getOrElse(0)
  }

  /** Every version that still has a manifest file on disk (committed or
    * not yet GC'd). */
  private def manifestVersions(fs: FileSystem, root: String): Seq[Int] = {
    val p = new Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("_manifest_v")).map(_.stripPrefix("_manifest_v").toInt)
      .toSeq.sorted
  }

  /** The root-relative data-file list of version `v` (empty for v=0 or
    * a GC'd manifest). */
  private[graft] def filesAt(fs: FileSystem, root: String, v: Int): Seq[String] = {
    val mp = manifestPath(root, v)
    if (v <= 0 || !fs.exists(mp)) Seq.empty
    else {
      val in = fs.open(mp)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toList
      finally in.close()
    }
  }

  /** The committed file list (relative paths). */
  def files(spark: SparkSession, root: String): Seq[String] = {
    val fs = Fs.of(spark, root)
    filesAt(fs, root, committedVersion(fs, root))
  }

  /** Distinct partition-dir names (`part=value`) of the committed
    * manifest. */
  def partitionDirs(spark: SparkSession, root: String): Seq[String] =
    files(spark, root).map(_.takeWhile(_ != '/')).distinct.sorted

  /** Read the committed snapshot. The listed files are passed
    * EXPLICITLY with `basePath = root`, so the partition columns (and
    * their static + dynamic pruning) behave exactly as a whole-root
    * hive read — but the scan can never see a mid-publish state. The
    * caller supplies the full schema INCLUDING the partition column,
    * which also pins the partition column's type against the shared
    * session's `partitionColumnTypeInference` setting. An unpublished
    * store reads as empty. */
  def read(spark: SparkSession, root: String, schema: StructType): DataFrame = {
    val fl = files(spark, root)
    if (fl.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    else
      spark.read.option("basePath", root).schema(schema)
        .parquet(fl.map(f => s"$root/$f"): _*)
  }

  // ----------------------------------------------------------------
  // writer lease
  // ----------------------------------------------------------------

  /** Atomic create-exclusive of `_lease`; throws if a concurrent
    * maintenance job holds the store. */
  private[graft] def acquireLease(fs: FileSystem, root: String): Unit = {
    fs.mkdirs(new Path(root))
    try fs.create(new Path(root, "_lease"), false).close()
    catch {
      case e: java.io.IOException =>
        throw new IllegalStateException(
          s"store $root is held by a concurrent maintenance job (_lease " +
            "present); if its holder is dead, break it with " +
            "ManifestStore.breakLease", e)
    }
  }

  private[graft] def releaseLease(fs: FileSystem, root: String): Unit = {
    fs.delete(new Path(root, "_lease"), false)
    ()
  }

  /** Operator remedy for a lease left by a dead holder. */
  def breakLease(spark: SparkSession, root: String): Unit =
    releaseLease(Fs.of(spark, root), root)

  private def withLease[T](fs: FileSystem, root: String)(body: => T): T = {
    acquireLease(fs, root)
    try body finally releaseLease(fs, root)
  }

  // ----------------------------------------------------------------
  // publish
  // ----------------------------------------------------------------

  private def dataFiles(fs: FileSystem, dir: Path): Seq[String] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))

  /** Append `delta`'s rows as new files of their own partitions and
    * publish the next version (old files all kept). Rows of partitions
    * the store has never seen simply add those partitions. */
  def append(spark: SparkSession, root: String, partCol: String,
      delta: DataFrame): Unit =
    appendTouched(spark, root, partCol,
      delta.select(partCol).distinct().collect().map(_.get(0)).toSeq, delta)

  /** [[append]] with the touched partition set supplied by a caller
    * that already computed it — saves the extra distinct-collect job
    * on hot per-trigger paths. `touched` must cover every partition
    * `delta` writes (a row outside it would land on disk unlisted). */
  def appendTouched(spark: SparkSession, root: String, partCol: String,
      touched: Seq[Any], delta: DataFrame): Unit = {
    if (touched.nonEmpty)
      publish(spark, root, partCol, touched, replaceTouched = false) {
        delta.repartition(col(partCol))
          .write.mode("append").partitionBy(partCol).parquet(root)
      }
  }

  /** Replace the `touched` partitions' content with `repaired` (whose
    * rows must all belong to touched partitions) and publish the next
    * version. A touched partition with no rows in `repaired` is
    * REMOVED from the manifest — and, the old rename-aside protocol's
    * resurrection gap closed, can never come back: no recovery step
    * exists that re-lists retired files. Untouched partitions' files
    * are never listed, read, or rewritten. */
  def rewriteTouched(spark: SparkSession, root: String, partCol: String,
      touched: Seq[Any], repaired: DataFrame): Unit =
    publish(spark, root, partCol, touched, replaceTouched = true) {
      repaired.repartition(col(partCol))
        .write.mode("append").partitionBy(partCol).parquet(root)
    }

  /** The scheduled small-file sweep: rewrite EVERY partition of the
    * committed snapshot to one `sortCols`-sorted file (tight row-group
    * stats), publish as one snapshot flip. Result-invisible by
    * contract; readers concurrent with the sweep stay on the previous
    * version until the marker lands. */
  def compact(spark: SparkSession, root: String, partCol: String,
      sortCols: Seq[String], schema: StructType): Unit = {
    val touched = partitionDirs(spark, root)
      .map(_.stripPrefix(s"$partCol="))
    if (touched.nonEmpty) {
      val snapshot = read(spark, root, schema)
      publish(spark, root, partCol, touched, replaceTouched = true) {
        snapshot.repartition(col(partCol))
          .sortWithinPartitions(sortCols.map(col): _*)
          .write.mode("append").partitionBy(partCol).parquet(root)
      }
    }
  }

  /** The shared publish choreography (under the lease):
    *   1. clear invisible orphans of crashed publishes in the touched
    *      dirs (files no surviving manifest references),
    *   2. run the write job (new uniquely-named files, append-mode),
    *   3. write `_manifest_v<N+1>` = kept ∪ new, create its marker
    *      atomically — THE visibility flip,
    *   4. GC: drop data files only versions ≤ N−1 referenced, then
    *      those versions' manifest/marker files (grace window: the
    *      previous version N stays fully readable). */
  private def publish(spark: SparkSession, root: String, partCol: String,
      touched: Seq[Any], replaceTouched: Boolean)(writeJob: => Unit): Unit = {
    val fs = Fs.of(spark, root)
    withLease(fs, root) {
      val v = committedVersion(fs, root)
      val cur = filesAt(fs, root, v)
      val referenced = manifestVersions(fs, root)
        .flatMap(filesAt(fs, root, _)).toSet ++ cur
      val prefixes = touched.map(t => s"$partCol=$t/")
      for (t <- touched) {
        val d = new Path(root, s"$partCol=$t")
        for (n <- dataFiles(fs, d) if !referenced.contains(s"$partCol=$t/$n"))
          require(fs.delete(new Path(d, n), false), s"orphan delete failed: $d/$n")
      }
      writeJob
      val newFiles = touched.flatMap { t =>
        dataFiles(fs, new Path(root, s"$partCol=$t")).map(n => s"$partCol=$t/$n")
      }.filterNot(referenced.contains)
      maybeCrash("publish")
      val kept =
        if (replaceTouched) cur.filterNot(f => prefixes.exists(f.startsWith))
        else cur
      val newList = kept ++ newFiles
      val mp = manifestPath(root, v + 1)
      val out = fs.create(mp, true)
      try out.write(newList.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      fs.create(markerPath(root, v + 1), true).close()
      maybeCrash("gc")
      gc(fs, root, v + 1, newList.toSet)
    }
  }

  /** Drop every file only versions ≤ vNew−2 referenced, then their
    * manifests/markers (idempotent: a crash mid-GC re-collects at the
    * next publish because the stale manifests are deleted LAST). */
  private def gc(fs: FileSystem, root: String, vNew: Int,
      live: Set[String]): Unit = {
    val keep = live ++ filesAt(fs, root, vNew - 1)
    for (v <- manifestVersions(fs, root) if v < vNew - 1) {
      for (f <- filesAt(fs, root, v) if !keep.contains(f))
        fs.delete(new Path(root, f), false)
      fs.delete(manifestPath(root, v), false)
      fs.delete(markerPath(root, v), false)
    }
  }
}
