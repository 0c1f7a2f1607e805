package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** THE mutable-store publish protocol: a per-STORE file manifest with an
  * atomic commit marker — snapshot isolation for every store that is
  * rewritten in place (the kNN-graph trigger swap, the IVFADC/BM25
  * delete repairs, live-index compaction, the blue/green rotation).
  *
  * A store is ONE manifest spanning ALL of its tables: the IVFADC store
  * commits `lists` + `codes` (+ its delete log) in one version, the
  * BM25 store `postings` + `dl` + `stats` (+ log), the rotating index
  * `centroids` + `codebook` + `lists` + `codes` (+ log). That closes
  * the cross-TABLE torn-read window the per-table manifests of the
  * previous protocol left open (a reader resolving lists@v+1 with
  * codes@v served a state that was neither committed version), and it
  * collapses a trigger's N table publishes into ONE commit.
  *
  *   root/<table>/<part>=<v>/part-*.parquet  — immutable data files
  *   root/<table>/part-*.parquet             — unpartitioned table
  *   root/_shards/<dir>_v<N>_<uniq>.list     — immutable per-dir file list
  *   root/_shards/idx<B>_v<N>_<uniq>.list    — one dir-hash range's dir → shard lines
  *   root/_manifest_v<N>                     — "#R <buckets>" + bucket → index shard
  *   root/_commit_v<N>                       — atomic publish marker
  *   root/_lease                             — fenced single-writer lease
  *
  * (A single-table store may use the root itself as its one table —
  * `table = ""` — which is also the shape the primitive's own spec
  * exercises.)
  *
  * Readers resolve max(committed N) ONCE and read every table from that
  * version's manifest (the listed files are passed explicitly with
  * `basePath = <table dir>`, so partition columns and their
  * static/dynamic pruning behave exactly as a whole-root read). A
  * reader concurrent with ANY writer therefore sees one committed
  * version across ALL tables of the store — never an absent partition,
  * never a half-replaced one, never table A at v+1 with table B at v.
  * Writers append new uniquely-named files, then commit by writing the
  * next manifest and atomically creating its marker: a crash at any
  * point before the marker leaves invisible orphans, and a crash after
  * it is already the new committed state.
  *
  * MANIFEST SHARDING — publish cost O(touched), not O(total files):
  * the per-version manifest is an INDEX (one line per partition dir:
  * `dirKey → shard file`), and each shard is an immutable file listing
  * ONE dir's data files at some version. A publish writes new shards
  * only for the dirs it touched; every untouched dir's index line
  * carries the SAME shard file forward — not rewritten, not even read
  * (ManifestStoreSpec pins byte-identity of an untouched dir's shard
  * across a touched-dir publish). Shards are immutable once written,
  * so the driver caches their contents: steady-state resolution reads
  * O(touched-since-last-resolve) shard files, and the per-publish byte
  * cost is O(touched files + touched dirs) — the Delta-checkpoint
  * discipline reduced to the table shapes these stores need. The
  * INDEX itself is sharded the same way one level up: the manifest
  * file is (dir-hash bucket → index shard), each index shard lists
  * one range's (dir → shard) lines, and an untouched range's index
  * shard is carried forward verbatim — so at 10⁶ dirs a publish
  * rewrites O(touched ranges × bucket size) index lines, not one
  * line per dir. The bucket count only grows (powers of two,
  * ~[[indexBucketTarget]] dirs per bucket; a growth step rewrites
  * every range once, amortized over the doublings).
  *
  * Garbage collection runs at the TAIL of each publish with a ONE
  * VERSION grace window: committing v<N+1> retires the data files and
  * shards that only versions ≤ N−1 referenced (an in-flight reader is
  * safe as long as it is less than two publishes stale). A publish
  * FIRST clears crashed publishes' leftovers: any manifest without a
  * marker is uncommitted — its not-otherwise-referenced data files and
  * its shards are deleted immediately (not stranded until their dirs
  * happen to be touched again), then the manifest itself.
  *
  * Writer-vs-writer safety is a FENCED lease: `_lease` is created
  * exclusively with a fresh writer token as its content, every publish
  * re-verifies its own token immediately before writing the manifest
  * (and the marker create is itself create-exclusive). A writer that
  * stalls, has its lease broken by [[breakLease]], and then resumes is
  * FENCED: its token no longer matches (the lease is gone or a new
  * writer's), so its publish fails loudly BEFORE touching the manifest
  * — it can never overwrite a successor's commit (spec-pinned via the
  * [[onBeforeCommit]] interleaving hook). Lease acquisition itself
  * does not wait: two live maintenance jobs colliding is a scheduling
  * bug, and the loser fails loudly at acquisition (a deployment that
  * wants queueing retries around the publish call).
  *
  * Scale shape: one publish costs O(markers + touched dirs) namespace
  * operations, O(touched) shard bytes and one O(dirs)-line index
  * write; untouched partitions are never listed, read, or rewritten.
  */
object ManifestStore {

  /** On-disk protocol format version. Folded into every staged store's
    * fingerprint ([[graft.sources.Staging.stagedDir]]): a protocol
    * format change restages automatically instead of silently serving
    * a stale-layout store from a previous JVM. */
  private[graft] val LayoutVersion = 3

  /** Injected crash points for the crash-window specs:
    * "publish" fires after the data files are written but before the
    * manifest commit (the window a reader must see OLD state across);
    * "gc" fires after the commit but before garbage collection. */
  private[graft] var crashPoint: Option[String] = None
  private def maybeCrash(step: String): Unit =
    if (crashPoint.contains(step))
      throw new IllegalStateException(s"injected crash at $step")

  /** Test hook for the fence spec: runs once immediately before the
    * fence check of the next commit (the stalled-writer window). */
  private[graft] var onBeforeCommit: Option[() => Unit] = None

  /** Test hook for the late-fence spec: runs once AFTER the manifest
    * write, immediately before the re-fence that guards the marker
    * create (the post-manifest stall window). */
  private[graft] var onBeforeMarker: Option[() => Unit] = None

  // ----------------------------------------------------------------
  // one write against one table of the store
  // ----------------------------------------------------------------

  /** One table's contribution to an atomic store publish.
    *
    * `table` "" means the store root itself is the (single) table.
    * `partCol` "" means the table is unpartitioned (its dir is the one
    * "partition"). `touched` is evaluated UNDER the publish lease (so
    * a thunk may read the committed store to decide what it touches);
    * `None` means the whole table (every dir the manifest or the disk
    * knows). `write` receives the table dir and must create new
    * uniquely-named files inside the touched dirs (append-mode Spark
    * writes do). With `replace`, the touched dirs' previously
    * committed files are dropped from the next manifest (a touched
    * dir left empty disappears — durably; no recovery step can
    * resurrect it); without it they are kept alongside the new files. */
  final case class TableOp(table: String, partCol: String,
      touched: Option[() => Seq[Any]], replace: Boolean,
      write: String => Unit, defer: Option[() => TableOp] = None)

  /** An op whose concrete SHAPE (append vs replace, its write) is
    * decided UNDER the publish lease: `make` runs after acquisition,
    * so a decision that reads the committed store (the delete log's
    * fold-vs-append threshold) cannot go stale against a publish that
    * slips between op construction and lease acquisition. */
  def deferredOp(table: String)(make: () => TableOp): TableOp =
    TableOp(table, "", None, replace = false, _ => (), Some(() => {
      val op = make()
      require(op.table == table,
        s"deferred op for table '$table' resolved to '${op.table}'")
      op
    }))

  /** Append `delta()`'s rows into `touched` partitions of `table`. */
  def appendOp(table: String, partCol: String, touched: () => Seq[Any],
      delta: () => DataFrame): TableOp =
    TableOp(table, partCol, Some(touched), replace = false,
      dir => writePartitioned(delta(), partCol, dir))

  /** Replace the `touched` partitions' content of `table` with
    * `repaired()` (whose rows must all belong to touched partitions). */
  def rewriteOp(table: String, partCol: String, touched: () => Seq[Any],
      repaired: () => DataFrame): TableOp =
    TableOp(table, partCol, Some(touched), replace = true,
      dir => writePartitioned(repaired(), partCol, dir))

  /** Replace the WHOLE table with `data()` (the blue/green rotation
    * move; `partCol` "" for an unpartitioned table). */
  def replaceTableOp(table: String, partCol: String,
      data: () => DataFrame): TableOp =
    TableOp(table, partCol, None, replace = true,
      dir => writePartitioned(data(), partCol, dir))

  /** The scheduled small-file sweep for one table: every committed dir
    * collapses to one `sortCols`-sorted file (tight row-group stats),
    * inside whatever atomic publish the caller assembles. */
  def compactOp(spark: SparkSession, root: String, table: String,
      partCol: String, sortCols: Seq[String], schema: StructType): TableOp =
    TableOp(table, partCol, None, replace = true, { dir =>
      val snap = readTable(spark, root, table, schema)
      val laid = if (partCol.isEmpty) snap.coalesce(1).sortWithinPartitions(sortCols.map(col): _*)
        else snap.repartition(col(partCol)).sortWithinPartitions(sortCols.map(col): _*)
      writeLaidOut(laid, partCol, dir)
    })

  private def writePartitioned(df: DataFrame, partCol: String, dir: String): Unit =
    writeLaidOut(
      if (partCol.isEmpty) df.coalesce(1) else df.repartition(col(partCol)),
      partCol, dir)

  private def writeLaidOut(df: DataFrame, partCol: String, dir: String): Unit = {
    val w = df.write.mode("append")
    (if (partCol.isEmpty) w else w.partitionBy(partCol)).parquet(dir)
  }

  // ----------------------------------------------------------------
  // paths and resolution
  // ----------------------------------------------------------------

  private def manifestPath(root: String, v: Int) = new Path(root, s"_manifest_v$v")
  private def markerPath(root: String, v: Int) = new Path(root, s"_commit_v$v")
  private def shardsDir(root: String) = new Path(root, "_shards")
  private def tableDir(root: String, table: String): String =
    if (table.isEmpty) root else s"$root/$table"
  private def dirKeyOf(table: String, partCol: String, t: Any): String = {
    val p = if (partCol.isEmpty) "" else s"$partCol=$t"
    if (table.isEmpty) p else if (p.isEmpty) table else s"$table/$p"
  }

  /** Max committed version at `root` (0 = nothing published). A
    * version counts as committed only when its marker AND its manifest
    * both exist: a marker whose manifest is gone (a fenced straggler
    * that raced a successor's cleanup, or a GC crash window) must
    * resolve to the predecessor — never to a silently EMPTY store. */
  def committedVersion(fs: FileSystem, root: String): Int = {
    val p = new Path(root)
    if (!fs.exists(p)) 0
    else {
      val names = fs.listStatus(p).map(_.getPath.getName)
      val manifests = names.filter(_.startsWith("_manifest_v"))
        .map(_.stripPrefix("_manifest_v").toInt).toSet
      names.filter(_.startsWith("_commit_v"))
        .map(_.stripPrefix("_commit_v").toInt)
        .filter(manifests.contains).maxOption.getOrElse(0)
    }
  }

  def committedVersion(spark: SparkSession, root: String): Int =
    committedVersion(Fs.of(spark, root), root)

  /** Every version that still has a manifest (index) file on disk. */
  private def manifestVersions(fs: FileSystem, root: String): Seq[Int] = {
    val p = new Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("_manifest_v")).map(_.stripPrefix("_manifest_v").toInt)
      .toSeq.sorted
  }

  private def readLines(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  private def writeLines(fs: FileSystem, p: Path, lines: Seq[String],
      overwrite: Boolean = true): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Dirs per index bucket before the bucket count doubles — the knob
    * that keeps each index shard a bounded read and a publish's index
    * rewrite O(touched ranges). Spec-overridable. */
  private[graft] var indexBucketTarget = 256

  /** The dir-hash-range bucket of a dir key at bucket count `r`.
    * `String.hashCode` is a FIXED algorithm by the Java spec, so the
    * assignment is stable across JVMs and releases. */
  private def bucketOf(dk: String, r: Int): Int =
    if (r <= 1) 0 else (dk.hashCode & 0x7fffffff) % r

  /** Smallest power-of-two bucket count that keeps buckets at or under
    * [[indexBucketTarget]] dirs. */
  private def targetBuckets(dirCount: Int): Int = {
    var r = 1
    while (r.toLong * indexBucketTarget < dirCount) r <<= 1
    r
  }

  /** One version's manifest file, parsed: the bucket count `r` and the
    * (bucket → index-shard) lines. `r` == 0 marks a LEGACY single-level
    * manifest whose lines are (dirKey → dir-shard) directly. */
  private final case class ManifestIx(r: Int,
      buckets: Seq[(Int, String)], legacy: Seq[(String, String)])

  private def splitTab(l: String, mp: Path): (String, String) = {
    val i = l.indexOf('\t')
    require(i > 0, s"malformed manifest line at $mp: $l")
    (l.substring(0, i), l.substring(i + 1))
  }

  private def readManifest(fs: FileSystem, root: String, v: Int): ManifestIx = {
    val mp = manifestPath(root, v)
    if (v <= 0 || !fs.exists(mp)) ManifestIx(0, Seq.empty, Seq.empty)
    else readLines(fs, mp) match {
      case head +: rest if head.startsWith("#R\t") =>
        ManifestIx(head.stripPrefix("#R\t").toInt,
          rest.map(l => { val (b, s) = splitTab(l, mp); (b.toInt, s) }), Seq.empty)
      case lines => // legacy single-level manifest: readable, never written
        ManifestIx(0, Seq.empty, lines.map(splitTab(_, mp)))
    }
  }

  /** The index-shard names version `v`'s manifest references (its
    * second level — the dir-shard names are [[indexAt]]'s values). */
  private def indexShardsAt(fs: FileSystem, root: String, v: Int): Seq[String] =
    readManifest(fs, root, v).buckets.map(_._2)

  /** Version `v`'s index: ordered (dirKey, dirShardName) pairs,
    * flattened through the bucket level. */
  private def indexAt(fs: FileSystem, root: String, v: Int): Seq[(String, String)] = {
    val m = readManifest(fs, root, v)
    if (m.r == 0) m.legacy
    else m.buckets.flatMap { case (_, idxShard) =>
      shardFiles(fs, root, idxShard)
        .map(splitTab(_, new Path(shardsDir(root), idxShard)))
    }
  }

  /** The committed (bucket count, bucket → index shard) level — the
    * index-sharding contract's observable surface. */
  private[graft] def bucketIndex(spark: SparkSession, root: String): (Int, Seq[(Int, String)]) = {
    val fs = Fs.of(spark, root)
    val m = readManifest(fs, root, committedVersion(fs, root))
    (m.r, m.buckets)
  }

  /** Shards are immutable once written (names carry a uniquifier), so
    * their contents cache across resolutions: steady-state resolution
    * of a hot store re-reads only the shards its last publishes
    * replaced. The cache is PER STORE and LRU-bounded: one store
    * overflowing its bound evicts only its own coldest entries — never
    * a wholesale clear, never another store's working set (the r18
    * global clear-at-50k turned one overflow into a re-read storm
    * across every live store in the JVM). */
  private[graft] var shardCachePerStore = 4096
  private val shardCaches = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.Map[String, Seq[String]]]()

  private def cacheFor(root: String): java.util.Map[String, Seq[String]] =
    shardCaches.computeIfAbsent(root, _ =>
      java.util.Collections.synchronizedMap(
        new java.util.LinkedHashMap[String, Seq[String]](64, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, Seq[String]]): Boolean =
            size() > shardCachePerStore
        }))

  /** Cold-cache hook for the crash-recovery specs: on-disk integrity,
    * not cache contents, is what the suite must pin. */
  private[graft] def clearShardCache(): Unit = shardCaches.clear()

  /** Cache size of one store (spec surface for the LRU bound). */
  private[graft] def shardCacheSize(root: String): Int =
    Option(shardCaches.get(root)).map(_.size).getOrElse(0)

  private def shardFiles(fs: FileSystem, root: String, shard: String): Seq[String] = {
    val c = cacheFor(root)
    val hit = c.get(shard)
    if (hit != null) hit
    else {
      val v = readLines(fs, new Path(shardsDir(root), shard))
      c.put(shard, v)
      v
    }
  }

  /** The root-relative data-file list of version `v`. */
  private[graft] def filesAt(fs: FileSystem, root: String, v: Int): Seq[String] =
    indexAt(fs, root, v).flatMap { case (_, shard) => shardFiles(fs, root, shard) }

  // ----------------------------------------------------------------
  // snapshot reads
  // ----------------------------------------------------------------

  /** One committed version of the WHOLE store, resolved once: every
    * table read off a snapshot sees the same version — the cross-table
    * isolation contract a multi-table reader must use. */
  final class Snapshot private[ManifestStore] (spark: SparkSession,
      root: String, val version: Int, val files: Seq[String]) {

    def tableFiles(table: String): Seq[String] =
      if (table.isEmpty) files
      else files.collect { case f if f.startsWith(s"$table/") => f.stripPrefix(s"$table/") }

    /** Read one table at this snapshot's version. The listed files are
      * passed EXPLICITLY with `basePath = <table dir>`, so partition
      * columns (and their static + dynamic pruning) behave exactly as
      * a whole-dir read — but the scan can never see a mid-publish
      * state. The caller supplies the full schema INCLUDING the
      * partition column, which also pins that column's type against
      * the shared session's `partitionColumnTypeInference` setting.
      * An unpublished/empty table reads as an empty frame. */
    def read(table: String, schema: StructType): DataFrame = {
      val fl = tableFiles(table)
      if (fl.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[Row](), schema)
      else {
        val base = tableDir(root, table)
        spark.read.option("basePath", base).schema(schema)
          .parquet(fl.map(f => s"$base/$f"): _*)
      }
    }
  }

  def snapshot(spark: SparkSession, root: String): Snapshot = {
    val fs = Fs.of(spark, root)
    val v = committedVersion(fs, root)
    new Snapshot(spark, root, v, filesAt(fs, root, v))
  }

  /** Read the committed snapshot of a single-table store (the root is
    * the table). */
  def read(spark: SparkSession, root: String, schema: StructType): DataFrame =
    snapshot(spark, root).read("", schema)

  /** Read one table of a multi-table store. Multi-TABLE consumers of
    * one logical result must resolve a [[snapshot]] once and read all
    * tables from it instead of calling this repeatedly. */
  def readTable(spark: SparkSession, root: String, table: String,
      schema: StructType): DataFrame =
    snapshot(spark, root).read(table, schema)

  /** The committed file list (root-relative). */
  def files(spark: SparkSession, root: String): Seq[String] =
    snapshot(spark, root).files

  /** The committed file list of one table (table-relative). */
  def tableFiles(spark: SparkSession, root: String, table: String): Seq[String] =
    snapshot(spark, root).tableFiles(table)

  /** Distinct partition-dir names (`part=value`) of a single-table
    * store's committed manifest. */
  def partitionDirs(spark: SparkSession, root: String): Seq[String] =
    files(spark, root).map(_.takeWhile(_ != '/')).distinct.sorted

  /** The committed (dirKey → shard file) index — the sharding
    * contract's observable surface (spec-pinned byte-identity of
    * untouched dirs' shards). */
  private[graft] def shardIndex(spark: SparkSession, root: String): Seq[(String, String)] = {
    val fs = Fs.of(spark, root)
    indexAt(fs, root, committedVersion(fs, root))
  }

  // ----------------------------------------------------------------
  // fenced writer lease
  // ----------------------------------------------------------------

  /** Atomic create-exclusive of `_lease` with a fresh writer token as
    * content; throws if a concurrent maintenance job holds the store.
    * Returns the token the holder must fence every commit with.
    *
    * `waitMs` > 0 is the bounded-queue option for scheduled jobs whose
    * collision with a live trigger is a normal event (a compaction
    * sweep firing mid-trigger): acquisition retries until the holder
    * releases or the bound expires — then the loud failure stands
    * (a DEAD holder's lease never releases; waiting on one must end
    * in the breakLease remedy, not an infinite queue). */
  private[graft] def acquireLease(fs: FileSystem, root: String,
      waitMs: Long = 0L): String = {
    fs.mkdirs(new Path(root))
    val deadline = System.nanoTime() + waitMs * 1000000L
    val token = java.util.UUID.randomUUID().toString
    var acquired = false
    while (!acquired) {
      try {
        val out = fs.create(new Path(root, "_lease"), false)
        try out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        acquired = true
      } catch {
        case e: java.io.IOException =>
          if (System.nanoTime() < deadline) Thread.sleep(50)
          else throw new IllegalStateException(
            s"store $root is held by a concurrent maintenance job (_lease " +
              "present); if its holder is dead, break it with " +
              "ManifestStore.breakLease", e)
      }
    }
    token
  }

  private def leaseToken(fs: FileSystem, root: String): Option[String] = {
    val p = new Path(root, "_lease")
    if (!fs.exists(p)) None
    else Some(readLines(fs, p).headOption.getOrElse(""))
  }

  /** The fence: a stalled writer whose lease was broken (and possibly
    * reacquired) must fail LOUDLY before touching the manifest — its
    * in-flight files stay uncommitted orphans, and it can never
    * overwrite a successor's commit. */
  private def fence(fs: FileSystem, root: String, token: String): Unit =
    if (!leaseToken(fs, root).contains(token))
      throw new IllegalStateException(
        s"writer fenced at $root: the lease was broken (and possibly " +
          "reacquired by a successor) while this publish was in flight; " +
          "its files remain uncommitted orphans")

  /** Release only OUR lease — a fenced holder's cleanup must not
    * delete a successor's. */
  private[graft] def releaseLease(fs: FileSystem, root: String, token: String): Unit =
    if (leaseToken(fs, root).contains(token)) {
      fs.delete(new Path(root, "_lease"), false)
      ()
    }

  /** Operator remedy for a lease left by a dead holder (the holder, if
    * merely stalled, is fenced from that moment on). */
  def breakLease(spark: SparkSession, root: String): Unit = {
    Fs.of(spark, root).delete(new Path(root, "_lease"), false)
    ()
  }

  // ----------------------------------------------------------------
  // publish
  // ----------------------------------------------------------------

  private def dataFiles(fs: FileSystem, dir: Path): Seq[String] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.filter(_.isFile).map(_.getPath.getName)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))

  /** Partition dirs of `table` present on disk (whole-table ops must
    * sweep/list dirs the manifest may not know yet). */
  private def diskDirs(fs: FileSystem, root: String, table: String,
      partCol: String): Seq[String] = {
    val td = new Path(tableDir(root, table))
    if (!fs.exists(td)) Seq.empty
    else fs.listStatus(td).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(_.startsWith(s"$partCol="))
      .map(d => if (table.isEmpty) d else s"$table/$d")
  }

  /** The shared publish choreography (under the fenced lease):
    *   1. clear crashed publishes: uncommitted manifests, their shards,
    *      and their not-otherwise-referenced data files;
    *   2. per op: resolve its touched dirs, clear those dirs' orphans,
    *      run the write job, list its new files;
    *   3. fence, then write new shards for the touched dirs ONLY, the
    *      v<N+1> index (untouched dirs carry their shard lines
    *      verbatim), and create the marker atomically — THE flip;
    *   4. GC with a one-version grace window (data files, shards,
    *      manifests, markers of versions ≤ N−1). */
  def publishOps(spark: SparkSession, root: String, ops0: Seq[TableOp],
      leaseWaitMs: Long = 0L): Unit = {
    require(ops0.map(_.table).distinct.size == ops0.size,
      s"one publish may carry at most one op per table: ${ops0.map(_.table)}")
    val fs = Fs.of(spark, root)
    val token = acquireLease(fs, root, leaseWaitMs)
    try {
      // deferred ops resolve their shape HERE, under the lease
      val ops = ops0.map(o => o.defer.map(_()).getOrElse(o))
      // 1. crashed-publish cleanup (ADVICE r17: an uncommitted manifest
      // must not strand its files as permanently unreferenced). An
      // uncommitted manifest carries untouched dirs' COMMITTED shard
      // files forward verbatim, so its cleanup may delete only shards
      // no committed manifest references (ADVICE r18: deleting them
      // all broke every untouched dir for any cold reader). Markers
      // whose manifest is gone (a fenced straggler's leftovers) are
      // dangling — readers already ignore them; delete them so the
      // version they squatted on publishes cleanly.
      val allVs = manifestVersions(fs, root)
      val committedVs = allVs.filter(w => fs.exists(markerPath(root, w)))
      val referenced: Set[String] =
        committedVs.flatMap(w => filesAt(fs, root, w)).toSet
      val committedShards: Set[String] =
        committedVs.flatMap(w => indexAt(fs, root, w).map(_._2) ++
          indexShardsAt(fs, root, w)).toSet
      for (w <- allVs if !committedVs.contains(w)) {
        for (f <- filesAt(fs, root, w) if !referenced.contains(f))
          fs.delete(new Path(root, f), false)
        for (shard <- indexAt(fs, root, w).map(_._2) ++ indexShardsAt(fs, root, w)
            if !committedShards.contains(shard))
          fs.delete(new Path(shardsDir(root), shard), false)
        fs.delete(manifestPath(root, w), false)
      }
      for (n <- fs.listStatus(new Path(root)).map(_.getPath.getName)
          if n.startsWith("_commit_v") &&
            !allVs.contains(n.stripPrefix("_commit_v").toInt))
        fs.delete(new Path(root, n), false)
      val v = committedVs.maxOption.getOrElse(0)
      val curIndex = indexAt(fs, root, v)
      val curByDir: Map[String, Seq[String]] = curIndex.map { case (dk, shard) =>
        dk -> shardFiles(fs, root, shard)
      }.toMap

      // 2. per-op: touched dirs + orphan sweep (sequential — touched
      // thunks may force shared store reads under the lease), then the
      // WRITE JOBS IN PARALLEL (the tables' writes are independent —
      // only the commit must be atomic; on toy-scale triggers the
      // sequential-job latency, not the write work, was the cost of a
      // multi-table trigger), then new-file listing
      case class OpDone(op: TableOp, dirs: Seq[String],
          newByDir: Map[String, Seq[String]], wholeTable: Boolean)
      def manifestDirsOf(table: String): Seq[String] =
        curIndex.map(_._1).filter(dk =>
          if (table.isEmpty) true else dk == table || dk.startsWith(s"$table/"))
      val staged = ops.flatMap { op =>
        val wholeTable = op.touched.isEmpty
        val preDirs: Seq[String] =
          if (op.partCol.isEmpty) Seq(dirKeyOf(op.table, "", null))
          else op.touched match {
            case Some(t) => t().map(x => dirKeyOf(op.table, op.partCol, x))
            case None => (diskDirs(fs, root, op.table, op.partCol) ++
              manifestDirsOf(op.table)).distinct
          }
        // an explicit empty touched set is a no-op; whole-table and
        // unpartitioned ops always run (their write may create the
        // table's first dirs)
        if (op.touched.isDefined && op.partCol.nonEmpty && preDirs.isEmpty) None
        else {
          for (dk <- preDirs; n <- dataFiles(fs, new Path(root, dk))
              if !referenced.contains(s"$dk/$n"))
            require(fs.delete(new Path(root, s"$dk/$n"), false),
              s"orphan delete failed: $root/$dk/$n")
          Some((op, preDirs, wholeTable))
        }
      }
      if (staged.isEmpty) return // nothing touched — no version bump
      if (staged.size == 1) staged.head._1.write(tableDir(root, staged.head._1.table))
      else {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        // every write runs to COMPLETION (success or failure) before we
        // proceed or abort — a straggler still writing after the lease
        // released could leak its files into a successor publish's
        // new-file listing
        val jobs = staged.map { case (op, _, _) =>
          Future(scala.util.Try(op.write(tableDir(root, op.table))))
        }
        Await.result(Future.sequence(jobs), scala.concurrent.duration.Duration.Inf)
          .foreach(_.get)
      }
      val done = staged.map { case (op, preDirs, wholeTable) =>
        val postDirs =
          if (wholeTable && op.partCol.nonEmpty)
            (preDirs ++ diskDirs(fs, root, op.table, op.partCol)).distinct
          else preDirs
        val newByDir = postDirs.map { dk =>
          dk -> dataFiles(fs, new Path(root, dk))
            .map(n => s"$dk/$n").filterNot(referenced.contains)
        }.toMap
        OpDone(op, postDirs, newByDir, wholeTable)
      }
      maybeCrash("publish")

      // 3. fence + commit
      onBeforeCommit.foreach { f => onBeforeCommit = None; f() }
      fence(fs, root, token)
      val vNew = v + 1
      // dirs each op drops wholesale (replace) vs keeps
      val dropped: Set[String] = done.flatMap { d =>
        if (!d.op.replace) Seq.empty
        else if (d.wholeTable) manifestDirsOf(d.op.table)
        else d.dirs
      }.toSet
      val touchedDirs: Set[String] = done.flatMap(_.dirs).toSet
      val newFilesOf: Map[String, Seq[String]] =
        done.flatMap(_.newByDir).toMap
      def shardNameFor(dk: String): String = {
        val san = dk.replaceAll("[^0-9a-zA-Z.=-]", "_")
        s"${san}_v${vNew}_${java.util.UUID.randomUUID().toString.take(8)}.list"
      }
      val newIndex = scala.collection.mutable.LinkedHashMap[String, String]()
      fs.mkdirs(shardsDir(root))
      for ((dk, shard) <- curIndex) {
        if (!touchedDirs.contains(dk) && !dropped.contains(dk))
          newIndex += dk -> shard // untouched: the SAME shard file, verbatim
        else {
          val kept = if (dropped.contains(dk)) Seq.empty else curByDir(dk)
          val merged = kept ++ newFilesOf.getOrElse(dk, Seq.empty)
          if (merged.nonEmpty) {
            val s = shardNameFor(dk)
            writeLines(fs, new Path(shardsDir(root), s), merged)
            newIndex += dk -> s
          }
        }
      }
      for (dk <- done.flatMap(_.dirs) if !newIndex.contains(dk) &&
          !curByDir.contains(dk)) {
        val nf = newFilesOf.getOrElse(dk, Seq.empty)
        if (nf.nonEmpty) {
          val s = shardNameFor(dk)
          writeLines(fs, new Path(shardsDir(root), s), nf)
          newIndex += dk -> s
        }
      }
      // INDEX-LEVEL sharding: the manifest file is (bucket → index
      // shard), each index shard listing the (dir → dir-shard) lines
      // of one dir-hash range. An untouched range's index shard is
      // carried forward VERBATIM — a publish writes O(touched ranges)
      // index lines, never one line per dir of the store (the last
      // O(store) term in the publish path, now gone). The bucket count
      // only grows (powers of two, ~indexBucketTarget dirs/bucket); a
      // growth step rewrites every range once, amortized over the
      // doublings.
      val curM = readManifest(fs, root, v)
      val newR = math.max(math.max(curM.r, 1), targetBuckets(newIndex.size))
      val newByBucket: Map[Int, Seq[(String, String)]] =
        newIndex.toSeq.groupBy { case (dk, _) => bucketOf(dk, newR) }
      val curByBucket: Map[Int, Set[(String, String)]] =
        if (newR == curM.r) curIndex.groupBy { case (dk, _) => bucketOf(dk, newR) }
          .view.mapValues(_.toSet).toMap
        else Map.empty
      val curBucketShard: Map[Int, String] =
        if (newR == curM.r) curM.buckets.toMap else Map.empty
      val bucketLines: Seq[(Int, String)] = (0 until newR).flatMap { b =>
        newByBucket.get(b).map { pairs =>
          val carried = curBucketShard.get(b).filter(_ =>
            curByBucket.getOrElse(b, Set.empty[(String, String)]) == pairs.toSet)
          b -> carried.getOrElse {
            val s = s"idx${b}_v${vNew}_${java.util.UUID.randomUUID().toString.take(8)}.list"
            writeLines(fs, new Path(shardsDir(root), s),
              pairs.sortBy(_._1).map { case (dk, ds) => s"$dk\t$ds" })
            s
          }
        }
      }
      // the manifest create is EXCLUSIVE: a legitimate writer always
      // targets a fresh version (step 1 removed uncommitted leftovers
      // under its own lease), so a fenced straggler that stalls after
      // its fence and resumes after a successor committed the same
      // vNew fails LOUDLY here instead of overwriting the successor's
      // committed file list (ADVICE r18)
      writeLines(fs, manifestPath(root, vNew),
        s"#R\t$newR" +: bucketLines.map { case (b, s) => s"$b\t$s" },
        overwrite = false)
      // "commit" fires between the manifest write and the marker — the
      // crashed-publish window whose manifest step 1 must clear (its
      // files must not strand as permanently unreferenced)
      maybeCrash("commit")
      onBeforeMarker.foreach { f => onBeforeMarker = None; f() }
      // re-verify the fence between the manifest write and the marker:
      // a writer broken-and-superseded INSIDE that window would
      // otherwise win the marker create against a successor that
      // legitimately cleaned its manifest away — committing a marker
      // whose manifest is gone (readers ignore that state now, but the
      // straggler must still fail loudly, not report success)
      fence(fs, root, token)
      // the exclusive create is the flip — and the last fence: even a
      // writer that raced past a broken lease cannot overwrite a
      // successor's committed marker
      fs.create(markerPath(root, vNew), false).close()
      maybeCrash("gc")

      // 4. GC: one-version grace
      val keepFiles = newIndex.valuesIterator
        .flatMap(s => shardFiles(fs, root, s)).toSet ++ filesAt(fs, root, v)
      for (w <- committedVs if w < vNew - 1) {
        for (f <- filesAt(fs, root, w) if !keepFiles.contains(f))
          fs.delete(new Path(root, f), false)
        fs.delete(manifestPath(root, w), false)
      }
      // stale markers (including data-less ones a crashed GC stranded)
      for (n <- fs.listStatus(new Path(root)).map(_.getPath.getName)
          if n.startsWith("_commit_v") &&
            n.stripPrefix("_commit_v").toInt < vNew - 1)
        fs.delete(new Path(root, n), false)
      val keepShards = (newIndex.valuesIterator ++
        bucketLines.iterator.map(_._2) ++
        indexAt(fs, root, v).iterator.map(_._2) ++
        indexShardsAt(fs, root, v).iterator).toSet
      if (fs.exists(shardsDir(root)))
        for (s <- fs.listStatus(shardsDir(root)).map(_.getPath.getName)
            if !keepShards.contains(s))
          fs.delete(new Path(shardsDir(root), s), false)
    } finally releaseLease(fs, root, token)
  }

  // ----------------------------------------------------------------
  // single-table convenience (the root is the table)
  // ----------------------------------------------------------------

  /** Append `delta`'s rows as new files of their own partitions and
    * publish the next version (old files all kept). Rows of partitions
    * the store has never seen simply add those partitions. */
  def append(spark: SparkSession, root: String, partCol: String,
      delta: DataFrame): Unit = {
    val touched = delta.select(partCol).distinct().collect().map(_.get(0)).toSeq
    appendTouched(spark, root, partCol, touched, delta)
  }

  /** [[append]] with the touched partition set supplied by a caller
    * that already computed it. `touched` must cover every partition
    * `delta` writes (a row outside it would land on disk unlisted). */
  def appendTouched(spark: SparkSession, root: String, partCol: String,
      touched: Seq[Any], delta: DataFrame): Unit =
    if (touched.nonEmpty)
      publishOps(spark, root,
        Seq(appendOp("", partCol, () => touched, () => delta)))

  /** Replace the `touched` partitions' content with `repaired` and
    * publish the next version. A touched partition with no rows in
    * `repaired` is REMOVED from the manifest — durably. */
  def rewriteTouched(spark: SparkSession, root: String, partCol: String,
      touched: Seq[Any], repaired: DataFrame): Unit =
    if (touched.nonEmpty)
      publishOps(spark, root,
        Seq(rewriteOp("", partCol, () => touched, () => repaired)))

  /** The scheduled small-file sweep of a single-table store. */
  def compact(spark: SparkSession, root: String, partCol: String,
      sortCols: Seq[String], schema: StructType): Unit =
    publishOps(spark, root,
      Seq(compactOp(spark, root, "", partCol, sortCols, schema)))
}
