package graft.similarity

import graft.Tables
import graft.sources.Staging
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Deletion with DERIVED-INDEX REPAIR — the missing half of retention.
  * The event store already has `sk_retention_sweep` (the reference's
  * per-path retention policy, signalk-parquet
  * utils/retention-rules.ts:1-34, deletes raw partitions); but a
  * GDPR delete or a retention cut on a 100 TB embedding/document
  * corpus must ALSO repair every derived store that memorized the
  * deleted rows: the BM25 postings (and the df counts behind idf),
  * the IVFADC cell lists + PQ codes, and the kNN directed
  * neighbor lists (a deleted vector may BE someone's 3rd-nearest
  * neighbor). Three gated operators, one per store family, all on the
  * same touched-partition discipline as the tier-correction path
  * (9d/42i) and the streaming graph swap (33h):
  *
  *   - the delete set is BATCH-sized (ids); everything derived from it
  *     (touched cells, touched labels, touched term buckets) is
  *     delete-batch-sized — the corpus-scale store is never scanned,
  *     only its touched partitions are listed, read and rewritten;
  *   - each rewrite publishes via the per-partition rename-aside swap
  *     (the [[graft.streaming.GraphStream]] protocol): aside-rename
  *     strictly before in-rename, recovery at the head of the next
  *     run, so readers never see a partial partition and a crashed
  *     delete re-runs idempotently (the delete set is a pure
  *     predicate; re-deleting already-deleted rows is a no-op);
  *   - repair is EXACT, not tombstoning: the contract (and the
  *     oracle) is that every post-delete answer equals a FRESH build
  *     from the surviving corpus. That holds bit-for-bit because the
  *     quantizers/codebooks are frozen functions of a fixed training
  *     slice that the delete set is disjoint from (the FAISS
  *     `remove_ids` discipline: deletion drops index entries, it
  *     never retrains — a drifted survivor distribution is the
  *     [[IndexRefresh]] alarm's job, not the delete path's).
  *
  * Per-store repair cost:
  *   - IVFADC: assign the deleted vectors against the frozen coarse
  *     centroids (O(|delete| · K)) → their cells are the only
  *     lists/codes partitions rewritten; nprobe DPP layout survives.
  *   - kNN graph: deletions cannot cross label blocks, so only the
  *     deleted vectors' label partitions are touched; inside one,
  *     survivors whose top-5 contains a deleted neighbor are
  *     RESCORED against the surviving block (they lost a list entry
  *     and the replacement can be any block survivor — the one
  *     genuinely super-linear step, O(|affected| · block), the exact
  *     price of not storing a top-(k+buffer) slack list); untouched
  *     survivors' lists carry through unchanged (dropping candidates
  *     that were NOT in a top-5 cannot change that top-5).
  *   - BM25: the deleted docs are re-tokenized (delete-batch-sized —
  *     postings are term-partitioned, so a doc's rows are findable
  *     only through its own terms); their (term, doc) rows drop from
  *     the touched term buckets, and every derived count — per-term
  *     df, the per-bucket dl rows, the corpus stats partials —
  *     RECOUNTS from the repaired primary rows at touched-bucket
  *     granularity (integer-exact, and idempotent where a per-term
  *     subtraction would double-apply on a crash re-run). idf is
  *     deliberately NOT stored: it depends on N, which a delete moves
  *     for EVERY term — the store keeps the integer df and derives
  *     idf at query time ([[Hybrid.idfFromDf]], vocabulary-sized).
  *
  * Demo delete sets (deterministic, oracle-mirrored): vectors
  * `vec_id % 17 = 14` — disjoint from the probes (vec_id < 5) and the
  * frozen training slice (100–115, whose residues mod 17 never hit
  * 14); documents `doc_id % 13 = 5` — disjoint from the BM25 probes
  * (0–2). In production the set is whatever ids the retention sweep
  * or the deletion request carries.
  */
object DeleteRepair {

  private[graft] val delVecPred = pmod(col("vec_id"), lit(17L)) === 14L
  private[graft] val delDocPred = pmod(col("doc_id"), lit(13L)) === 5L

  // ---------------------------------------------------------------
  // shared touched-partition publish
  // ---------------------------------------------------------------

  private def recoverAside(fs: org.apache.hadoop.fs.FileSystem,
      store: String, partPrefix: String): Unit =
    graft.util.PartitionSwap.recover(fs, store, partPrefix)

  /** Publish `repaired` (the new rows of the TOUCHED partitions only)
    * into `store` via the single-sourced per-partition rename-aside
    * swap ([[graft.util.PartitionSwap]], `removeMissing = true`): a
    * touched partition absent from `repaired` (every row deleted) is
    * simply removed. Untouched partitions' files are never listed,
    * read or rewritten. */
  private def publishTouched(spark: SparkSession, store: String,
      partCol: String, touched: Seq[Int], repaired: DataFrame): Unit = {
    val fs = graft.util.Fs.of(spark, store)
    recoverAside(fs, store, partCol + "=")
    if (touched.isEmpty) return
    val next = store + "_next"
    fs.delete(new Path(next), true)
    repaired.repartition(col(partCol))
      .write.partitionBy(partCol).parquet(next)
    graft.util.PartitionSwap.swapTouched(fs, store, next, partCol,
      touched.map(v => v: Any), removeMissing = true)
  }

  private def collectInts(df: DataFrame, c: String): Seq[Int] =
    df.select(col(c).cast("int")).distinct().collect().map(_.getInt(0)).sorted.toSeq

  /** Clone a staged (immutable, fingerprint-shared) partitioned table
    * into a mutable root, keeping the partition layout. */
  private def clonePartitioned(spark: SparkSession, src: String,
      dst: String, partCol: String): Unit =
    spark.read.parquet(src).repartition(col(partCol))
      .write.partitionBy(partCol).parquet(dst)

  // ------------------------------------------------------------- #117
  // IVFADC: drop the deleted vectors' rows from their cells only
  // ---------------------------------------------------------------

  /** Apply the delete set to a live IVFADC store at `base`: assign the
    * deleted VECTORS (not the store) against the frozen centroids to
    * find the touched cells, then rewrite only those `bucket=` dirs of
    * `lists` and `codes`. Idempotent (anti-joins of already-absent
    * rows are no-ops), so a crashed run re-runs safely after the
    * entry recovery. */
  private[graft] def deleteFromIvfPq(spark: SparkSession, base: String,
      delVecs: DataFrame): Unit = {
    graft.functions.L2Distance.register(spark)
    graft.functions.KnownNonNullElements.register(spark)
    // recover any crashed swap OR compaction sweep BEFORE reading the
    // store: a partition sitting in the aside dir (or a whole store
    // sitting in _precompact) must be visible to the re-run's reads
    for (t <- Seq("lists", "codes")) {
      graft.sources.Compaction.recoverRewrite(spark, s"$base/$t")
      recoverAside(graft.util.Fs.of(spark, s"$base/$t"), s"$base/$t", "bucket=")
    }
    val cents = spark.read.parquet(s"$base/centroids")
      .select(col("cent_id"), expr("graft_dense(v_c)").as("v_c"))
    val assigned = Embeddings.ivfAssign(delVecs, cents, 1)
      .select(col("vec_id").as("neighbor_id"), col("cent_id").cast("int").as("bucket"))
      .localCheckpoint() // delete-batch-sized
    val touched = collectInts(assigned, "bucket")
    val delIds = assigned.select("neighbor_id")
    for (t <- Seq("lists", "codes")) {
      val store = s"$base/$t"
      val part = spark.read.parquet(store)
        .where(col("bucket").isin(touched.map(v => v: Any): _*))
      publishTouched(spark, store, "bucket", touched,
        part.join(broadcast(delIds), Seq("neighbor_id"), "left_anti"))
    }
  }

  /** Gated end-to-end: clone the staged IVFADC index into a mutable
    * root, apply the delete with touched-cell repair, search. Must
    * equal the fresh-build oracle on the surviving corpus — exact
    * because the frozen quantizers are disjoint from the delete set,
    * so fresh lists/codes over survivors ARE the old tables minus the
    * deleted rows. */
  def storeDeleteIvfPq(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.L2Distance.register(spark)
    graft.functions.KnownNonNullElements.register(spark)
    val staged = StoredIndex.stageIvfPq(spark, dir)
    val base = java.nio.file.Files.createTempDirectory("graft_del_ivf").toString
    for (t <- Seq("centroids", "codebook"))
      spark.read.parquet(s"$staged/$t").write.mode("overwrite").parquet(s"$base/$t")
    for (t <- Seq("lists", "codes"))
      clonePartitioned(spark, s"$staged/$t", s"$base/$t", "bucket")
    deleteFromIvfPq(spark, base, Embeddings.vecs(spark, dir).where(delVecPred))
    searchIvfPq(spark, dir, base)
  }

  /** The unchanged staged-read ADC search over a repaired store
    * (self-healing a crashed compaction sweep first, like
    * [[graft.streaming.AnnStream.searchStore]]). */
  private[graft] def searchIvfPq(spark: SparkSession, dir: String,
      base: String): DataFrame = {
    graft.functions.KnownNonNullElements.register(spark)
    for (t <- Seq("lists", "codes"))
      graft.sources.Compaction.recoverRewrite(spark, s"$base/$t")
    val centroids = spark.read.parquet(s"$base/centroids")
      .select(col("cent_id"), expr("graft_dense(v_c)").as("v_c"))
    val codebook = spark.read.parquet(s"$base/codebook")
      .select(col("sub"), col("cent_id"), expr("graft_dense(cs)").as("cs"))
    StoredIndex.searchIndex(spark, dir, centroids, codebook,
      spark.read.parquet(s"$base/codes"), spark.read.parquet(s"$base/lists"))
  }

  // ------------------------------------------------------------- #118
  // kNN graph: drop deleted lists, rescore survivors that lost a
  // neighbor, carry the rest — touched label partitions only
  // ---------------------------------------------------------------

  /** Stage the DIRECTED top-5 list store + label-partitioned vector
    * store once per (fingerprint, sf dir) — the persisted state the
    * delete repairs (the [[graft.streaming.GraphStream]] store shape,
    * built one-shot at ingest). */
  private[graft] def stageDirectedTopk(spark: SparkSession, dir: String): String =
    Staging.stagedDir("graft_knn_directed", dir, "v1:k5:label-partitioned", "embeddings") { root =>
      graft.functions.BoundedTopK.register(spark)
      graft.functions.DotProduct.register(spark)
      val e = Embeddings.vecs(spark, dir)
      KnnGraph.directedTopk(KnnGraph.scoredPairs(
          KnnGraph.srcSide(e), KnnGraph.dstSide(e)))
        .repartition(col("label"))
        .write.partitionBy("label").parquet(s"$root/topk")
      e.repartition(col("label"))
        .write.partitionBy("label").parquet(s"$root/vecs")
    }

  /** Apply the delete set to a directed-list store at `base`. Only the
    * deleted vectors' label partitions are read (static partition
    * pruning) and rewritten; within one, survivors with a deleted
    * neighbor in their top-5 rescore against the surviving block, the
    * rest carry through verbatim. */
  private[graft] def deleteFromGraph(spark: SparkSession, base: String,
      delVecs: DataFrame): Unit = {
    graft.functions.BoundedTopK.register(spark)
    graft.functions.DotProduct.register(spark)
    graft.functions.KnownNonNullElements.register(spark)
    // recover any crashed swap BEFORE reading the store (see
    // deleteFromIvfPq); the repair itself is idempotent — re-deleting
    // absent rows and re-scoring already-repaired lists are no-ops
    for (t <- Seq("topk", "vecs"))
      recoverAside(graft.util.Fs.of(spark, s"$base/$t"), s"$base/$t", "label=")
    val del = delVecs.select("vec_id", "label").localCheckpoint()
    val touched = collectInts(del, "label")
    val touchedOnly = col("label").isin(touched.map(v => v: Any): _*)
    val delIds = del.select("vec_id")
    // the touched labels' stored lists, deleted sources dropped
    val surv = spark.read.parquet(s"$base/topk").where(touchedOnly)
      .join(broadcast(delIds.withColumnRenamed("vec_id", "src_id")),
        Seq("src_id"), "left_anti")
      .select("label", "src_id", "dst_id", "cos", "rank")
      .localCheckpoint() // consumed three times below
    // sources that LOST a neighbor — the only lists whose content moves
    val affected = surv
      .join(broadcast(delIds.withColumnRenamed("vec_id", "dst_id")),
        Seq("dst_id"), "left_semi")
      .select("label", "src_id").distinct()
    val carried = surv.join(broadcast(affected), Seq("label", "src_id"), "left_anti")
    // surviving block vectors of the touched labels (store-read arrays
    // re-densified for the scoring kernels)
    val survVecsRaw = spark.read.parquet(s"$base/vecs").where(touchedOnly)
      .join(broadcast(delIds), Seq("vec_id"), "left_anti")
    val survVecs = survVecsRaw.select(col("vec_id"), col("label"),
      expr("graft_dense(v)").as("v"), col("norm2"))
    val affVecs = survVecs.join(
      broadcast(affected.withColumnRenamed("src_id", "vec_id").select("vec_id")),
      Seq("vec_id"), "left_semi")
    val rescored = KnnGraph.directedTopk(KnnGraph.scoredPairs(
        KnnGraph.srcSide(affVecs), KnnGraph.dstSide(survVecs)))
      .select("label", "src_id", "dst_id", "cos", "rank")
    publishTouched(spark, s"$base/topk", "label", touched,
      carried.unionByName(rescored))
    publishTouched(spark, s"$base/vecs", "label", touched, survVecsRaw)
  }

  /** Gated end-to-end: clone the staged directed store, delete with
    * touched-label repair, serve the mutual-kNN edges. Equals the
    * fresh mutual-kNN build on the surviving corpus: rescored lists
    * are exact by construction, carried lists because dropping
    * candidates outside a top-5 cannot change it, and other labels
    * because candidates never cross label blocks. */
  def storeDeleteKnn(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.BoundedTopK.register(spark)
    graft.functions.DotProduct.register(spark)
    val staged = stageDirectedTopk(spark, dir)
    val base = java.nio.file.Files.createTempDirectory("graft_del_knn").toString
    for (t <- Seq("topk", "vecs"))
      clonePartitioned(spark, s"$staged/$t", s"$base/$t", "label")
    deleteFromGraph(spark, base, Embeddings.vecs(spark, dir).where(delVecPred))
    KnnGraph.mutualEdges(spark.read.parquet(s"$base/topk")
        .select("label", "src_id", "dst_id", "cos", "rank"))
      .orderBy("id_a", "id_b")
  }

  // ------------------------------------------------------------- #119
  // BM25: touched-term-bucket postings repair + derived recounts
  // ---------------------------------------------------------------

  /** Build the DELETABLE form of the BM25 index at `base`: postings
    * and df term-hash-bucketed (`tb=`), dl and the corpus-stat
    * PARTIALS doc-bucketed (`db=`). Differs from the 40w9 staged
    * store in exactly the ways deletion forces:
    *   - partitioned tables, so a delete rewrites touched buckets,
    *     never the store (at warehouse scale the bucket count grows
    *     with the corpus, holding per-bucket size constant — 16 here);
    *   - INTEGER df instead of materialized idf (deleting any doc
    *     moves N and therefore EVERY term's idf; df is local to its
    *     bucket and idf derives at query time, [[Hybrid.idfFromDf]],
    *     vocabulary-sized);
    *   - corpus stats as per-doc-bucket partials (n_docs, tot_tok per
    *     `db=`), summed at query time (≤ bucket-count rows), so every
    *     derived number repairs as a RECOUNT of repaired primary rows
    *     at touched-bucket granularity — idempotent by construction,
    *     which is what makes a crashed delete safe to re-run (a
    *     per-term subtraction would double-apply on the re-run). */
  private[graft] def buildBm25Store(spark: SparkSession, docs: DataFrame,
      base: String): Unit = {
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("t", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(hash(col("t")), lit(16)))
      .repartition(col("tb"))
      .write.partitionBy("tb").parquet(s"$base/postings")
    val postings = spark.read.parquet(s"$base/postings")
    // df carries its term's tb so a bucket recount replaces exactly
    // its own rows (terms never cross buckets: tb is a hash of t)
    postings.groupBy("tb", "t").agg(count(lit(1)).as("df"))
      .repartition(col("tb"))
      .write.partitionBy("tb").parquet(s"$base/df")
    postings.groupBy("doc_id").agg(sum("tf").as("dl"))
      .withColumn("db", pmod(col("doc_id"), lit(16L)).cast("int"))
      .repartition(col("db"))
      .write.partitionBy("db").parquet(s"$base/dl")
    spark.read.parquet(s"$base/dl")
      .groupBy("db").agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_tok"))
      .repartition(col("db"))
      .write.partitionBy("db").parquet(s"$base/stats")
  }

  /** Apply the delete set to a BM25 store at `base`: re-tokenize the
    * DELETED docs (delete-batch-sized — postings are term-keyed, so a
    * doc's rows are findable only through its own terms), drop their
    * rows from the touched term buckets, then RECOUNT df and the
    * stat partials for the touched buckets from the repaired primary
    * rows. Every step reads repaired state, so a crashed run re-runs
    * to the same store (spec-exercised via [[graft.util.PartitionSwap.crashPoint]]). */
  private[graft] def deleteFromBm25(spark: SparkSession, base: String,
      delDocs: DataFrame): Unit = {
    for ((t, p) <- Seq("postings" -> "tb=", "df" -> "tb=",
        "dl" -> "db=", "stats" -> "db="))
      recoverAside(graft.util.Fs.of(spark, s"$base/$t"), s"$base/$t", p)
    val delToks = delDocs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("t", "doc_id").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // delete-batch-sized, consumed below
    val touchedTb = collectInts(
      delToks.select(pmod(hash(col("t")), lit(16)).as("tb")), "tb")
    val tbOnly = col("tb").isin(touchedTb.map(v => v: Any): _*)
    val delIds = delToks.select("doc_id").distinct()
    publishTouched(spark, s"$base/postings", "tb", touchedTb,
      spark.read.parquet(s"$base/postings").where(tbOnly)
        .join(broadcast(delIds), Seq("doc_id"), "left_anti"))
    // df: recount the touched buckets from the REPAIRED postings —
    // terms whose last doc died vanish, exactly like a fresh build's
    publishTouched(spark, s"$base/df", "tb", touchedTb,
      spark.read.parquet(s"$base/postings").where(tbOnly)
        .groupBy("tb", "t").agg(count(lit(1)).as("df")))
    val touchedDb = collectInts(
      delIds.select(pmod(col("doc_id"), lit(16L)).as("db")), "db")
    val dbOnly = col("db").isin(touchedDb.map(v => v: Any): _*)
    publishTouched(spark, s"$base/dl", "db", touchedDb,
      spark.read.parquet(s"$base/dl").where(dbOnly)
        .join(broadcast(delIds), Seq("doc_id"), "left_anti"))
    // stats: recount the touched buckets' partials from repaired dl
    publishTouched(spark, s"$base/stats", "db", touchedDb,
      spark.read.parquet(s"$base/dl").where(dbOnly)
        .groupBy("db").agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_tok")))
  }

  /** Gated end-to-end: build the deletable BM25 store, apply the
    * delete with touched-bucket repair, score the standard probes.
    * Equals the fresh BM25 build on the surviving corpus: postings/dl
    * rows are the survivors' rows, df and the stats are recounts of
    * those rows, and idf re-derives from (df, N) through the same
    * expression both builds share. */
  def storeDeleteBm25(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.BoundedTopK.register(spark)
    val base = java.nio.file.Files.createTempDirectory("graft_del_bm25").toString
    buildBm25Store(spark, Tables.documents(spark, dir), base)
    deleteFromBm25(spark, base,
      Tables.documents(spark, dir).where(delDocPred))
    searchBm25(spark, dir, base)
  }

  /** Score the standard probes from a (possibly repaired) store. The
    * corpus stats are the sum of the per-bucket partials — at most
    * bucket-count rows. */
  private[graft] def searchBm25(spark: SparkSession, dir: String,
      base: String): DataFrame = {
    val stats = spark.read.parquet(s"$base/stats")
      .agg(sum("n_docs"), sum("tot_tok")).head()
    val nDocs = stats.getLong(0)
    Hybrid.bm25FromTables(spark, dir,
      spark.read.parquet(s"$base/postings").drop("tb"),
      spark.read.parquet(s"$base/dl").drop("db"),
      Hybrid.idfFromDf(spark.read.parquet(s"$base/df").drop("tb"), nDocs),
      nDocs, stats.getLong(1))
  }

  // ---------------------------------------------------------------
  // oracles: the UNCHANGED full-recompute SQL of each family with its
  // corpus CTE filtered to the survivors — generated by rewrite so the
  // index arithmetic can never fork from the gated twins.
  // ---------------------------------------------------------------

  private def survivorsVecRewrite(oracle: String): String = {
    val prefix = s"WITH e AS (${Embeddings.vecsSql}),"
    require(oracle.startsWith(prefix),
      "oracle shape changed — update the survivor rewrite")
    s"""WITH e0 AS (${Embeddings.vecsSql}),
       |e AS (SELECT * FROM e0 WHERE vec_id % 17 <> 14),""".stripMargin +
      oracle.stripPrefix(prefix)
  }

  private[graft] val storeDeleteIvfPqOracle: String =
    survivorsVecRewrite(Embeddings.annIvfPqTopKOracle)

  private[graft] val storeDeleteKnnOracle: String =
    survivorsVecRewrite(KnnGraph.knnGraphOracle)

  private[graft] val storeDeleteBm25Oracle: String = {
    require(Hybrid.bm25Oracle.startsWith("WITH tok AS ("),
      "bm25 oracle shape changed — update the survivor rewrite")
    "WITH docs AS (SELECT * FROM documents WHERE doc_id % 13 <> 5),\n" +
      Hybrid.bm25Oracle.stripPrefix("WITH ").replace("FROM documents", "FROM docs")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "store_delete_ivfpq" -> (storeDeleteIvfPq _),
    "store_delete_knn" -> (storeDeleteKnn _),
    "store_delete_bm25" -> (storeDeleteBm25 _))

  val oracles: Map[String, String] = Map(
    "store_delete_ivfpq" -> storeDeleteIvfPqOracle,
    "store_delete_knn" -> storeDeleteKnnOracle,
    "store_delete_bm25" -> storeDeleteBm25Oracle)
}
