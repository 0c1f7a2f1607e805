package graft.similarity

import graft.util.{DeleteLog, ManifestStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** THE persisted BM25 index layout — one deletable, bucketed,
  * manifest-committed store behind every lexical-index query: the
  * staged read path (`retrieve_bm25_stored`), the live append twin
  * (`stream_bm25_postings`), its compaction (`stream_bm25_compacted`),
  * the delete repair (`store_delete_bm25`), and the full live
  * choreography (`stream_bm25_deleted`). Previous rounds carried three
  * store shapes (flat staged, flat streaming, bucketed deletable);
  * this converges them on the one layout deletion forces:
  *
  *   postings  `tb=<hash(t)%16>/`  (t, doc_id, tf)
  *   dl        `db=<doc_id%16>/`   (doc_id, dl, batch_key)
  *   stats     `db=<doc_id%16>/`   (batch_key, n_docs, tot_tok)
  *
  *   - TERM-HASH-BUCKETED postings: a delete rewrites touched buckets,
  *     never the store; a query's term probe prunes to its terms'
  *     buckets (static partition pruning — at warehouse scale the
  *     bucket count grows with the corpus, holding per-bucket size
  *     constant, and a query touches O(its terms) buckets).
  *   - NO MATERIALIZED df/idf: idf depends on N, which every delete
  *     moves for EVERY term — and df(t) is the length of t's posting
  *     list, which the query reads IN FULL anyway (the index probe),
  *     so df falls out of the probed rows as a COUNT and idf derives
  *     from (df, N) at query time ([[Hybrid.idfFromDf]]). The previous
  *     layout's stored-df table repaired exactly to this recount —
  *     storing it bought nothing but repair surface.
  *   - dl carries one row for EVERY document (dl = 0 for a token-less
  *     doc) so N = count(dl) stays exact, plus the BATCH KEY of the
  *     trigger that ingested it.
  *   - stats rows are per-(db, batch_key) PARTIALS: exactly the
  *     count/sum of the CURRENT dl rows of that batch in that bucket.
  *     N and tot_tok are their sums (metadata-sized: buckets ×
  *     batches; a deployment folds old batches together in the
  *     compaction sweep). The batch key is what makes the maintenance
  *     algebra exact under BOTH at-least-once re-delivery and
  *     interleaved deletes: an append gates per (db, batch_key)
  *     anti-join, and a delete RECOUNTS touched db buckets from the
  *     repaired dl GROUPED BY batch_key — so a re-delivered batch
  *     whose stats were already absorbed (even if a delete has since
  *     shrunk them) is dropped by the gate, while a batch whose crash
  *     predates its dl rows re-appends exactly its surviving docs.
  *
  * All three tables are [[ManifestStore]]s: deletes/compactions
  * publish snapshot-isolated manifest versions; appends are gated on
  * full row keys ((t, doc_id) / (doc_id) / (db, batch_key)), so a
  * crash inside any multi-file append commit self-heals on
  * re-delivery. Every delete lands in the store's [[DeleteLog]]
  * first, gating later-arriving batches (deletion durability across
  * ingest).
  *
  * Reference: signalk-parquet has no lexical index; this is the
  * LLM-pipeline retrieval leg at its operational composition.
  */
object Bm25Store {

  private val Buckets = 16

  private[graft] val postingsSchema = StructType(Seq(
    StructField("t", StringType), StructField("doc_id", LongType),
    StructField("tf", LongType), StructField("tb", IntegerType)))
  private[graft] val dlSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("dl", LongType),
    StructField("batch_key", LongType), StructField("db", IntegerType)))
  private[graft] val statsSchema = StructType(Seq(
    StructField("batch_key", LongType), StructField("n_docs", LongType),
    StructField("tot_tok", LongType), StructField("db", IntegerType)))

  private def tbOf(t: org.apache.spark.sql.Column) = pmod(hash(t), lit(Buckets))
  private def dbOf(d: org.apache.spark.sql.Column) =
    pmod(d, lit(Buckets.toLong)).cast("int")

  private[graft] def readPostings(spark: SparkSession, base: String): DataFrame =
    ManifestStore.read(spark, s"$base/postings", postingsSchema)
  private[graft] def readDl(spark: SparkSession, base: String): DataFrame =
    ManifestStore.read(spark, s"$base/dl", dlSchema)
  private[graft] def readStats(spark: SparkSession, base: String): DataFrame =
    ManifestStore.read(spark, s"$base/stats", statsSchema)

  /** A doc batch's (t, doc_id, tf, tb) posting rows. */
  private def tokensOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("t", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("tb", tbOf(col("t")))

  /** A doc batch's dl rows — one per document, 0 for token-less docs
    * (N must count every doc), stamped with the ingesting batch. */
  private def dlOf(docs: DataFrame, toks: DataFrame, batchKey: Long): DataFrame =
    docs.select("doc_id")
      .join(toks.groupBy("doc_id").agg(sum("tf").as("dl")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("dl"), lit(0L)).as("dl"),
        lit(batchKey).as("batch_key"), dbOf(col("doc_id")).as("db"))

  private def statsOf(dlRows: DataFrame): DataFrame =
    dlRows.groupBy("db", "batch_key")
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_tok"))
      .select("batch_key", "n_docs", "tot_tok", "db")

  private def collectInts(df: DataFrame, c: String): Seq[Int] =
    df.select(col(c).cast("int")).distinct().collect().map(_.getInt(0)).sorted.toSeq

  // ---------------------------------------------------------------
  // build / clone
  // ---------------------------------------------------------------

  /** One-shot batch build (the staged-store writer): every row under
    * batch_key 0. */
  private[graft] def build(spark: SparkSession, docs: DataFrame,
      base: String): Unit = {
    val toks = tokensOf(docs).localCheckpoint()
    ManifestStore.append(spark, s"$base/postings", "tb", toks)
    val dl = dlOf(docs, toks, 0L).localCheckpoint()
    ManifestStore.append(spark, s"$base/dl", "db", dl)
    ManifestStore.append(spark, s"$base/stats", "db", statsOf(dl))
  }

  /** Clone a staged (immutable, fingerprint-shared) store into a
    * mutable root. */
  private[graft] def cloneStore(spark: SparkSession, staged: String): String = {
    val base = java.nio.file.Files.createTempDirectory("graft_bm25_mut").toString
    ManifestStore.append(spark, s"$base/postings", "tb", readPostings(spark, staged))
    ManifestStore.append(spark, s"$base/dl", "db", readDl(spark, staged))
    ManifestStore.append(spark, s"$base/stats", "db", readStats(spark, staged))
    base
  }

  // ---------------------------------------------------------------
  // live maintenance
  // ---------------------------------------------------------------

  /** One trigger's ingest — idempotent under at-least-once re-delivery
    * (full-row-key gates per table; stats committed FIRST so a crash
    * between the three appends re-runs to the same store) and durable
    * against deletions (the [[DeleteLog]] gate). Cost: O(|batch|)
    * deltas + bucket-pruned gate reads. */
  private[graft] def appendBatch(sp: SparkSession, base: String,
      batchDocs: DataFrame, batchKey: Long): Unit = {
    val live = DeleteLog.gate(sp, base, batchDocs, "doc_id")
    // batch-sized frames, deliberately NOT checkpointed: re-deriving
    // them inside each table's single write job is cheaper than extra
    // materialization jobs on this per-trigger hot path
    val toks = tokensOf(live)
    val dl = dlOf(live, toks, batchKey)
    // ONE driver pass collects both touched-bucket sets (the only
    // data-dependent facts the choreography needs)
    val touched = live
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .select(dbOf(col("doc_id")).as("db"),
        array_distinct(transform(col("ts"), t => pmod(hash(t), lit(Buckets)))).as("tbs"))
      .groupBy("db").agg(array_distinct(flatten(collect_list("tbs"))).as("tbs"))
      .collect()
    val dbs = touched.map(_.getInt(0)).toSeq.sorted
    val tbs = touched.flatMap(_.getSeq[Int](1)).distinct.sorted.toSeq
    // stats first: its (db, batch_key) gate is what lets a re-run know
    // the batch's counts were already absorbed
    ManifestStore.appendTouched(sp, s"$base/stats", "db", dbs.map(v => v: Any),
      statsOf(dl).join(readStats(sp, base).select("db", "batch_key"),
        Seq("db", "batch_key"), "left_anti"))
    if (tbs.nonEmpty) {
      val storedP = readPostings(sp, base)
        .where(col("tb").isin(tbs.map(v => v: Any): _*))
      ManifestStore.appendTouched(sp, s"$base/postings", "tb", tbs.map(v => v: Any),
        toks.join(storedP.select("t", "doc_id"), Seq("t", "doc_id"), "left_anti"))
    }
    if (dbs.nonEmpty) {
      val storedD = readDl(sp, base)
        .where(col("db").isin(dbs.map(v => v: Any): _*))
      ManifestStore.appendTouched(sp, s"$base/dl", "db", dbs.map(v => v: Any),
        dl.join(storedD.select("doc_id"), Seq("doc_id"), "left_anti"))
    }
  }

  /** Apply a delete set: log first (durable against later ingest),
    * then rewrite ONLY the touched buckets — postings lose the deleted
    * docs' rows (found by re-tokenizing the DELETED docs:
    * delete-batch-sized, the store is never scanned), dl loses their
    * rows, and the touched db buckets' stats RECOUNT from the repaired
    * dl grouped by batch_key (integer-exact, idempotent — a crashed
    * re-run recounts to the same rows, never double-applies a
    * subtraction). */
  private[graft] def delete(spark: SparkSession, base: String,
      delDocs: DataFrame): Unit = {
    DeleteLog.append(spark, base, delDocs.select("doc_id"))
    val delToks = tokensOf(delDocs).localCheckpoint()
    val delIds = delDocs.select("doc_id").distinct().localCheckpoint()
    val touchedTb = collectInts(delToks, "tb")
    if (touchedTb.nonEmpty) {
      val tbIn = col("tb").isin(touchedTb.map(v => v: Any): _*)
      ManifestStore.rewriteTouched(spark, s"$base/postings", "tb",
        touchedTb.map(v => v: Any),
        readPostings(spark, base).where(tbIn)
          .join(broadcast(delIds), Seq("doc_id"), "left_anti"))
    }
    val touchedDb = collectInts(delIds.select(dbOf(col("doc_id")).as("db")), "db")
    if (touchedDb.nonEmpty) {
      val dbIn = col("db").isin(touchedDb.map(v => v: Any): _*)
      ManifestStore.rewriteTouched(spark, s"$base/dl", "db",
        touchedDb.map(v => v: Any),
        readDl(spark, base).where(dbIn)
          .join(broadcast(delIds), Seq("doc_id"), "left_anti"))
      // recount (not subtract) the touched buckets' partials from the
      // REPAIRED dl, batch keys preserved for the append gate
      ManifestStore.rewriteTouched(spark, s"$base/stats", "db",
        touchedDb.map(v => v: Any),
        statsOf(readDl(spark, base).where(dbIn)))
    }
  }

  /** The scheduled small-file sweep (per-trigger appends leave one
    * file set per (trigger, bucket)): each bucket collapses to one
    * sorted file, manifest-committed, result-invisible. */
  private[graft] def compact(spark: SparkSession, base: String): Unit = {
    ManifestStore.compact(spark, s"$base/postings", "tb",
      Seq("t", "doc_id"), postingsSchema)
    ManifestStore.compact(spark, s"$base/dl", "db",
      Seq("doc_id"), dlSchema)
    ManifestStore.compact(spark, s"$base/stats", "db",
      Seq("batch_key"), statsSchema)
  }

  // ---------------------------------------------------------------
  // query
  // ---------------------------------------------------------------

  /** Score the standard probes from the store. The probe reads ONLY
    * its terms' buckets (static partition pruning on tb); df(t) falls
    * out of the probed posting lists as a count; N/avgdl are the sums
    * of the metadata-sized stats partials; idf derives from (df, N) at
    * query time — so every statistic is exact over whatever
    * append/delete history produced the store. */
  private[graft] def score(spark: SparkSession, dir: String,
      base: String): DataFrame = {
    graft.functions.BoundedTopK.register(spark)
    val st = readStats(spark, base)
      .agg(sum("n_docs"), sum("tot_tok")).head()
    val (nDocs, totTok) = (st.getLong(0), st.getLong(1))
    val probeTerms = Hybrid.probeTermsOf(spark, dir)
    val qTerms = probeTerms.select("t").distinct()
    // query-term buckets are driver-computable (hash of the query's
    // own literals) — the probed scan lists only those tb= dirs
    val bkts = qTerms.select(tbOf(col("t")).as("tb")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val probed = readPostings(spark, base)
      .where(col("tb").isin(bkts.map(v => v: Any): _*))
      .join(broadcast(qTerms), Seq("t"))
      .drop("tb")
      .localCheckpoint() // probe-list-sized; feeds df AND the scoring
    val dfTab = probed.groupBy("t").agg(count(lit(1)).as("df"))
    Hybrid.bm25FromTables(spark, dir, probed,
      readDl(spark, base).select("doc_id", "dl"),
      Hybrid.idfFromDf(dfTab, nDocs), nDocs, totTok)
  }
}
