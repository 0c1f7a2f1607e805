package graft.streaming

import graft.dedup.KmvOverlap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Live corpus-overlap maintenance — the streaming twin of
  * [[KmvOverlap.kmvOverlap]]: per-source KMV bottom-k sketches kept
  * current as document batches arrive, so the "how much does the
  * incoming crawl overlap what we hold" answer is always one
  * metadata-sized estimator pass away (ingest gating at 100 TB/day
  * can't afford a corpus rescan per decision).
  *
  * Shape: the [[Streaming.streamHll]] sketch-store discipline — each
  * micro-batch reduces to its OWN per-source bottom-k delta (the
  * [[graft.functions.KmvSketch graft_kmv]] partial aggregate, ≤ k
  * longs per source per map task), which merges into the persisted
  * sketch store by union-and-resketch: bottom-k is a MERGEABLE
  * synopsis — k-smallest-distinct(K(A) ∪ K(B)) = K(A ∪ B) — so
  * trigger-at-a-time maintenance is bit-equal to the one-shot batch
  * sketch over the concatenated slices, and the BATCH oracle carries
  * over verbatim. The store is S rows × ≤ k longs, independent of
  * throughput; the raw stream is never retained. Store swaps are
  * atomic per trigger (the tier-maintenance discipline).
  */
object KmvStream {

  // -------------------------------------------------------------- #101
  def streamKmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.NGrams.register(spark)
    graft.functions.PolyHash.register(spark)
    graft.functions.KmvSketch.register(spark)
    val docs = graft.Tables.documents(spark, dir)
    // three doc_id-range slices, one file per trigger (the
    // streamDedupLsh staging; slice order is immaterial here — the
    // sketch union is fully order-free)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_kmv_src").toString
    docs.repartitionByRange(3, col("doc_id"))
      .write.mode("overwrite").parquet(srcDir)
    val base = java.nio.file.Files.createTempDirectory("graft_kmv_store").toString
    val store = base + "/sketches"
    val fs = graft.util.Fs.of(spark, base)
    def swap(tmp: String, dst: String): Unit = {
      fs.delete(new org.apache.hadoop.fs.Path(dst), true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(dst))
    }
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        graft.functions.NGrams.register(sp)
        graft.functions.PolyHash.register(sp)
        graft.functions.KmvSketch.register(sp)
        val delta = KmvOverlap.sketches(batch)
        val merged =
          if (fs.exists(new org.apache.hadoop.fs.Path(store)))
            // union-and-resketch: explode both ≤k-long arrays and fold
            // them back through graft_kmv — the bounded sketch union
            sp.read.parquet(store).unionByName(delta)
              .select(col("source"), explode(col("sk")).as("h"))
              .groupBy("source")
              .agg(expr(s"graft_kmv(h, ${KmvOverlap.K})").as("sk"))
          else delta
        val tmp = store + "_next"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        swap(tmp, store)
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ckpt_kmv").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    KmvOverlap.estimator(spark.read.parquet(store))
  }

  // -------------------------------------------------------------- #109
  /** Live lexical-index maintenance — the streaming twin of
    * [[graft.similarity.Hybrid.bm25Stored]]: the postings / doc-length
    * stores kept current as document batches arrive. Documents are
    * append-only, so each micro-batch's (term, doc, tf) delta and
    * (doc, dl) delta UNION into the stores with no key collisions —
    * the real ingest shape of a live inverted index (posting appends;
    * compaction is the existing [[graft.sources.Compaction]] seam).
    * idf and corpus stats are VOCABULARY-sized derivations recomputed
    * from the store at query time, so the drained answer is
    * bit-identical to the one-shot batch build and the 40w8 oracle
    * carries verbatim (spec-pinned against [[Hybrid.bm25]]). Store
    * growth is corpus-proportional (it IS the index), never
    * throughput-bounded; the raw stream is not retained. */
  def streamBm25Postings(spark: SparkSession, dir: String): DataFrame =
    scoreBm25Store(spark, dir, buildBm25Store(spark, dir))

  /** The 42s append store run through its named compaction seam
    * before serving: per-trigger appends leave one small parquet file
    * pair per trigger; [[graft.sources.Compaction.compactStore]]
    * rewrites the postings into few term-sorted files under the 28d
    * rename-aside crash-safe publish, and the compacted index must
    * answer IDENTICALLY (same 40w8 oracle — compaction is
    * result-invisible by contract). */
  def streamBm25Compacted(spark: SparkSession, dir: String): DataFrame = {
    val base = buildBm25Store(spark, dir)
    graft.sources.Compaction.compactStore(spark, s"$base/postings",
      Seq("t", "doc_id"), nFiles = 2)
    graft.sources.Compaction.compactStore(spark, s"$base/stats",
      Seq("n_docs"), nFiles = 1)
    scoreBm25Store(spark, dir, base)
  }

  /** Drain the corpus into a fresh postings/stats store; returns its
    * base dir (separated from scoring so the compacted twin and the
    * spec can operate on the store between build and serve). */
  private[graft] def buildBm25Store(spark: SparkSession, dir: String): String = {
    graft.functions.BoundedTopK.register(spark)
    val docs = graft.Tables.documents(spark, dir)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_bm25_src").toString
    docs.repartitionByRange(3, col("doc_id"))
      .write.mode("overwrite").parquet(srcDir)
    val base = java.nio.file.Files.createTempDirectory("graft_bm25_store").toString
    val postStore = base + "/postings"
    val statStore = base + "/stats"
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // append-only postings: new docs cannot collide with stored
        // (term, doc) keys, so the merge is a plain partitioned append
        batch.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
          .groupBy("t", "doc_id").agg(count(lit(1)).as("tf"))
          .write.mode("append").parquet(postStore)
        // corpus doc count accumulated per batch FROM THE BATCH, not
        // re-derived from postings at drain: a NULL/empty-text document
        // (dropped by the explode) still counts toward N in idf/avgdl,
        // exactly as the batch twin's docs.count() does
        batch.agg(count(lit(1)).as("n_docs"))
          .write.mode("append").parquet(statStore)
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ckpt_bm25").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    base
  }

  /** Serve the 40w8 ranking from a (streamed, possibly compacted)
    * postings/stats store. */
  private[graft] def scoreBm25Store(spark: SparkSession, dir: String,
      base: String): DataFrame = {
    graft.functions.BoundedTopK.register(spark)
    val postings = spark.read.parquet(s"$base/postings")
    val dl = postings.groupBy("doc_id").agg(sum("tf").as("dl"))
    val nDocs = spark.read.parquet(s"$base/stats")
      .agg(sum("n_docs")).head().getLong(0)
    val totTok = dl.agg(sum("dl")).head().getLong(0)
    graft.similarity.Hybrid.bm25FromIndex(spark, dir, postings, dl, nDocs, totTok)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_kmv_overlap" -> (streamKmvOverlap _),
    "stream_bm25_postings" -> (streamBm25Postings _),
    "stream_bm25_compacted" -> (streamBm25Compacted _))

  val oracles: Map[String, String] = Map(
    // bottom-k union-merge is associative over any slicing of the
    // corpus, so the batch oracle carries verbatim
    "stream_kmv_overlap" -> KmvOverlap.kmvOverlapOracle,
    // append-only postings partition the corpus by batch, so the
    // one-shot lexical-index oracle carries verbatim
    "stream_bm25_postings" -> graft.similarity.Hybrid.bm25Oracle,
    // compaction is result-invisible: same rows, fewer files
    "stream_bm25_compacted" -> graft.similarity.Hybrid.bm25Oracle)
}
