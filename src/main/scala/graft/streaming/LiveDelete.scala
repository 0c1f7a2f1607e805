package graft.streaming

import graft.similarity.{Bm25Store, DeleteRepair, Embeddings, GraphStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deletion gated against the LIVE streaming-maintained stores, in the
  * production sequence a real deployment runs it: ingest triggers →
  * a GDPR/retention delete → MORE ingest triggers → the scheduled
  * compaction sweep → serve. One gated query per store family
  * (IVFADC, kNN graph, BM25), each ending bit-equal to the
  * full-recompute oracle over the SURVIVING corpus — which pins all
  * three legs of deletion durability at once:
  *
  *   - rows ingested BEFORE the delete are repaired out of the store
  *     (the [[DeleteRepair]] touched-partition repairs, run here
  *     against the trigger-built multi-file stores, mid-stream);
  *   - rows arriving AFTER the delete never enter it (every ingest
  *     batch gates on the store's [[graft.util.DeleteLog]] — without
  *     this, the triggers→delete→triggers sequence silently resurrects
  *     any deleted id whose source row lands late);
  *   - the compaction sweep carries the deletion through its rewrite
  *     (it compacts the committed survivor snapshot).
  *
  * The two-phase drain shares ONE streaming checkpoint, so the second
  * drain resumes exactly where the first stopped — the same query,
  * interrupted by maintenance, as in production. Specs additionally
  * pin ordering convergence (delete-then-append ≡ append-then-delete)
  * per family.
  *
  * Reference: signalk-parquet's retention (utils/retention-rules.ts)
  * deletes raw partitions only; composing deletion with live derived
  * stores is the training-pipeline extension's operational leg.
  */
object LiveDelete {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** Write phase-1 (ids < boundary, two trigger files) into `srcDir`;
    * returns the boundary. Phase 2 appends the remainder later. */
  private def stagePhase1(df: DataFrame, idCol: String, srcDir: String): Long = {
    val n = df.count()
    val boundary = df.select(idCol).orderBy(col(idCol))
      .limit((n * 2 / 3).toInt).agg(max(idCol)).head().getLong(0) + 1
    df.where(col(idCol) < boundary)
      .repartitionByRange(2, col(idCol))
      .write.mode("append").parquet(srcDir)
    boundary
  }

  private def stagePhase2(df: DataFrame, idCol: String, boundary: Long,
      srcDir: String): Unit =
    df.where(col(idCol) >= boundary).coalesce(1)
      .write.mode("append").parquet(srcDir)

  // -------------------------------------------------------------- #122
  /** IVFADC: two trigger batches → delete (touched-cell repair + log)
    * → the remaining batch (its deleted ids gated out) → per-cell
    * compaction sweep → ADC search ≡ fresh index on the survivors. */
  def streamAnnIvfPqDeleted(spark: SparkSession, dir: String): DataFrame =
    AnnStream.searchStore(spark, dir, builtAnnDeletedStore(spark, dir))

  /** The store builder, exposed so the spec can assert on the final
    * store state (post-delete arrivals gated, compaction carried). */
  private[graft] def builtAnnDeletedStore(spark: SparkSession, dir: String): String = {
    graft.functions.L2Distance.register(spark)
    graft.functions.KnownNonNullElements.register(spark)
    val emb = graft.Tables.embeddings(spark, dir)
    val srcDir = tmp("graft_lived_ann_src")
    val base = tmp("graft_lived_ann_store")
    val ckpt = Some(tmp("graft_lived_ann_ckpt"))
    val boundary = stagePhase1(emb, "vec_id", srcDir)
    AnnStream.buildStore(spark, dir, srcDir, emb.schema, base, ckpt)
    DeleteRepair.deleteFromIvfPq(spark, base,
      Embeddings.vecsOf(graft.Tables.embeddings(spark, dir)).where(DeleteRepair.delVecPred))
    stagePhase2(emb, "vec_id", boundary, srcDir)
    AnnStream.buildStore(spark, dir, srcDir, emb.schema, base, ckpt)
    AnnStream.compactIndexStore(spark, base)
    base
  }

  // -------------------------------------------------------------- #123
  /** kNN graph: the same choreography on the directed-list store —
    * the delete rescores survivors that lost a neighbor, later
    * triggers keep repairing the survivor lists (the mergeable top-k
    * carry), and the served mutual edges equal the fresh build on the
    * surviving corpus. */
  def streamKnnGraphDeleted(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.BoundedTopK.register(spark)
    graft.functions.DotProduct.register(spark)
    graft.functions.KnownNonNullElements.register(spark)
    val emb = graft.Tables.embeddings(spark, dir)
    val srcDir = tmp("graft_lived_knn_src")
    val base = tmp("graft_lived_knn_store")
    val ckpt = Some(tmp("graft_lived_knn_ckpt"))
    val boundary = stagePhase1(emb, "vec_id", srcDir)
    GraphStream.buildStore(spark, dir, srcDir, emb.schema, base, ckpt)
    DeleteRepair.deleteFromGraph(spark, base,
      Embeddings.vecsOf(graft.Tables.embeddings(spark, dir)).where(DeleteRepair.delVecPred))
    stagePhase2(emb, "vec_id", boundary, srcDir)
    GraphStream.buildStore(spark, dir, srcDir, emb.schema, base, ckpt)
    GraphStream.compactGraphStore(spark, base)
    GraphStore.mutualFromTopk(GraphStream.readTopk(spark, base))
      .orderBy("id_a", "id_b")
  }

  // -------------------------------------------------------------- #124
  /** BM25: postings/dl/stats maintained through trigger appends, a
    * mid-stream delete (touched-bucket repair + per-(db, batch)
    * stats recount), the remaining docs (deleted ids gated), the
    * bucket compaction sweep, then scoring ≡ the fresh index on the
    * surviving docs. */
  def streamBm25Deleted(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.BoundedTopK.register(spark)
    val docs = graft.Tables.documents(spark, dir)
    val srcDir = tmp("graft_lived_bm_src")
    val base = tmp("graft_lived_bm_store")
    val ckpt = Some(tmp("graft_lived_bm_ckpt"))
    val boundary = stagePhase1(docs, "doc_id", srcDir)
    KmvStream.drainBm25Into(spark, srcDir, docs.schema, base, ckpt)
    Bm25Store.delete(spark, base, docs.where(DeleteRepair.delDocPred))
    stagePhase2(docs, "doc_id", boundary, srcDir)
    KmvStream.drainBm25Into(spark, srcDir, docs.schema, base, ckpt)
    Bm25Store.compact(spark, base)
    Bm25Store.score(spark, dir, base)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_ann_ivfpq_deleted" -> (streamAnnIvfPqDeleted _),
    "stream_knn_graph_deleted" -> (streamKnnGraphDeleted _),
    "stream_bm25_deleted" -> (streamBm25Deleted _))

  /** Every family's answer must equal the FRESH full-recompute oracle
    * on the surviving corpus — the same survivor rewrites as the
    * store_delete_* twins (deletion is durable across arrival order,
    * later ingest, and compaction; nothing else may change). */
  val oracles: Map[String, String] = Map(
    "stream_ann_ivfpq_deleted" -> DeleteRepair.storeDeleteIvfPqOracle,
    "stream_knn_graph_deleted" -> DeleteRepair.storeDeleteKnnOracle,
    "stream_bm25_deleted" -> DeleteRepair.storeDeleteBm25Oracle)
}
