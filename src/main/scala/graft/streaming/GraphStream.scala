package graft.streaming

import graft.similarity.{Embeddings, GraphStore, KnnGraph}
import graft.util.{DeleteLog, ManifestStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Incremental kNN-graph maintenance — the streaming twin of
  * [[GraphStore]]'s staged mutual-kNN graph: a new-vector batch inserts
  * its own edges AND repairs the affected old nodes' mutual ranks
  * without ever re-scoring the corpus against itself.
  *
  * Why this is exact (not approximate): the maintained state is each
  * node's DIRECTED top-5 list, and a bounded top-k over statically
  * scored candidates is a mergeable synopsis —
  * top5(S ∪ B) = top5(top5(S) ∪ scores(·,B)) — so re-collapsing the
  * carried lists with the batch's new scores reproduces the one-shot
  * lists bit-for-bit, and the mutual filter (a node-scale self-join)
  * follows. A new vector CAN evict an old node's 5th neighbor, which
  * breaks that old pair's mutuality: carrying the mutual edge set alone
  * would be lossy; carrying directed lists makes the repair exact
  * (GraphStreamSpec exercises an eviction across triggers).
  *
  * TOUCHED-PARTITION repair: candidates are generated strictly inside
  * label blocks (the kNN blocking — the IVF cell at warehouse scale),
  * so a trigger can only change lists of nodes whose label appears in
  * the batch; every other label's lists are provably fixed points
  * (top5(S ∪ ∅) = S). Both stores are therefore PARTITIONED BY label
  * (`label=<block>/`, the [[AnnStream]] cell-dir discipline) and each
  * trigger (a) reads ONLY the touched label partitions of the vector
  * and list stores (static partition pruning on the batch's label
  * set), (b) re-collapses only those nodes, and (c) publishes ONLY the
  * touched `label=` dirs' replacement files through the
  * [[ManifestStore]] snapshot commit — a reader concurrent with the
  * trigger sees the previous committed graph in full, never an absent
  * partition, and a crashed trigger's uncommitted files are invisible
  * orphans the re-run clears. Untouched partitions are never listed,
  * read, re-collapsed, or rewritten (GraphStreamSpec pins this with a
  * file-listing assertion on a 1-label trigger).
  *
  * Per-trigger cost: the batch scores against the label-blocked store
  * — O(|batch| · block), the [[graft.dedup.LshStore]] (29b/42h)
  * batch-vs-store discipline — plus a TOUCHED-NODE heap re-collapse
  * and a touched-partition publish; corpus × corpus scoring never runs
  * after ingest and write amplification per trigger is O(touched
  * blocks), not O(corpus). State: ≤ 5 rows per node (the directed
  * lists) + the vector store the warehouse holds anyway; both
  * label-partitioned manifest stores.
  *
  * Drain ≡ one-shot [[KnnGraph.knnGraph]] (bit-equal spec) and the
  * full-recompute mutual-kNN oracle carries verbatim.
  */
object GraphStream {

  /** Explicit store schemas: manifest reads pin the partition column's
    * type and make an EMPTY store (bootstrap trigger) read as an empty
    * frame. `label` last = the partition column position. */
  private[graft] val topkSchema = StructType(Seq(
    StructField("src_id", LongType), StructField("dst_id", LongType),
    StructField("cos", DoubleType), StructField("rank", IntegerType),
    StructField("label", IntegerType)))
  private[graft] val vecsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("v", ArrayType(DoubleType)),
    StructField("norm2", DoubleType),
    StructField("label", IntegerType)))

  // -------------------------------------------------------------- #114
  def streamKnnGraph(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.BoundedTopK.register(spark)
    graft.functions.DotProduct.register(spark)
    val emb = graft.Tables.embeddings(spark, dir)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_graph_src").toString
    emb.repartitionByRange(3, col("vec_id"))
      .write.mode("overwrite").parquet(srcDir)
    val base = java.nio.file.Files.createTempDirectory("graft_graph_store").toString
    buildStore(spark, dir, srcDir, emb.schema, base)
    // serve from the maintained store: mutual filter + presentation sort
    GraphStore.mutualFromTopk(readTopk(spark, base))
      .orderBy("id_a", "id_b")
  }

  private[graft] def readTopk(spark: SparkSession, base: String): DataFrame =
    ManifestStore.readTable(spark, base, "topk", topkSchema)
      .select("label", "src_id", "dst_id", "cos", "rank")

  /** The raw (vec_id, v, norm2, label) snapshot — `v` still the
    * parquet-loaded nullable array (consumers `graft_dense` it). */
  private[graft] def readVecsRaw(spark: SparkSession, base: String): DataFrame =
    ManifestStore.readTable(spark, base, "vecs", vecsSchema)

  /** Drain `srcDir` into a live-maintained graph store at `base`:
    * per-trigger TOUCHED-LABEL directed-list repair (snapshot-isolated
    * manifest publish) + label-partitioned vector append. All
    * filesystem choreography resolves from the store path
    * ([[graft.util.Fs]]) so `base`, `srcDir` and `checkpoint` may live
    * on any Hadoop filesystem (FsPortabilitySpec runs the drain over a
    * non-default `graftfs:` scheme). */
  private[graft] def buildStore(spark: SparkSession, dir: String,
      srcDir: String, schema: org.apache.spark.sql.types.StructType,
      base: String, checkpoint: Option[String] = None): Unit = {
    graft.functions.BoundedTopK.register(spark)
    graft.functions.DotProduct.register(spark)
    graft.functions.KnownNonNullElements.register(spark)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch.sparkSession, base, batch)
      }
      .option("checkpointLocation", checkpoint.getOrElse(
        java.nio.file.Files.createTempDirectory("graft_ckpt_graph").toString))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One trigger's maintenance, IDEMPOTENT under micro-batch
    * re-delivery (foreachBatch is at-least-once — a crash between the
    * topk publish, the vecs append and the checkpoint commit re-runs
    * the same batch) and durable against deletions: the batch is first
    * gated on the store's [[DeleteLog]] (an id deleted before its
    * source row arrives must never enter the graph); the list repair
    * dedups its candidate union ([[GraphStore.repairedTopk]]), so
    * re-collapsing a store that already absorbed the batch reproduces
    * it; the vecs append anti-joins the batch against the ids its
    * touched label partitions already hold (a pruned, block-bounded
    * manifest read), so re-delivered vectors are never
    * double-appended. GraphStreamSpec pins a double-delivered batch
    * leaving both stores identical to single delivery. */
  private[graft] def ingestBatch(sp: SparkSession, base: String,
      batch: DataFrame): Unit = {
    graft.functions.BoundedTopK.register(sp)
    graft.functions.DotProduct.register(sp)
    graft.functions.KnownNonNullElements.register(sp)
    // ONE atomic publish spanning the list repair AND the vector
    // append: a reader concurrent with the trigger resolves one
    // committed version of topk+vecs (never repaired lists over a
    // vector set that doesn't include the batch), and a crash
    // anywhere re-runs the whole trigger. Store-derived frames (the
    // delete-log gate, the touched stored partitions, the re-delivery
    // anti-join) are forced INSIDE the publish, under the store lease.
    lazy val prepared = {
      val batchVecs = Embeddings.vecsOf(DeleteLog.gate(sp, base, batch, "vec_id"))
      // the only lists a label-blocked candidate pass can change
      val touched = batchVecs.select("label").distinct()
        .collect().map(_.getInt(0)).sorted.toSeq.map(l => l: Any)
      if (touched.isEmpty) (touched, null: DataFrame, null: DataFrame)
      else {
        val touchedOnly = col("label").isin(touched: _*)
        // static partition pruning: only touched label= files are read
        // (graft_dense on the parquet-loaded vectors — the file source
        // forces containsNull=true; see Embeddings.vecs)
        val storedVecs = readVecsRaw(sp, base).where(touchedOnly)
          .select(col("vec_id"), col("label"),
            expr("graft_dense(v)").as("v"), col("norm2"))
        val storedTopk = readTopk(sp, base).where(touchedOnly)
        val repaired = GraphStore.repairedTopk(storedTopk, storedVecs, batchVecs)
        // re-delivery gate: only vectors the touched partitions don't
        // already hold append (ids are append-only, so the anti-join
        // drops exactly the re-delivered rows)
        val newVecs = batchVecs.select("vec_id", "v", "norm2", "label")
          .join(readVecsRaw(sp, base).where(touchedOnly).select("vec_id"),
            Seq("vec_id"), "left_anti")
        (touched, repaired.select("src_id", "dst_id", "cos", "rank", "label"), newVecs)
      }
    }
    ManifestStore.publishOps(sp, base, Seq(
      ManifestStore.rewriteOp("topk", "label", () => prepared._1, () => prepared._2),
      ManifestStore.appendOp("vecs", "label", () => prepared._1, () => prepared._3)))
  }

  /** The scheduled small-file sweep over a live graph store: the
    * vector table collapses to one file per label (the topk table is
    * rewritten whole per touched label anyway), plus the delete log's
    * fold — one snapshot flip. */
  private[graft] def compactGraphStore(spark: SparkSession, base: String): Unit = {
    val ops = Seq(
      ManifestStore.compactOp(spark, base, "vecs", "label",
        Seq("vec_id"), vecsSchema)) ++
      (if (ManifestStore.tableFiles(spark, base, DeleteLog.Table).nonEmpty)
        Seq(DeleteLog.foldOp(spark, base, "vec_id")) else Seq.empty)
    ManifestStore.publishOps(spark, base, ops)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_knn_graph" -> (streamKnnGraph _))

  /** The maintained store is result-invisible: the full-recompute
    * mutual-kNN oracle carries verbatim. */
  val oracles: Map[String, String] = Map(
    "stream_knn_graph" -> KnnGraph.knnGraphOracle)
}
