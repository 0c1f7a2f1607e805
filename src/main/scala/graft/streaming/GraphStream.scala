package graft.streaming

import graft.similarity.{Embeddings, GraphStore, KnnGraph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

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
  * Per-trigger cost: the batch scores against the label-blocked store
  * — O(|batch| · block), the [[graft.dedup.LshStore]] (29b/42h)
  * batch-vs-store discipline — plus a node-scale heap re-collapse;
  * corpus × corpus scoring never runs after ingest. State: ≤ 5 rows
  * per node (the directed lists) + the vector store the warehouse
  * holds anyway; both swapped/appended atomically per trigger. At
  * warehouse scale the label block is the IVF cell and the vector
  * store is cell-bucketed, so the batch join exchanges only the batch.
  *
  * Drain ≡ one-shot [[KnnGraph.knnGraph]] (bit-equal spec) and the
  * full-recompute mutual-kNN oracle carries verbatim.
  */
object GraphStream {

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
    spark.read.parquet(s"$base/topk")

  /** Drain `srcDir` into a live-maintained graph store at `base`:
    * per-trigger directed-list repair (atomic swap) + vector append. */
  private[graft] def buildStore(spark: SparkSession, dir: String,
      srcDir: String, schema: org.apache.spark.sql.types.StructType,
      base: String): Unit = {
    graft.functions.BoundedTopK.register(spark)
    graft.functions.DotProduct.register(spark)
    graft.functions.KnownNonNullElements.register(spark)
    val vecStore = base + "/vecs"
    val topkStore = base + "/topk"
    // empty initial stores (the MarkovStream bootstrap pattern)
    val empty = Embeddings.vecsOf(spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
    empty.write.parquet(vecStore)
    KnnGraph.directedTopk(
      KnnGraph.scoredPairs(KnnGraph.srcSide(empty), KnnGraph.dstSide(empty)))
      .write.parquet(topkStore)
    def swap(tmp: String, dst: String): Unit = {
      val fs = graft.util.Fs.of(spark, dst)
      fs.delete(new org.apache.hadoop.fs.Path(dst), true)
      fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(dst))
      ()
    }
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        graft.functions.BoundedTopK.register(sp)
        graft.functions.DotProduct.register(sp)
        graft.functions.KnownNonNullElements.register(sp)
        val batchVecs = Embeddings.vecsOf(batch)
        // graft_dense on the parquet-loaded vectors (file source forces
        // containsNull=true; see Embeddings.vecs)
        val storedVecs = sp.read.parquet(vecStore)
          .select(col("vec_id"), col("label"),
            expr("graft_dense(v)").as("v"), col("norm2"))
        val storedTopk = sp.read.parquet(topkStore)
        val repaired = GraphStore.repairedTopk(storedTopk, storedVecs, batchVecs)
        repaired.write.mode("overwrite").parquet(topkStore + "_next")
        swap(topkStore + "_next", topkStore)
        batchVecs.write.mode("append").parquet(vecStore)
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ckpt_graph").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_knn_graph" -> (streamKnnGraph _))

  /** The maintained store is result-invisible: the full-recompute
    * mutual-kNN oracle carries verbatim. */
  val oracles: Map[String, String] = Map(
    "stream_knn_graph" -> KnnGraph.knnGraphOracle)
}
