package graft

import graft.similarity.{Embeddings, KnnGraph}
import graft.streaming.GraphStream
import org.apache.spark.sql.functions._

/** Incremental kNN-graph maintenance: the per-trigger repaired store
  * must equal the full rebuild, and the repair must actually be
  * exercised (a later batch evicting an earlier node's neighbor). */
class GraphStreamSpec extends SparkSpec {

  test("store after 3 batches equals the full rebuild (directed lists AND mutual edges)") {
    val emb = Tables.embeddings(spark, sfDir)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_graphspec_src").toString
    emb.repartitionByRange(3, col("vec_id"))
      .write.mode("overwrite").parquet(srcDir)
    val base = java.nio.file.Files.createTempDirectory("graft_graphspec_store").toString
    GraphStream.buildStore(spark, sfDir, srcDir, emb.schema, base)
    // directed lists ≡ one-shot collapse over the whole corpus
    graft.functions.BoundedTopK.register(spark)
    graft.functions.DotProduct.register(spark)
    val e = Embeddings.vecsOf(Tables.embeddings(spark, sfDir))
    val oneShot = KnnGraph.directedTopk(
      KnnGraph.scoredPairs(KnnGraph.srcSide(e), KnnGraph.dstSide(e)))
      .orderBy("src_id", "rank").collect()
    val maintained = GraphStream.readTopk(spark, base)
      .orderBy("src_id", "rank").collect()
    assert(maintained.nonEmpty)
    assert(maintained.map(_.toString).toSeq == oneShot.map(_.toString).toSeq)
    // mutual edges ≡ the inline twin, bit for bit
    val live = graft.similarity.GraphStore.mutualFromTopk(
      GraphStream.readTopk(spark, base)).orderBy("id_a", "id_b").collect()
    val inline = KnnGraph.knnGraph(spark, sfDir).collect()
    assert(live.map(_.toString).toSeq == inline.map(_.toString).toSeq)
  }

  test("the repair path is exercised: a later batch evicts an earlier node's top-5 entry") {
    // range-slicing by vec_id puts low ids in trigger 1 and high ids in
    // trigger 3; if no later vector ever entered an earlier node's
    // top-5, every low node's final list would point only at ids from
    // its own or earlier slices. Assert the opposite is present — the
    // seam the directed-list carry exists for.
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val firstSliceMax = emb.selectExpr("vec_id").orderBy("vec_id")
      .limit((n / 3).toInt).agg(max("vec_id")).head().getLong(0)
    graft.functions.BoundedTopK.register(spark)
    graft.functions.DotProduct.register(spark)
    val e = Embeddings.vecsOf(Tables.embeddings(spark, sfDir))
    val lists = KnnGraph.directedTopk(
      KnnGraph.scoredPairs(KnnGraph.srcSide(e), KnnGraph.dstSide(e)))
    val crossSeam = lists
      .where(col("src_id") <= firstSliceMax && col("dst_id") > firstSliceMax)
      .count()
    assert(crossSeam > 0,
      "corpus produces no cross-slice top-5 entries — the eviction path would be untested")
  }
}
