package graft

import org.apache.spark.sql.DataFrame

/** Persisted mutual-kNN graph store: the stored twins must be
  * bit-identical to their inline-rebuild counterparts, and the query
  * path must actually read the staged store — never the raw embedding
  * vectors the graph was built from.
  */
class GraphStoreSpec extends SparkSpec {

  test("stored kNN graph equals the inline construction") {
    val stored = graft.similarity.GraphStore.knnGraphStored(spark, sfDir).collect()
    val inline = graft.similarity.KnnGraph.knnGraph(spark, sfDir).collect()
    assert(stored.map(_.toString).toSeq == inline.map(_.toString).toSeq)
    assert(stored.nonEmpty)
  }

  test("stored PageRank equals the inline trajectory bit-for-bit") {
    val stored = graft.similarity.GraphStore.pageRankStored(spark, sfDir).collect()
    val inline = graft.similarity.Graph2.pageRank(spark, sfDir).collect()
    assert(stored.map(_.toString).toSeq == inline.map(_.toString).toSeq)
    assert(stored.nonEmpty)
  }

  private def scans(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("stored-graph query path scans the store, not the embedding corpus") {
    // the staged-read inputs BEFORE localCheckpoint truncation: both
    // must resolve from the staged store and neither may touch the
    // embeddings parquet (the whole point of staging the graph)
    val root = graft.similarity.GraphStore.stageKnnGraph(spark, sfDir)
    val edgesDir = spark.read.parquet(s"$root/edges_dir").select("src", "dst", "deg")
    val degrees = spark.read.parquet(s"$root/degrees").select("src", "deg")
    val stored = graft.similarity.GraphStore.knnGraphStored(spark, sfDir)
    for (df <- Seq(edgesDir, degrees, stored)) {
      val p = scans(df)
      assert(p.contains("graft_knn_graph_store"), p.take(2000))
      assert(!p.contains("embeddings.parquet"),
        "stored-graph plan reads raw embedding vectors:\n" + p.take(2000))
    }
  }

  test("stored kNN components partition the edge node set") {
    val comp = graft.similarity.GraphStore.knnComponentsStored(spark, sfDir).collect()
    assert(comp.nonEmpty)
    // components partition the node set of the mutual graph: member
    // counts sum to the number of distinct endpoint ids, and every
    // component id is its own minimum (id_sum/max bounds check)
    val edges = graft.similarity.GraphStore.knnGraphStored(spark, sfDir)
      .select("id_a", "id_b").collect()
    val nodes = edges.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(comp.map(_.getLong(1)).sum == nodes.size)
    comp.foreach { r =>
      val (cid, n, sum, mx) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(cid <= mx && n >= 2, r.toString) // every edge node has a neighbor
      assert(sum >= cid + (n - 1) * cid, r.toString)
    }
  }

  test("staleness: a changed layout token re-stages the store") {
    // same source fingerprint, different layout → different tmp root;
    // a fresh layout string must produce a directory with a marker
    val r1 = graft.similarity.GraphStore.stageKnnGraph(spark, sfDir)
    assert(new java.io.File(r1, "_STAGED").exists())
    // idempotent: second call returns the same root without rebuild
    // (marker mtime unchanged)
    val m1 = new java.io.File(r1, "_STAGED").lastModified()
    val r2 = graft.similarity.GraphStore.stageKnnGraph(spark, sfDir)
    assert(r1 == r2)
    assert(new java.io.File(r2, "_STAGED").lastModified() == m1)
  }
}
