package graft

import graft.similarity.{DeleteRepair, Embeddings, KnnGraph, StoredIndex}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Deletion with derived-index repair: touched partitions only, exact
  * equality with a fresh build on the surviving corpus, idempotent
  * crash re-runs. */
class DeleteRepairSpec extends SparkSpec {

  graft.functions.DotProduct.register(spark)
  graft.functions.KnownNonNullElements.register(spark)
  graft.functions.L2Distance.register(spark)
  graft.functions.BoundedTopK.register(spark)

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  /** (path → mtime) of every parquet file under `root`. */
  private def inv(root: String): Map[String, Long] = {
    val fs = graft.util.Fs.of(spark, root)
    val b = Map.newBuilder[String, Long]
    val it = fs.listFiles(new Path(root), true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.toString.endsWith(".parquet"))
        b += (f.getPath.toString -> f.getModificationTime)
    }
    b.result()
  }

  private def survivors = Embeddings.vecsOf(Tables.embeddings(spark, sfDir))
    .where(!(pmod(col("vec_id"), lit(17L)) === 14L))

  private def cloneIvf(): String = {
    val staged = StoredIndex.stageIvfPq(spark, sfDir)
    val base = tmp("graft_delspec_ivf")
    for (t <- Seq("centroids", "codebook"))
      spark.read.parquet(s"$staged/$t").write.mode("overwrite").parquet(s"$base/$t")
    for (t <- Seq("lists", "codes"))
      spark.read.parquet(s"$staged/$t").repartition(col("bucket"))
        .write.partitionBy("bucket").parquet(s"$base/$t")
    base
  }

  private def cloneGraph(): String = {
    val staged = DeleteRepair.stageDirectedTopk(spark, sfDir)
    val base = tmp("graft_delspec_knn")
    for (t <- Seq("topk", "vecs"))
      spark.read.parquet(s"$staged/$t").repartition(col("label"))
        .write.partitionBy("label").parquet(s"$base/$t")
    base
  }

  test("IVFADC single-vector delete rewrites only its cell and drops exactly its rows") {
    val base = cloneIvf()
    // cast: a prior suite may have left partition-column type inference
    // off on the shared session, making `bucket` read back as a string
    val cell = spark.read.parquet(s"$base/lists")
      .where(col("neighbor_id") === 14L)
      .select(col("bucket").cast("int")).head().getInt(0)
    val nLists = spark.read.parquet(s"$base/lists").count()
    val nCodes = spark.read.parquet(s"$base/codes").count()
    val before = inv(s"$base/lists") ++ inv(s"$base/codes")
    val delVec = Embeddings.vecsOf(Tables.embeddings(spark, sfDir))
      .where(col("vec_id") === 14L)
    DeleteRepair.deleteFromIvfPq(spark, base, delVec)
    val after = inv(s"$base/lists") ++ inv(s"$base/codes")
    val untouchedBefore = before.filterNot(_._1.contains(s"bucket=$cell/"))
    assert(untouchedBefore.nonEmpty)
    // every file outside the deleted vector's cell is the SAME file
    assert(after.filterNot(_._1.contains(s"bucket=$cell/")) == untouchedBefore)
    // the touched cell was rewritten (no old file survives)
    assert(after.keySet.intersect(
      before.keySet.filter(_.contains(s"bucket=$cell/"))).isEmpty)
    assert(spark.read.parquet(s"$base/lists")
      .where(col("neighbor_id") === 14L).isEmpty)
    assert(spark.read.parquet(s"$base/codes")
      .where(col("neighbor_id") === 14L).isEmpty)
    assert(spark.read.parquet(s"$base/lists").count() == nLists - 1)
    assert(spark.read.parquet(s"$base/codes").count() == nCodes - 8)
  }

  test("IVFADC repaired search equals a fresh index built from the survivors") {
    val repaired = DeleteRepair.storeDeleteIvfPq(spark, sfDir).collect()
    val (cents, cb) = StoredIndex.trainIndex(spark, sfDir)
    val (lists, codes) = StoredIndex.indexDelta(survivors, cents, cb)
    val fresh = tmp("graft_delspec_fresh")
    cents.write.parquet(s"$fresh/centroids")
    cb.write.parquet(s"$fresh/codebook")
    lists.repartition(col("bucket")).write.partitionBy("bucket").parquet(s"$fresh/lists")
    codes.repartition(col("bucket")).write.partitionBy("bucket").parquet(s"$fresh/codes")
    val expected = DeleteRepair.searchIvfPq(spark, sfDir, fresh).collect()
    assert(repaired.nonEmpty)
    assert(repaired.map(_.toString).toSeq == expected.map(_.toString).toSeq)
  }

  test("kNN single-vector delete rewrites only its label partitions; node gone as src AND dst") {
    val base = cloneGraph()
    val label = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") === 14L).select("label").head().getInt(0)
    val before = inv(s"$base/topk") ++ inv(s"$base/vecs")
    val delVec = Embeddings.vecsOf(Tables.embeddings(spark, sfDir))
      .where(col("vec_id") === 14L)
    DeleteRepair.deleteFromGraph(spark, base, delVec)
    val after = inv(s"$base/topk") ++ inv(s"$base/vecs")
    val untouched = before.filterNot(_._1.contains(s"label=$label/"))
    assert(untouched.nonEmpty)
    assert(after.filterNot(_._1.contains(s"label=$label/")) == untouched)
    val topk = spark.read.parquet(s"$base/topk")
    assert(topk.where(col("src_id") === 14L || col("dst_id") === 14L).isEmpty)
    assert(spark.read.parquet(s"$base/vecs").where(col("vec_id") === 14L).isEmpty)
    // survivors that had 14 in their top-5 still have exactly 5
    // entries (the block is larger than k) — the rescore refilled them
    assert(topk.where(col("label") === label)
      .groupBy("src_id").agg(count(lit(1)).as("n"))
      .where(col("n") =!= 5).isEmpty)
  }

  test("kNN repaired mutual edges equal the fresh build on the survivors") {
    val repaired = DeleteRepair.storeDeleteKnn(spark, sfDir).collect()
    val s = survivors
    val expected = KnnGraph.mutualEdges(KnnGraph.directedTopk(
        KnnGraph.scoredPairs(KnnGraph.srcSide(s), KnnGraph.dstSide(s))))
      .orderBy("id_a", "id_b").collect()
    assert(repaired.nonEmpty)
    assert(repaired.map(_.toString).toSeq == expected.map(_.toString).toSeq)
  }

  test("a crash inside the swap window re-runs to the clean result") {
    val crashed = cloneGraph()
    val clean = cloneGraph()
    val delVecs = Embeddings.vecsOf(Tables.embeddings(spark, sfDir))
      .where(pmod(col("vec_id"), lit(17L)) === 14L)
    graft.util.PartitionSwap.crashPoint = Some("swap")
    intercept[IllegalStateException] {
      DeleteRepair.deleteFromGraph(spark, crashed, delVecs)
    }
    graft.util.PartitionSwap.crashPoint = None
    // the interrupted store has a partition sitting aside; the re-run
    // recovers it before reading and repairs to the clean outcome
    DeleteRepair.deleteFromGraph(spark, crashed, delVecs)
    DeleteRepair.deleteFromGraph(spark, clean, delVecs)
    val cols = Seq("label", "src_id", "dst_id", "cos", "rank").map(col)
    val a = spark.read.parquet(s"$crashed/topk").select(cols: _*)
    val b = spark.read.parquet(s"$clean/topk").select(cols: _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() == b.count() && a.count() > 0)
  }

  test("delete repairs the LIVE (multi-file-per-cell) drained IVFADC store too") {
    // the streaming twin's store has one file pair per (trigger, cell)
    // — the swap must replace whole partition DIRS, not single files
    val emb = Tables.embeddings(spark, sfDir)
    val srcDir = tmp("graft_delspec_live_src")
    emb.repartitionByRange(3, col("vec_id")).write.mode("overwrite").parquet(srcDir)
    val base = tmp("graft_delspec_live")
    graft.streaming.AnnStream.buildStore(spark, sfDir, srcDir, emb.schema, base)
    val cellFiles = inv(s"$base/lists").keySet
      .flatMap("bucket=(\\d+)/".r.findFirstMatchIn(_).map(_.group(1)))
    assert(inv(s"$base/lists").size > cellFiles.size,
      "expected the per-trigger fan-out (several files per cell)")
    DeleteRepair.deleteFromIvfPq(spark, base,
      Embeddings.vecsOf(emb).where(pmod(col("vec_id"), lit(17L)) === 14L))
    val repaired = DeleteRepair.searchIvfPq(spark, sfDir, base).collect()
    val (cents, cb) = StoredIndex.trainIndex(spark, sfDir)
    val (lists, codes) = StoredIndex.indexDelta(survivors, cents, cb)
    val fresh = tmp("graft_delspec_live_fresh")
    cents.write.parquet(s"$fresh/centroids")
    cb.write.parquet(s"$fresh/codebook")
    lists.repartition(col("bucket")).write.partitionBy("bucket").parquet(s"$fresh/lists")
    codes.repartition(col("bucket")).write.partitionBy("bucket").parquet(s"$fresh/codes")
    val expected = DeleteRepair.searchIvfPq(spark, sfDir, fresh).collect()
    assert(repaired.nonEmpty)
    assert(repaired.map(_.toString).toSeq == expected.map(_.toString).toSeq)
  }

  test("BM25 delete equals a fresh store built from the surviving docs (dl buckets file-pinned)") {
    val docs = Tables.documents(spark, sfDir)
    val base = tmp("graft_delspec_bm")
    DeleteRepair.buildBm25Store(spark, docs, base)
    // single-doc warmup delete pins the dl/stats bucket discipline:
    // doc 5 touches exactly the db=5 partition of dl and stats
    val dlBefore = inv(s"$base/dl") ++ inv(s"$base/stats")
    DeleteRepair.deleteFromBm25(spark, base, docs.where(col("doc_id") === 5L))
    val dlAfter = inv(s"$base/dl") ++ inv(s"$base/stats")
    val dlUntouched = dlBefore.filterNot(_._1.contains("db=5/"))
    assert(dlUntouched.nonEmpty)
    assert(dlAfter.filterNot(_._1.contains("db=5/")) == dlUntouched)
    // then the full delete set; compare against the fresh build
    DeleteRepair.deleteFromBm25(spark, base,
      docs.where(pmod(col("doc_id"), lit(13L)) === 5L))
    val fresh = tmp("graft_delspec_bm_fresh")
    DeleteRepair.buildBm25Store(spark,
      docs.where(!(pmod(col("doc_id"), lit(13L)) === 5L)), fresh)
    val a = DeleteRepair.searchBm25(spark, sfDir, base).collect()
    val b = DeleteRepair.searchBm25(spark, sfDir, fresh).collect()
    assert(a.nonEmpty)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    // the repaired df/stats tables ARE the fresh ones, row for row
    for (t <- Seq("df", "stats")) {
      val x = spark.read.parquet(s"$base/$t")
      val y = spark.read.parquet(s"$fresh/$t")
      val cs = x.columns.sorted.map(col).toSeq
      assert(x.select(cs: _*).exceptAll(y.select(cs: _*)).isEmpty, s"$t extra")
      assert(y.select(cs: _*).exceptAll(x.select(cs: _*)).isEmpty, s"$t missing")
    }
  }
}
