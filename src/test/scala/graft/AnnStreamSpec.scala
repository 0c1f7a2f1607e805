package graft

import graft.similarity.{Embeddings, StoredIndex}
import graft.streaming.AnnStream
import org.apache.spark.sql.functions._

/** Live IVFADC index maintenance: the per-trigger appended store must
  * be bit-identical to the one-shot staged build, and the search over
  * it must equal the inline-rebuild answer. */
class AnnStreamSpec extends SparkSpec {

  test("3-trigger drained store equals the one-shot staged index, table for table") {
    val emb = Tables.embeddings(spark, sfDir)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_annspec_src").toString
    emb.repartitionByRange(3, col("vec_id"))
      .write.mode("overwrite").parquet(srcDir)
    val streamed = java.nio.file.Files.createTempDirectory("graft_annspec_store").toString
    AnnStream.buildStore(spark, sfDir, srcDir, emb.schema, streamed)
    // exactly 3 triggers ran (one appended file set per source file)
    val staged = StoredIndex.stageIvfPq(spark, sfDir)
    for (t <- Seq("lists", "codes")) {
      val s = spark.read.parquet(s"$streamed/$t")
      val o = spark.read.parquet(s"$staged/$t")
      assert(s.columns.sorted.sameElements(o.columns.sorted), s"$t columns")
      val cols = s.columns.sorted.map(col).toSeq
      assert(s.select(cols: _*).exceptAll(o.select(cols: _*)).isEmpty, s"$t: extra rows in stream store")
      assert(o.select(cols: _*).exceptAll(s.select(cols: _*)).isEmpty, s"$t: missing rows in stream store")
      assert(s.count() == o.count(), s"$t count")
    }
    // search over the drained store ≡ the staged twin ≡ inline rebuild
    val live = AnnStream.searchStore(spark, sfDir, streamed).collect()
    val inline = Embeddings.annIvfPqTopK(spark, sfDir).collect()
    assert(live.nonEmpty)
    assert(live.map(_.toString).toSeq == inline.map(_.toString).toSeq)
  }

  test("compaction collapses the trigger fan-out per cell, keeps DPP, and survives a crash window") {
    val emb = Tables.embeddings(spark, sfDir)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_anncspec_src").toString
    emb.repartitionByRange(3, col("vec_id"))
      .write.mode("overwrite").parquet(srcDir)
    val base = java.nio.file.Files.createTempDirectory("graft_anncspec_store").toString
    AnnStream.buildStore(spark, sfDir, srcDir, emb.schema, base)
    def files(t: String): Seq[String] = {
      val fs = graft.util.Fs.of(spark, base)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$base/$t"), true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val p = it.next().getPath.toString
        if (p.endsWith(".parquet")) b += p
      }
      b.result()
    }
    def buckets(t: String): Set[String] =
      files(t).flatMap("bucket=(\\d+)".r.findFirstMatchIn(_).map(_.group(1))).toSet
    val (filesBefore, bucketsBefore) = (files("lists").size, buckets("lists"))
    assert(filesBefore > bucketsBefore.size,
      "per-trigger appends produced no small-file fan-out — nothing to compact")
    // crash INSIDE the swap window (store renamed aside, rewrite not yet
    // in place), then the next scheduled run recovers and completes
    graft.sources.Compaction.crashPoint = Some("swap")
    intercept[IllegalStateException] { AnnStream.compactIndexStore(spark, base) }
    graft.sources.Compaction.crashPoint = None
    AnnStream.compactIndexStore(spark, base)
    for (t <- Seq("lists", "codes")) {
      assert(buckets(t) == bucketsBefore, s"$t lost cell partitions")
      assert(files(t).size == buckets(t).size,
        s"$t not compacted to one file per cell dir: ${files(t).size}")
    }
    // result-invisible AND the nprobe DPP shape survives the rewrite
    val df = AnnStream.searchStore(spark, sfDir, base)
    val plan = df.queryExecution.executedPlan.toString
    val idxScans = plan.split("FileScan").toSeq.drop(1)
      .filter(s => s.contains("graft_anncspec_store") &&
        (s.contains("/lists") || s.contains("/codes")))
    assert(idxScans.size >= 2, "expected both index scans:\n" + plan.take(3000))
    idxScans.foreach { s =>
      assert(s.contains("dynamicpruning"),
        "compacted index scan not partition-pruned:\n" + s.take(1500))
    }
    val inline = Embeddings.annIvfPqTopK(spark, sfDir).collect()
    assert(df.collect().map(_.toString).toSeq == inline.map(_.toString).toSeq)
  }

  test("search self-heals a store left in _precompact by a crashed compaction sweep") {
    val emb = Tables.embeddings(spark, sfDir)
    val (centroids, codebook) = StoredIndex.trainIndex(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft_heal").toString
    centroids.write.mode("overwrite").parquet(s"$base/centroids")
    codebook.write.mode("overwrite").parquet(s"$base/codebook")
    AnnStream.ingestBatch(spark, base, emb)
    // the sweep dies between its two renames: lists sits in
    // lists_precompact, the store root is gone
    graft.sources.Compaction.crashPoint = Some("swap")
    intercept[IllegalStateException] { AnnStream.compactIndexStore(spark, base) }
    graft.sources.Compaction.crashPoint = None
    assert(!graft.util.Fs.of(spark, base)
      .exists(new org.apache.hadoop.fs.Path(s"$base/lists")))
    // a read does not have to wait for the next scheduled sweep
    val healed = AnnStream.searchStore(spark, sfDir, base).collect()
    val inline = Embeddings.annIvfPqTopK(spark, sfDir).collect()
    assert(healed.nonEmpty)
    assert(healed.map(_.toString).toSeq == inline.map(_.toString).toSeq)
  }

  test("a re-delivered micro-batch is a no-op: double delivery equals single delivery") {
    // foreachBatch is at-least-once — a crash after the appends but
    // before the checkpoint commit re-runs the same batch
    val emb = Tables.embeddings(spark, sfDir)
    val (centroids, codebook) = StoredIndex.trainIndex(spark, sfDir)
    def mkStore(): String = {
      val b = java.nio.file.Files.createTempDirectory("graft_redeliver").toString
      centroids.write.mode("overwrite").parquet(s"$b/centroids")
      codebook.write.mode("overwrite").parquet(s"$b/codebook")
      b
    }
    val once = mkStore()
    AnnStream.ingestBatch(spark, once, emb)
    val twice = mkStore()
    AnnStream.ingestBatch(spark, twice, emb)
    AnnStream.ingestBatch(spark, twice, emb) // the re-delivery
    for (t <- Seq("lists", "codes")) {
      val a = spark.read.parquet(s"$once/$t")
      val b = spark.read.parquet(s"$twice/$t")
      val cols = a.columns.sorted.map(col).toSeq
      assert(b.count() == a.count(), s"$t re-delivery appended duplicates")
      assert(b.select(cols: _*).exceptAll(a.select(cols: _*)).isEmpty, s"$t rows diverged")
    }
  }

  test("appends land inside bucket partitions — the nprobe pruning shape survives maintenance") {
    val df = AnnStream.streamAnnIvfPq(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the SAME dynamic-partition-pruning pin as the staged twin
    // (StoredIndexSpec): live appends land inside bucket=<cell>/ dirs,
    // so the probes' nprobe cell selection must still reach BOTH index
    // scans as a dynamicpruning partition filter
    val idxScans = plan.split("FileScan").toSeq.drop(1)
      .filter(s => s.contains("graft_ann_store") &&
        (s.contains("/lists") || s.contains("/codes")))
    assert(idxScans.size >= 2, "expected both index scans:\n" + plan.take(3000))
    idxScans.foreach { s =>
      assert(s.contains("dynamicpruning"),
        "index scan not partition-pruned by the probe cells:\n" + s.take(1500))
    }
    assert(df.collect().nonEmpty)
  }
}
