package graft

import graft.similarity.{Embeddings, StoredIndex}
import graft.streaming.AnnStream
import graft.util.ManifestStore
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
      val sch = if (t == "lists") StoredIndex.listsSchema else StoredIndex.codesSchema
      val s = ManifestStore.read(spark, s"$streamed/$t", sch)
      val o = ManifestStore.read(spark, s"$staged/$t", sch)
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

  test("compaction collapses the trigger fan-out per cell, keeps DPP, and a mid-sweep reader stays on the old snapshot") {
    val emb = Tables.embeddings(spark, sfDir)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_anncspec_src").toString
    emb.repartitionByRange(3, col("vec_id"))
      .write.mode("overwrite").parquet(srcDir)
    val base = java.nio.file.Files.createTempDirectory("graft_anncspec_store").toString
    AnnStream.buildStore(spark, sfDir, srcDir, emb.schema, base)
    def manifestFiles(t: String): Seq[String] = ManifestStore.files(spark, s"$base/$t")
    def buckets(t: String): Set[String] =
      manifestFiles(t).map(_.takeWhile(_ != '/')).toSet
    val (filesBefore, bucketsBefore) = (manifestFiles("lists").size, buckets("lists"))
    assert(filesBefore > bucketsBefore.size,
      "per-trigger appends produced no small-file fan-out — nothing to compact")
    // crash INSIDE the sweep's publish window (rewritten files on disk,
    // manifest not committed): a concurrent reader must keep serving
    // the PRE-sweep snapshot — then the re-run sweep completes
    val preSweep = AnnStream.searchStore(spark, sfDir, base).collect()
    ManifestStore.crashPoint = Some("publish")
    intercept[IllegalStateException] { AnnStream.compactIndexStore(spark, base) }
    ManifestStore.crashPoint = None
    val midCrash = AnnStream.searchStore(spark, sfDir, base).collect()
    assert(midCrash.map(_.toString).toSeq == preSweep.map(_.toString).toSeq,
      "a reader saw a crashed sweep's uncommitted state")
    AnnStream.compactIndexStore(spark, base)
    for (t <- Seq("lists", "codes")) {
      assert(buckets(t) == bucketsBefore, s"$t lost cell partitions")
      assert(manifestFiles(t).size == buckets(t).size,
        s"$t not compacted to one file per cell dir: ${manifestFiles(t).size}")
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
      val sch = if (t == "lists") StoredIndex.listsSchema else StoredIndex.codesSchema
      val a = ManifestStore.read(spark, s"$once/$t", sch)
      val b = ManifestStore.read(spark, s"$twice/$t", sch)
      val cols = a.columns.sorted.map(col).toSeq
      assert(b.count() == a.count(), s"$t re-delivery appended duplicates")
      assert(b.select(cols: _*).exceptAll(a.select(cols: _*)).isEmpty, s"$t rows diverged")
      assert(a.count() > 0)
    }
  }

  test("a partially committed codes append self-heals: the re-delivered batch restores the missing sub-codes") {
    // the failure ADVICE r16 called out: a crash inside the codes
    // append's multi-file commit can persist a SUBSET of a vector's 8
    // sub-code rows; a neighbor-only re-delivery gate would then drop
    // the whole re-delivered delta and strand the vector half-coded.
    // The (neighbor_id, sub) gate must instead append exactly the
    // missing rows.
    val emb = Tables.embeddings(spark, sfDir)
    val (centroids, codebook) = StoredIndex.trainIndex(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft_partial").toString
    centroids.write.mode("overwrite").parquet(s"$base/centroids")
    codebook.write.mode("overwrite").parquet(s"$base/codebook")
    AnnStream.ingestBatch(spark, base, emb)
    // simulate the partial commit: rewrite the store dropping half of
    // one vector's code rows (subs 4-7 of the first neighbor)
    val victim = ManifestStore.read(spark, s"$base/codes", StoredIndex.codesSchema)
      .select("neighbor_id").orderBy("neighbor_id").head().getLong(0)
    val full = ManifestStore.read(spark, s"$base/codes", StoredIndex.codesSchema)
    val buckets = full.select("bucket").distinct().collect().map(_.get(0)).toSeq
    ManifestStore.rewriteTouched(spark, s"$base/codes", "bucket", buckets,
      full.where(!(col("neighbor_id") === victim && col("sub") >= 4)))
    assert(ManifestStore.read(spark, s"$base/codes", StoredIndex.codesSchema)
      .where(col("neighbor_id") === victim).count() == 4)
    // the re-delivered batch must heal exactly the 4 missing rows
    AnnStream.ingestBatch(spark, base, emb)
    val healed = ManifestStore.read(spark, s"$base/codes", StoredIndex.codesSchema)
    assert(healed.where(col("neighbor_id") === victim).count() == 8,
      "partial codes commit not healed by re-delivery")
    assert(healed.groupBy("neighbor_id").count()
      .where(col("count") =!= 8).isEmpty, "some vector lost or duplicated sub-codes")
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
