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
