package graft

import org.apache.spark.sql.DataFrame

/** The persisted-at-ingest index stores: results must be bit-identical
  * to the inline-rebuild twins, and the PLANS must prove the store is
  * actually used — the steady-state read path scans the staged index,
  * never recomputes it from raw text/vectors.
  */
class StoredIndexSpec extends SparkSpec {

  private def planStr(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def count(hay: String, needle: String): Int =
    needle.r.findAllIn(hay).size

  test("stored LSH dedup equals the inline-rebuild answer") {
    val stored = graft.dedup.LshStore.incrementalLshStored(spark, sfDir).collect()
    val inline = graft.dedup.Dedup.minHashLshIncremental(spark, sfDir).collect()
    assert(stored.map(_.toString).toSeq == inline.map(_.toString).toSeq)
    assert(stored.nonEmpty)
  }

  test("stored LSH plan scans the staged band table — store signatures are not recomputed") {
    // pin the un-checkpointed candidate probe (the production query
    // localCheckpoints it, which hides the upstream plan)
    val p = planStr(graft.dedup.LshStore.candidates(spark, sfDir))
    // the staged parquet is in the plan
    assert(p.contains("graft_lsh_bands"), p.take(3000))
    // the inline-rebuild candidate probe computes signatures on BOTH
    // branches; the stored plan must carry signature arithmetic
    // (graft_polyhash feeds the 128 perms) on ONE (the batch)
    val bands = graft.dedup.Dedup.bandRows(Tables.documents(spark, sfDir))
    val inline = org.apache.spark.sql.functions.broadcast(
        bands.where(org.apache.spark.sql.functions.col("doc_id") < 50)
          .toDF("batch_id", "band_idx", "band_key"))
      .join(bands.where(org.apache.spark.sql.functions.col("doc_id") >= 50)
          .toDF("store_id", "band_idx", "band_key"),
        Seq("band_idx", "band_key"))
      .select("batch_id", "store_id").distinct()
    val ps = count(p, "graft_polyhash")
    val qs = count(planStr(inline), "graft_polyhash")
    assert(ps > 0, "batch side must still compute signatures")
    assert(ps * 2 <= qs, s"stored=$ps inline=$qs — store branch appears to recompute signatures")
  }

  test("stored IVFADC equals the inline-rebuild answer") {
    val stored = graft.similarity.StoredIndex.annIvfPqStored(spark, sfDir).collect()
    val inline = graft.similarity.Embeddings.annIvfPqTopK(spark, sfDir).collect()
    assert(stored.map(_.toString).toSeq == inline.map(_.toString).toSeq)
    assert(stored.nonEmpty)
  }

  test("stored IVFADC never scans corpus floats — every embeddings scan is probe-pruned") {
    val p = planStr(graft.similarity.StoredIndex.annIvfPqStored(spark, sfDir))
    assert(p.contains("graft_ivfpq_store"), p.take(3000))
    // every FileScan over the raw embeddings table must carry the
    // probe pushdown: the corpus floats are replaced by the staged
    // codes/lists/codebook for everything except the 5 probe rows
    val embScans = p.split("FileScan").toSeq.drop(1)
      .filter(_.contains("embeddings.parquet"))
    assert(embScans.nonEmpty, "probes must come from the raw table")
    embScans.foreach { s =>
      assert(s.contains("LessThan(vec_id,5)"),
        "un-pruned embeddings scan (corpus floats read at query time):\n" + s.take(1500))
    }
  }

  test("stored IVFADC index scans prune by cell — dynamic partition pruning on lists AND codes") {
    val p = planStr(graft.similarity.StoredIndex.annIvfPqStored(spark, sfDir))
    // lists/ and codes/ are partitioned by bucket=<cell>; the probes'
    // nprobe cell selection must reach BOTH scans as a dynamicpruning
    // partition filter — the "pruning is partition pruning" claim of
    // the IVFADC design, physically
    val idxScans = p.split("FileScan").toSeq.drop(1)
      .filter(s => s.contains("graft_ivfpq_store") &&
        (s.contains("/lists") || s.contains("/codes")))
    assert(idxScans.size >= 2, "expected both index scans:\n" + p.take(3000))
    idxScans.foreach { s =>
      assert(s.contains("dynamicpruning"),
        "index scan not partition-pruned by the probe cells:\n" + s.take(1500))
    }
  }

  test("staging is idempotent: second call reuses the store (marker fingerprint)") {
    val r1 = graft.dedup.LshStore.stageBandStore(spark, sfDir)
    val marker = new java.io.File(r1, "_STAGED")
    val m1 = marker.lastModified
    val r2 = graft.dedup.LshStore.stageBandStore(spark, sfDir)
    assert(r1 == r2 && marker.lastModified == m1, "re-stage on unchanged fingerprint")
  }

  test("stored full-corpus LSH report equals the inline answer") {
    val stored = graft.dedup.LshStore.minHashLshStored(spark, sfDir).collect()
    val inline = graft.dedup.Dedup.minHashLshOn(
      Tables.documents(spark, sfDir)).collect()
    assert(stored.nonEmpty)
    assert(stored.map(_.toString).toSeq == inline.map(_.toString).toSeq)
  }

  test("stored full-corpus LSH plan carries no token/signature arithmetic at all") {
    val p = planStr(graft.dedup.LshStore.minHashLshStored(spark, sfDir))
    assert(p.contains("graft_lsh_full"), p.take(3000))
    // everything signature- and token-derived is read from the store:
    // zero 128-perm arithmetic AND zero raw-corpus scans in the plan
    assert(count(p, "graft_polyhash") == 0, "signature arithmetic on the query path")
    assert(!p.contains("documents.parquet"), "raw corpus scanned on the query path")
  }
}
