package graft

import graft.similarity.IndexRefresh
import org.apache.spark.sql.functions._

/** Blue/green index rotation: old-store precedence until the marker
  * lands, no rotation on an in-distribution window, and the rotated
  * index ≡ a fresh build on the drifted window. */
class IndexRefreshSpec extends SparkSpec {

  test("reads during a re-stage serve the OLD committed store; the marker is the swap") {
    graft.functions.L2Distance.register(spark)
    graft.functions.KnownNonNullElements.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_bg_spec").toString
    val orig = IndexRefresh.origVecs(spark, sfDir)
    val probes = orig.where(col("vec_id") < 5)
    IndexRefresh.stageVersion(spark, root, 1, orig)
    IndexRefresh.commitVersion(spark, root, 1)
    assert(IndexRefresh.committedVersion(spark, root) == 1)
    val before = IndexRefresh.searchCommitted(spark, root, probes)
      .collect().map(_.toString).toSeq
    assert(before.nonEmpty)
    // re-stage the drifted v2 WITHOUT committing: v2 files are on disk,
    // but every read must keep resolving — and bit-reproducing — v1
    IndexRefresh.stageVersion(spark, root, 2,
      IndexRefresh.driftedVecs(spark, sfDir))
    assert(graft.util.Fs.of(spark, root)
      .exists(new org.apache.hadoop.fs.Path(s"$root/v2/codes")), "v2 staged")
    assert(IndexRefresh.committedVersion(spark, root) == 1)
    val during = IndexRefresh.searchCommitted(spark, root, probes)
      .collect().map(_.toString).toSeq
    assert(during == before, "a mid-re-stage read saw the uncommitted store")
    // the marker IS the swap: post-commit reads serve v2
    IndexRefresh.commitVersion(spark, root, 2)
    assert(IndexRefresh.committedVersion(spark, root) == 2)
    val driftedProbes = IndexRefresh.driftedVecs(spark, sfDir)
      .where(col("vec_id") < 5)
    val after = IndexRefresh.searchCommitted(spark, root, driftedProbes)
      .collect().map(_.toString).toSeq
    assert(after != before, "rotation was result-invisible on a drifted window")
  }

  test("the alarm gates the rotation: an in-distribution window does NOT rotate") {
    graft.functions.L2Distance.register(spark)
    graft.functions.KnownNonNullElements.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_bg_ctrl").toString
    IndexRefresh.stageVersion(spark, root, 1, IndexRefresh.origVecs(spark, sfDir))
    IndexRefresh.commitVersion(spark, root, 1)
    // shift 0 = the DriftMonitorSpec control (KL ≈ sampling noise)
    assert(IndexRefresh.refreshIfDrifted(spark, sfDir, root, 0.0) == 1,
      "in-distribution window rotated the index")
    assert(IndexRefresh.refreshIfDrifted(spark, sfDir, root, 0.5) == 2,
      "seeded drift did not rotate the index")
  }

  test("post-refresh search equals a FRESH one-shot build on the drifted window") {
    graft.functions.L2Distance.register(spark)
    graft.functions.KnownNonNullElements.register(spark)
    val refreshed = IndexRefresh.annIndexRefresh(spark, sfDir)
      .collect().map(_.toString).toSeq
    // fresh build: stage directly from the drifted corpus, search it
    val root = java.nio.file.Files.createTempDirectory("graft_bg_fresh").toString
    val drifted = IndexRefresh.driftedVecs(spark, sfDir)
    IndexRefresh.stageVersion(spark, root, 1, drifted)
    IndexRefresh.commitVersion(spark, root, 1)
    val fresh = IndexRefresh.searchCommitted(spark, root,
      drifted.where(col("vec_id") < 5)).collect().map(_.toString).toSeq
    assert(refreshed.nonEmpty)
    assert(refreshed == fresh)
  }
}
