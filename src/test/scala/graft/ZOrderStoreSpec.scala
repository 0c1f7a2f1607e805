package graft

import graft.spatial.ZOrderStore
import org.apache.spark.sql.functions._

class ZOrderStoreSpec extends SparkSpec {

  test("bucket enumeration is lossless and prunes: demo box touches 1 of 16 buckets") {
    val buckets = ZOrderStore.bucketsFor(40.05, 40.15, -73.9, -73.7)
    assert(buckets.size < 16, s"no pruning: $buckets")
    // the sk_bbox_filter box interleaves to exactly one top-bit bucket
    assert(buckets == Seq(4), buckets.toString)
    // losslessness: every stored row inside the box lives in an
    // enumerated bucket (same floor/mask arithmetic on both sides)
    val root = ZOrderStore.stageZStore(spark, sfDir)
    val escaped = spark.read.parquet(root)
      .where(col("lat") >= 40.05 && col("lat") <= 40.15 &&
        col("lon") >= -73.9 && col("lon") <= -73.7)
      .where(!col("z_bucket").isin(buckets: _*))
      .count()
    assert(escaped == 0, s"$escaped in-box rows outside the enumerated buckets")
  }

  test("the clustered-store plan prunes partitions: z_bucket reaches PartitionFilters") {
    val p = ZOrderStore.zorderBbox(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = p.split("FileScan").toSeq.drop(1)
      .filter(_.contains("graft_zorder_store"))
    assert(scans.nonEmpty, p.take(3000))
    scans.foreach { s =>
      val pf = s.split("PartitionFilters:").lift(1).getOrElse("")
      assert(pf.takeWhile(_ != ']').contains("z_bucket"),
        "bbox bucket set not in PartitionFilters:\n" + s.take(1500))
    }
  }

  test("pruned read equals the full-scan answer (clustering is result-invisible)") {
    val pruned = ZOrderStore.zorderBbox(spark, sfDir).collect()
    val full = graft.spatial.Spatial.positions(spark, sfDir)
      .where(col("lat") >= 40.05 && col("lat") <= 40.15 &&
        col("lon") >= -73.9 && col("lon") <= -73.7)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_fixes"),
        graft.funcs.davg(col("lat")).as("lat_avg"),
        graft.funcs.davg(col("lon")).as("lon_avg"))
      .orderBy("user_id").collect()
    assert(pruned.nonEmpty)
    assert(pruned.map(_.toString).toSeq == full.map(_.toString).toSeq)
  }
}
