package graft.spatial

import graft.funcs._
import graft.sources.Staging
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ORDER CLUSTERED storage with measured scan pruning — the layout
  * payoff of `sk_zorder_key`, staged and queried: position fixes are
  * written partitioned by the top bits of their interleaved z key
  * (`z_bucket = zkey div 65536`, 16 buckets), and a bounding-box query
  * then enumerates the z buckets its lat/lon cell ranges can touch (a
  * driver-side walk of the ≤ ~10k grid cells in the box — metadata
  * scale, the same arithmetic both engines use for the key) and reads
  * ONLY those partitions: the z-order property that a spatial range
  * maps to few key ranges, realized as static partition pruning.
  *
  * The demo box (the `sk_bbox_filter` box) interleaves to exactly ONE
  * of the 16 buckets, so 15/16 of the store is never listed into the
  * scan (plan-pinned: `z_bucket` in PartitionFilters; spec also
  * proves the pruned read equals the full-scan answer). At 100 TB
  * this is the standard spatial-warehouse layout: cluster at ingest
  * by z (or Hilbert) key, prune every box/radius query to the touched
  * key ranges — scan cost tracks result density, not corpus size.
  * The same mechanism composes with parquet row-group min/max skipping
  * WITHIN each bucket file because the clustered write sorts by zkey.
  *
  * Reference: signalk-parquet stores tracks day-partitioned only
  * (hive-path-builder.ts); spatial clustering is the scale extension
  * (Morton 1966; the Databricks/Iceberg Z-ORDER optimize pattern),
  * keyed by the exact `sk_zorder_key` arithmetic.
  */
object ZOrderStore {

  private val BucketDiv = 65536L

  /** Scala-side twin of [[Spatial.zkeyOf]] for the driver-side bucket
    * enumeration (bit-identical: same masks, same interleave). */
  private def zOf(ql: Long, qn: Long): Long =
    (0 until 10).map { i =>
      (((ql >> i) & 1L) << (2 * i + 1)) | (((qn >> i) & 1L) << (2 * i))
    }.foldLeft(0L)(_ | _)

  /** Stage the clustered store once per (fingerprint, sf dir): fixes
    * partitioned by z_bucket, sorted by zkey within each bucket file
    * (row-group min/max locality). */
  private[graft] def stageZStore(spark: SparkSession, dir: String): String =
    Staging.stagedDir("graft_zorder_store", dir, "v1:z10:div65536", "events") { root =>
      Spatial.positions(spark, dir)
        .withColumn("zkey", Spatial.zkeyOf(col("lat"), col("lon")))
        .withColumn("z_bucket", expr(s"zkey div $BucketDiv"))
        .repartition(col("z_bucket"))
        .sortWithinPartitions("zkey")
        .write.partitionBy("z_bucket").parquet(root)
    }

  /** The z buckets a lat/lon box can touch: walk its grid-cell ranges
    * (inclusive, same floor/mask arithmetic as the stored key) and
    * collect the distinct top-bit buckets. Bounded by the box's cell
    * count — metadata scale, independent of the corpus. */
  private[graft] def bucketsFor(latLo: Double, latHi: Double,
      lonLo: Double, lonHi: Double): Seq[Int] = {
    val qls = math.floor((latLo - 39.0) * 1000.0).toLong to
      math.floor((latHi - 39.0) * 1000.0).toLong
    val qns = math.floor((lonLo + 75.0) * 500.0).toLong to
      math.floor((lonHi + 75.0) * 500.0).toLong
    (for { ql <- qls; qn <- qns }
      yield (zOf(ql & 1023L, qn & 1023L) / BucketDiv).toInt)
      .distinct.sorted.toSeq
  }

  // --------------------------------------------------------------- #66
  /** Bbox aggregate over the clustered store: bucket-pruned scan +
    * row-level box filter, per-user fix counts and centroid. */
  def zorderBbox(spark: SparkSession, dir: String): DataFrame = {
    val root = stageZStore(spark, dir)
    val (latLo, latHi, lonLo, lonHi) = (40.05, 40.15, -73.9, -73.7)
    val buckets = bucketsFor(latLo, latHi, lonLo, lonHi)
    require(buckets.size < 16, s"demo box must prune: $buckets")
    spark.read.parquet(root)
      .where(col("z_bucket").isin(buckets: _*))
      .where(col("lat") >= latLo && col("lat") <= latHi &&
        col("lon") >= lonLo && col("lon") <= lonHi)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_fixes"),
        davg(col("lat")).as("lat_avg"), davg(col("lon")).as("lon_avg"))
      .orderBy("user_id")
  }

  /** The clustered layout must be result-invisible: plain bbox SQL. */
  val zorderBboxOracle: String =
    s"""WITH pos AS (${Spatial.posSql})
       |SELECT user_id, COUNT(*) AS n_fixes,
       |  CAST(SUM(CAST(lat AS DECIMAL(18,6))) AS DOUBLE) / COUNT(lat) AS lat_avg,
       |  CAST(SUM(CAST(lon AS DECIMAL(18,6))) AS DOUBLE) / COUNT(lon) AS lon_avg
       |FROM pos
       |WHERE lat >= 40.05 AND lat <= 40.15 AND lon >= -73.9 AND lon <= -73.7
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder_cluster" -> (zorderBbox _))

  val oracles: Map[String, String] = Map(
    "q_zorder_cluster" -> zorderBboxOracle)
}
