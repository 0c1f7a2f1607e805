package graft.streaming

import graft.operators.Skyline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental skyline maintenance — the streaming twin of
  * [[graft.operators.Skyline]]: the pareto frontier kept current as
  * catalog rows arrive (the live "best offers" board).
  *
  * The algebra that makes it stream: skyline(A ∪ B) =
  * skyline(skyline(A) ∪ B) — dominance is transitive, so a point
  * dominated by a non-skyline point is also dominated by that point's
  * dominator, and discarding dominated points early never changes the
  * final frontier. The state is therefore ONLY the current frontier
  * (result-sized — for a 2-D skyline, at most one point per distinct
  * frontier price), each batch runs the batch operator's prefix-max
  * core over frontier ∪ batch, and the store swaps atomically
  * (tier-maintenance discipline). Batch order is irrelevant
  * (set-union commutes), so slices hash-split; trigger-at-a-time ≡
  * one-shot and the BATCH oracle carries over verbatim. At 100 TB the
  * arriving batch dominates the cost and the frontier rides along as
  * a tiny union — the stream never rescans history.
  */
object SkylineStream {

  // --------------------------------------------------------------- #76
  def streamSkyline(spark: SparkSession, dir: String): DataFrame = {
    val p = graft.Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_retailprice").as("price"),
        col("p_size").as("size"))
    val srcDir = java.nio.file.Files.createTempDirectory("graft_sky_src").toString
    p.repartition(3, pmod(col("p_partkey"), lit(3)))
      .write.mode("overwrite").parquet(srcDir)
    val store = java.nio.file.Files.createTempDirectory("graft_sky_store").toString + "/frontier"
    p.limit(0).write.parquet(store)
    val fs = graft.util.Fs.of(spark, store)
    val q = spark.readStream.schema(p.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sp = batch.sparkSession
        val next = Skyline.skylineOf(
          sp.read.parquet(store).unionByName(batch))
        val tmp = store + "_next"
        next.coalesce(1).write.mode("overwrite").parquet(tmp)
        fs.delete(new org.apache.hadoop.fs.Path(store), true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp),
          new org.apache.hadoop.fs.Path(store))
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_ckpt_sky").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(store)
      .select(col("p_partkey"), col("price").as("p_retailprice"),
        col("size").as("p_size"))
      .orderBy("p_partkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_skyline" -> (streamSkyline _))

  val oracles: Map[String, String] = Map(
    // skyline(skyline(A) ∪ B) = skyline(A ∪ B) → batch oracle verbatim
    "stream_skyline" -> Skyline.skylineOracle)
}
