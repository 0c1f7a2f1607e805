package graft

import graft.dedup.{BloomDedup, Dedup}
import org.apache.spark.sql.functions._

/** dedup_bloom must be bit-identical to the exact computation: the
  * Bloom sketch is only a prefilter and the semi-join verification
  * kills its false positives, so the output is independent of the
  * sketch's bit budget (and of fpp entirely).
  */
class BloomDedupSpec extends SparkSpec {

  test("bloom prefilter + exact verify ≡ exact incremental semantics") {
    val out = BloomDedup.bloomIncrementalDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    // independent exact reference, no bloom anywhere
    val docs = Tables.documents(spark, sfDir).withColumn("h", md5(col("text")))
    val batch = docs.where(col("doc_id") % 10 === 0).select("doc_id", "h")
    val store = docs.where(col("doc_id") % 10 =!= 0).select("h").distinct()
    val firstPerH = batch.groupBy("h").agg(min("doc_id").as("first_id"))
    val expected = batch
      .join(store.withColumn("in_store", lit(true)), Seq("h"), "left")
      .join(firstPerH, Seq("h"))
      .select(col("doc_id"),
        when(col("in_store"), lit("dup_store"))
          .when(col("doc_id") =!= col("first_id"), lit("dup_batch"))
          .otherwise(lit("new")).as("status"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    assert(out == expected)
    assert(out.nonEmpty)
  }

  test("statuses partition the batch and agree with dedup_incremental") {
    // same split convention, same contract — the two mechanisms must
    // label every arriving doc identically
    val bloom = BloomDedup.bloomIncrementalDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val inc = Dedup.incrementalDedup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(bloom == inc)
  }
}
