package graft

import graft.operators.Seasonal
import graft.text.Novelty
import org.apache.spark.sql.functions._

/** Per-doc n-gram novelty (text/Novelty.scala) and hour-of-day
  * seasonal decomposition (operators/Seasonal.scala). */
class NoveltySeasonalSpec extends SparkSpec {

  test("novelty is a share in [0,1], the first doc owns all its grams, and ownership tiles the gram set") {
    val out = Novelty.novelty(spark, sfDir).cache()
    assert(out.where(col("novelty") < 0 || col("novelty") > 1).count() === 0)
    assert(out.where(col("n_novel") > col("n_grams")).count() === 0)
    // the lowest doc_id with grams owns every one of its grams
    val first = out.orderBy("doc_id").limit(1).head()
    assert(first.getAs[Long]("n_novel") === first.getAs[Long]("n_grams"))
    // every distinct gram has exactly one owner: ownership tiles the corpus
    val g = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(graft.functions.NGrams.ngrams(split(col("text"), " "), 5)).as("ngram"))
    val distinctGrams = g.select("ngram").distinct().count()
    assert(out.agg(sum("n_novel")).head().getLong(0) === distinctGrams)
    // docs shorter than the gram width emit no row
    assert(out.count() ===
      g.select("doc_id").distinct().count())
  }

  test("seasonal components reconcile: bucket counts tile and weighted offsets cancel") {
    val out = Seasonal.seasonalHod(spark, sfDir).cache()
    assert(out.where(col("hod") < 0 || col("hod") > 23).count() === 0)
    // per type, hod bucket counts sum to the type's total bucket count
    val buckets = Tables.events(spark, sfDir)
      .withColumn("bucket_ms", (floor(col("ts_ms") / lit(3600000L)) * 3600000L).cast("long"))
      .groupBy("event_type", "bucket_ms").count()
      .groupBy("event_type").agg(count(lit(1)).as("total"))
    val tiled = out.groupBy("event_type").agg(sum("n_buckets").as("s"))
      .join(buckets, "event_type")
      .where(col("s") =!= col("total"))
    assert(tiled.count() === 0)
    // the bucket-weighted mean of seasonal offsets is ~0 per type
    // (definitionally exact up to the 6-dp roundings)
    val cancel = out.groupBy("event_type")
      .agg((sum(col("seasonal_offset") * col("n_buckets")) / sum("n_buckets")).as("w"))
      .where(abs(col("w")) > 1e-4)
    assert(cancel.count() === 0)
  }
}
