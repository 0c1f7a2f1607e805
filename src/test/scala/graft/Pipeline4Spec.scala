package graft

import graft.text.Pipeline4
import org.apache.spark.sql.functions._

class Pipeline4Spec extends SparkSpec {

  test("shuffle_shards: shards are balanced and positions are contiguous per shard") {
    val df = Pipeline4.shuffleShards(spark, sfDir).cache()
    val sizes = df.groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = sizes.values.sum
    assert(sizes.keySet.subsetOf((0 until 16).toSet))
    // md5 nibble is uniform: no shard should be grossly oversized
    val mean = n.toDouble / 16
    assert(sizes.values.max < 3 * mean, sizes.toString)
    // positions are 1..count within every shard (a loader can range-
    // partition a shard without gaps)
    val badPos = df.groupBy("shard")
      .agg(count(lit(1)).as("c"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("d"))
      .where(col("mx") =!= col("c") || col("mn") =!= 1 || col("d") =!= col("c"))
      .count()
    assert(badPos == 0)
    df.unpersist()
  }

  test("shuffle_shards: order is content-independent of input partitioning") {
    val a = Pipeline4.shuffleShards(spark, sfDir).collect().toSeq
    // same corpus arriving in a different physical layout must yield
    // the identical shuffle manifest (reproducible resumption)
    val docs = Tables.documents(spark, sfDir).repartition(7)
    val h = md5(col("doc_id").cast("string"))
    val b = docs.select(col("doc_id"), h.as("h"))
      .withColumn("shard", conv(substring(col("h"), 1, 1), 16, 10).cast("int"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
          .orderBy(col("h"), col("doc_id"))).cast("long"))
      .select("shard", "pos", "doc_id")
      .orderBy("shard", "pos").collect().toSeq
    assert(a == b)
  }

  test("classifier_fit: weights are partition-count invariant (decimal gradient sums)") {
    val base = Pipeline4.features(Tables.documents(spark, sfDir))
    def fit(parts: Int): Seq[(Double, Double, Double, Double)] = {
      var w = spark.range(1).select(
        lit(0.0).as("w0"), lit(0.0).as("w1"), lit(0.0).as("w2"), lit(0.0).as("w3"))
      val f = base.repartition(parts).localCheckpoint()
      (1 to 3).map { _ =>
        w = Pipeline4.step(f, w).localCheckpoint(false)
        val r = w.head
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      }
    }
    // bit-identical across 1, 4, and 13 partitions — the gradient is
    // order-independent because every sum runs through DECIMAL(18,6)
    val one = fit(1)
    assert(fit(4) == one)
    assert(fit(13) == one)
  }

  test("classifier_fit: 3 GD rounds beat the zero model on training hinge loss") {
    import spark.implicits._
    val f = Pipeline4.features(Tables.documents(spark, sfDir)).localCheckpoint()
    var w = spark.range(1).select(
      lit(0.0).as("w0"), lit(0.0).as("w1"), lit(0.0).as("w2"), lit(0.0).as("w3"))
    def loss(wf: org.apache.spark.sql.DataFrame): Double = {
      val z = col("w0") + col("w1") * col("x1") + col("w2") * col("x2") +
        col("w3") * col("x3")
      val yhat = greatest(lit(0.0), least(lit(1.0), lit(0.25) * z + lit(0.5)))
      f.crossJoin(broadcast(wf))
        .agg(avg(pow(yhat - col("y"), 2))).head.getDouble(0)
    }
    val l0 = loss(w)
    (1 to 3).foreach { _ => w = Pipeline4.step(f, w).localCheckpoint(false) }
    val l3 = loss(w)
    // full-batch GD on a convex surrogate must reduce training loss
    assert(l3 < l0, s"l0=$l0 l3=$l3")
  }
}
