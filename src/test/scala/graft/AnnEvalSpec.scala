package graft

import graft.similarity.{AnnEval, Embeddings}
import org.apache.spark.sql.functions._

/** ANN recall@k evaluation (similarity/AnnEval.scala). */
class AnnEvalSpec extends SparkSpec {

  private lazy val out = AnnEval.annRecall(spark, sfDir).cache()

  test("one row per probe; recall in [0,1] with n_hits <= k") {
    val probes = Embeddings.annTopK(spark, sfDir)
      .select("probe_id").distinct().count()
    assert(out.count() === probes)
    assert(out.where(col("recall_at_k") < 0 || col("recall_at_k") > 1).count() === 0)
    assert(out.where(col("n_hits") > col("k")).count() === 0)
  }

  test("recall matches a direct set intersection of the two rank lists") {
    val exact = Embeddings.annTopK(spark, sfDir)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Embeddings.annIvfTopK(spark, sfDir)
      .select("probe_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out.collect().foreach { r =>
      val p = r.getAs[Long]("probe_id")
      val expK = exact.count(_._1 == p)
      val expHits = exact.count(t => t._1 == p && approx.contains(t))
      assert(r.getAs[Long]("k") === expK)
      assert(r.getAs[Long]("n_hits") === expHits)
      assert(r.getAs[Double]("recall_at_k") === expHits.toDouble / expK)
    }
  }

  test("IVF with nprobe=4 recalls a nontrivial share of the exact top-10") {
    // the index is useful, not vacuous: average recall strictly positive
    val mean = out.agg(avg("recall_at_k")).head().getDouble(0)
    assert(mean > 0.2, s"avg recall $mean")
  }

  test("mrr: reciprocal rank matches a direct lookup of the true top-1 in the ivf list") {
    val mrr = AnnEval.annMrr(spark, sfDir).collect()
    val exact1 = Embeddings.annTopK(spark, sfDir)
      .where(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("neighbor_id")).toMap
    val ivf = Embeddings.annIvfTopK(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Int]("rank")).toMap
    assert(mrr.length === exact1.size)
    mrr.foreach { r =>
      val p = r.getAs[Long]("probe_id")
      assert(r.getAs[Long]("true_top1") === exact1(p))
      ivf.get((p, exact1(p))) match {
        case Some(k) => assert(r.getAs[Double]("rr") === 1.0 / k)
        case None => assert(r.getAs[Double]("rr") === 0.0)
      }
    }
  }
}
