package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Regression pin for SURVEY §5a #24: with index-linear permutation
  * coefficients (a_i = 2i+3, b_i = 1000003·i) the 128 MinHash maps
  * were so correlated that near-dup pairs at jaccard ≈ 0.96 missed
  * ALL 16 bands — 56 pairs lost at sf0.1 against the exact oracle.
  * This spec drives adversarial synthetic clusters through the REAL
  * operator path (signatures → collapse → banding → exact verify) and
  * demands the LSH output equal the exact O(n²) answer, which is what
  * the independence-based recall bound 1-(1-j⁸)¹⁶ ≈ 1 - 2e-10
  * promises for j ≥ 0.95.
  */
class MinHashRecallSpec extends SparkSpec {
  import spark.implicits._

  // 40 docs per cluster, each dropping ONE distinct token from a
  // 30-token base (pairwise j = 28/30 ≈ 0.933 < 0.95, doc-vs-full
  // j = 29/30 ≈ 0.967 ≥ 0.95): exactly the shape that exposed the
  // correlated-permutation miss (one token difference must flip
  // signature positions independently, not in runs).
  private def cluster(base: Int, tokens: Int, docs: Int): Seq[(Long, String)] = {
    val toks = (0 until tokens).map(t => s"tok_${base}_$t")
    val full = (0L + base * 1000) -> toks.mkString(" ")
    val dropped = (0 until docs).map { i =>
      (base * 1000L + i + 1) -> toks.zipWithIndex
        .collect { case (t, j) if j != (i % tokens) => t }.mkString(" ")
    }
    full +: dropped
  }

  test("LSH output equals the exact answer on adversarial one-token clusters") {
    val docs = (cluster(1, 30, 29) ++ cluster(2, 40, 39)).toDF("doc_id", "text")
    val got = Dedup.minHashLshOn(docs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // exact reference: every pair with round-6 jaccard >= 0.95
    val exact = {
      val t = docs.select(col("doc_id"), Dedup.tokens.as("toks"))
      val a = t.select(col("doc_id").as("id_a"), col("toks").as("toks_a"))
      val b = t.select(col("doc_id").as("id_b"), col("toks").as("toks_b"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))).cast("double"))
        .withColumn("j", funcs.rN(col("inter") /
          (size(col("toks_a")) + size(col("toks_b")) - col("inter")), 6))
        .where(col("j") >= 0.95)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    }
    assert(exact.nonEmpty, "fixture must contain qualifying pairs")
    // cluster 1 (30 tokens): full-vs-drop 29/30 ≈ 0.967 qualifies (29
    // pairs), drop-vs-drop 28/30 ≈ 0.933 does not — discrimination.
    // cluster 2 (40 tokens): full-vs-drop 39/40 (39 pairs) AND
    // drop-vs-drop 38/40 = 0.95 exactly at the inclusive threshold
    // (C(39,2) = 741 pairs) — boundary inclusion.
    assert(exact.size == 29 + 39 + 741, s"fixture shape: ${exact.size}")
    val missed = exact -- got
    assert(missed.isEmpty, s"LSH missed ${missed.size} qualifying pairs: ${missed.take(5)}")
    assert((got -- exact).isEmpty, "LSH emitted a sub-threshold pair")
  }
}
