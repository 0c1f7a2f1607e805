package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN index-quality evaluation: recall@k of the IVF retrieval
  * ([[Embeddings.annIvfTopK]]) against the exact brute-force ground
  * truth ([[Embeddings.annTopK]]) — the measurement a pipeline runs
  * before trusting an approximate index for dedup or retrieval, and
  * re-runs after every re-embed/re-cluster to catch recall drift.
  * Completes the ANN family: build (35/35a), compress (40y-40aa),
  * persist (40ae2), and now MEASURE.
  *
  * Scale shape: both legs are the existing operators (probes
  * broadcast, corpus never shuffles); the comparison itself is a
  * LEFT SEMI join of two k-row-per-probe rank lists — probe-count
  * sized, metadata at any corpus scale. Recall is a BIGINT/BIGINT
  * double division of identical operands (cross-engine exact); the
  * ground-truth leg defines k per probe (k < 10 only if the corpus
  * itself has fewer than 10 neighbors).
  */
object AnnEval {

  // -------------------------------------------------------------- #100
  /** Per-probe recall@10 of IVF(nprobe=4) vs exact cosine top-10. */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = Embeddings.annTopK(spark, dir).select("probe_id", "neighbor_id")
    val approx = Embeddings.annIvfTopK(spark, dir).select("probe_id", "neighbor_id")
    val hits = exact.join(approx, Seq("probe_id", "neighbor_id"), "left_semi")
      .groupBy("probe_id").agg(count(lit(1)).as("n_hits"))
    exact.groupBy("probe_id").agg(count(lit(1)).as("k"))
      .join(hits, Seq("probe_id"), "left")
      .select(col("probe_id"), col("k"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / col("k"))
          .as("recall_at_k"))
      .orderBy("probe_id")
  }

  /** Oracle composes the two proven sub-oracles verbatim as nested
    * CTEs and applies the identical set-intersection recall. */
  val annRecallOracle: String =
    s"""WITH exact AS MATERIALIZED (
       |${Embeddings.annTopKOracle}
       |), approx AS MATERIALIZED (
       |${Embeddings.annIvfTopKOracle}
       |), hits AS (
       |  SELECT e.probe_id, COUNT(*) AS n_hits
       |  FROM exact e JOIN approx a
       |    ON a.probe_id = e.probe_id AND a.neighbor_id = e.neighbor_id
       |  GROUP BY e.probe_id
       |), base AS (
       |  SELECT probe_id, COUNT(*) AS k FROM exact GROUP BY probe_id
       |)
       |SELECT b.probe_id, b.k, COALESCE(h.n_hits, 0) AS n_hits,
       |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE)/b.k AS recall_at_k
       |FROM base b LEFT JOIN hits h ON b.probe_id = h.probe_id
       |ORDER BY b.probe_id""".stripMargin

  // -------------------------------------------------------------- #108
  /** Reciprocal rank of the TRUE nearest neighbor inside the IVF
    * list — the complementary index-quality number to [[annRecall]]:
    * recall@10 says how much of the answer set survives; MRR says
    * whether the single best answer surfaces, and at which position
    * (the metric RAG retrieval actually optimizes). rr = 1/rank of
    * the exact top-1 in the IVF ranking, 0 when the index misses it
    * entirely. Same probe-sized comparison shape as recall. */
  def annMrr(spark: SparkSession, dir: String): DataFrame = {
    val exactTop1 = Embeddings.annTopK(spark, dir)
      .where(col("rank") === 1)
      .select(col("probe_id"), col("neighbor_id").as("true_top1"))
    val approx = Embeddings.annIvfTopK(spark, dir)
      .select(col("probe_id"), col("neighbor_id"), col("rank").as("ivf_rank"))
    exactTop1
      .join(approx,
        approx("probe_id") === exactTop1("probe_id") &&
          col("neighbor_id") === col("true_top1"), "left")
      .select(exactTop1("probe_id"), col("true_top1"),
        col("ivf_rank"),
        coalesce(lit(1.0) / col("ivf_rank").cast("double"), lit(0.0)).as("rr"))
      .orderBy(exactTop1("probe_id"))
  }

  val annMrrOracle: String =
    s"""WITH exact AS MATERIALIZED (
       |${Embeddings.annTopKOracle}
       |), approx AS MATERIALIZED (
       |${Embeddings.annIvfTopKOracle}
       |), top1 AS (
       |  SELECT probe_id, neighbor_id AS true_top1 FROM exact WHERE rank = 1
       |)
       |SELECT t.probe_id, t.true_top1, a.rank AS ivf_rank,
       |  COALESCE(CAST(1.0 AS DOUBLE) / a.rank, 0.0) AS rr
       |FROM top1 t LEFT JOIN approx a
       |  ON a.probe_id = t.probe_id AND a.neighbor_id = t.true_top1
       |ORDER BY t.probe_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_recall_eval" -> (annRecall _),
    "ann_mrr_eval" -> (annMrr _))

  val oracles: Map[String, String] = Map(
    "ann_recall_eval" -> annRecallOracle,
    "ann_mrr_eval" -> annMrrOracle)
}
