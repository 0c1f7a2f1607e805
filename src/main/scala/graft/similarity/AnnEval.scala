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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_recall_eval" -> (annRecall _))

  val oracles: Map[String, String] = Map(
    "ann_recall_eval" -> annRecallOracle)
}
