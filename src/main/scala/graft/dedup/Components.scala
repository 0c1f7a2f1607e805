package graft.dedup

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: connected components over the
  * near-duplicate pair graph.
  *
  * Pairwise dedup (Jaccard/MinHash/SimHash) yields EDGES; a training
  * pipeline needs CLUSTERS — "keep one doc per component" — so the
  * final step is connected components over the pair graph. Implemented
  * as iterative hash-min label propagation: every node starts labeled
  * with itself, each round every node takes the min label among itself
  * and its neighbors, repeat to fixpoint. Rounds = graph diameter;
  * near-dup graphs are dense clusters with tiny diameters, so this
  * converges in a handful of rounds (a 20-round cap guards pathological
  * chains — the large-star/small-star variant would bound rounds at
  * O(log n) if chains ever mattered).
  *
  * Scale: each round is one shuffle (edge⋈label join + min-agg on the
  * node id) over data proportional to |E| — the same cost class as one
  * dedup verify pass, run O(diameter) times. Lineage is truncated per
  * round with localCheckpoint so the plan stays constant-size (at
  * cluster scale, `checkpoint` to durable storage instead).
  */
object Components {

  /** Connected components of an undirected edge list (src, dst).
    * Returns (id, component_id = min node id in the component). */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = e.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      val prop = e.join(labels, e("src") === labels("id"))
        .select(col("dst").as("id"), col("lbl"))
      val next = labels.unionByName(prop)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint()
      changed = next.alias("n")
        .join(labels.select(col("id"), col("lbl").as("old")), "id")
        .where(col("lbl") < col("old")).count()
      labels = next
      round += 1
    }
    labels.select(col("id"), col("lbl").as("component_id"))
  }

  /** Near-dup clusters over documents: blocked exact-Jaccard ≥ 0.8
    * pairs as edges, then components, summarized per cluster. The 0.8
    * threshold (vs 0.95 for pair dedup) links the looser "same family"
    * docs a cluster-level keeper policy wants to see together. */
  def nearDupComponents(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 50).cast("long").as("size_bucket"),
        Dedup.tokens.as("toks"))
    val a = docs.select(col("lang"), col("size_bucket"),
      col("doc_id").as("src"), col("toks").as("toks_a"))
    val b = docs.select(col("lang"), col("size_bucket"),
      col("doc_id").as("dst"), col("toks").as("toks_b"))
    val edges = a.join(b, Seq("lang", "size_bucket"))
      .where(col("src") < col("dst"))
      .where(Dedup.jaccard(col("toks_a"), col("toks_b")) >= 0.8)
      .select("src", "dst")
    connectedComponents(edges)
      .groupBy("component_id")
      .agg(count(lit(1)).as("n_members"),
        sum("id").as("id_sum"),
        max("id").as("max_id"))
      .orderBy("component_id")
  }

  val componentsOracle: String =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, lang, n_chars // 50 AS size_bucket,
      |    list_distinct(string_split(text, ' ')) AS toks FROM documents
      |), pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM t a JOIN t b
      |    ON a.lang = b.lang AND a.size_bucket = b.size_bucket AND a.doc_id < b.doc_id
      |  WHERE ROUND(len(list_intersect(a.toks, b.toks))::DOUBLE /
      |    (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6) >= 0.8
      |), e AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs
      |), n AS (SELECT DISTINCT src AS id FROM e),
      |reach AS (
      |  SELECT id, id AS lbl FROM n
      |  UNION
      |  SELECT e.dst AS id, r.lbl FROM reach r JOIN e ON e.src = r.id WHERE r.lbl < e.dst
      |), comp AS (SELECT id, MIN(lbl) AS component_id FROM reach GROUP BY 1)
      |SELECT component_id, COUNT(*) AS n_members,
      |  CAST(SUM(id) AS BIGINT) AS id_sum, MAX(id) AS max_id
      |FROM comp GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_components" -> (nearDupComponents _))

  val oracles: Map[String, String] = Map(
    "dedup_components" -> componentsOracle)
}
