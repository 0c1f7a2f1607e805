package graft.similarity

import graft.funcs.{dsum, r6, rN}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph analytics over the embedding corpus: PageRank centrality on
  * the mutual-kNN graph ([[KnnGraph]]) and farthest-point (k-center)
  * exemplar selection — the two remaining pillars of the
  * graph/curation family beside connected components
  * ([[graft.dedup.Components]]) and MMR ([[Mmr]]). A training-data
  * pipeline uses PageRank to weight documents by semantic centrality
  * (hub pruning, importance sampling) and k-center seeding to pick a
  * maximally-spread exemplar set (coreset construction, eval-set
  * seeding, k-means++-style initialization).
  *
  * Reference: signalk-parquet has no graph surface; these extend the
  * training-pipeline family the same way Mmr/KnnGraph do.
  */
object Graph2 {

  private val Iters = 8
  private val Damping = 0.85

  // --------------------------------------------------------------- #70
  /** PageRank (fixed 8 iterations, d = 0.85) over the UNDIRECTED
    * mutual-kNN edge set: rank flows both ways along each mutual
    * edge, r_{t+1}(v) = (1−d)/N + d·Σ_{u∼v} r_t(u)/deg(u).
    *
    * Scale shape: the canonical distributed PageRank — the edge table
    * (with each source's degree folded in ONCE up front) is
    * materialized a single time and every iteration is ONE
    * partial-aggregable shuffle of node-scale data: join the
    * node-sized rank table to the edges on src (at warehouse scale
    * both sides pre-bucketed on the node key, so the per-iteration
    * exchange is the rank table only), then groupBy(dst) with
    * map-side combine. Per-iteration `localCheckpoint` truncates the
    * lineage (the kmeans_fit pattern) so the plan never grows
    * 8-joins deep and the edge scan is never repeated from parquet.
    *
    * Cross-engine determinism: contributions rank/deg are one IEEE
    * divide of identical doubles, 12-dp rounded BEFORE the
    * DECIMAL(18,12) cast (an unrounded double can sit on a decimal
    * boundary where the two engines' cast rounding disagrees at the
    * last digit — measured: 246/NA rows off by 1e-12 without the
    * pre-round), summed through order-free decimal accumulators, and
    * each iteration's rank is 12-dp rounded on both engines — the
    * whole trajectory is bit-identical, no tolerance needed. Every
    * node in the mutual edge set has degree ≥ 1 and a contributing
    * neighbor, so the node set is closed under iteration (no dangling
    * mass). */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val g = KnnGraph.knnGraph(spark, dir).select("id_a", "id_b")
    val edges = g.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(g.select(col("id_b").as("src"), col("id_a").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val edgesDeg = edges.join(deg, "src")
    pageRankIterate(edgesDeg, deg)
  }

  /** The iteration core over a prepared (src, dst, deg) edge table and
    * its (src, deg) degree table — shared with the persisted-graph twin
    * ([[GraphStore.pageRankStored]]), which feeds it the SAME two
    * tables read back from the staged store instead of rebuilt from
    * raw vectors; BIGINT/deg round-trip parquet losslessly, so the two
    * callers' trajectories are bit-identical. */
  private[graft] def pageRankIterate(edgesDeg0: DataFrame, deg: DataFrame): DataFrame = {
    val edgesDeg = prepareEdges(edgesDeg0)
    val n = deg.agg(count(lit(1)).cast("double").as("n"))
    var ranks = deg.crossJoin(broadcast(n))
      .select(col("src").as("id"), rN(lit(1.0) / col("n"), 12).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to Iters) ranks = prIteration(edgesDeg, ranks, n).localCheckpoint()
    ranks.join(deg, ranks("id") === deg("src"))
      .select(col("id"), col("deg"), col("rank").as("pagerank"))
      .orderBy("id")
  }

  /** Establish the iteration join's partitioning ONCE (guide §2.4):
    * the edge table is hash-partitioned and sorted on `src` before its
    * checkpoint — localCheckpoint preserves partitioning AND ordering
    * — so every iteration REUSES that exchange and sort, shuffling
    * only the node-scale rank table. Previously the edge-scale side
    * re-shuffled on every one of the 8 iterations (8 × edge bytes),
    * the term that dominates at real graph scale (Graph2MarkovSpec
    * pins the iteration plan: no src-side exchange). */
  private[graft] def prepareEdges(edgesDeg0: DataFrame): DataFrame =
    edgesDeg0.repartition(col("src")).sortWithinPartitions("src")
      .localCheckpoint()

  /** One rank-flow step over a [[prepareEdges]]-prepared edge table. */
  private[graft] def prIteration(edgesDeg: DataFrame, ranks: DataFrame,
      n: DataFrame): DataFrame =
    edgesDeg.join(ranks, edgesDeg("src") === ranks("id"))
      .groupBy(col("dst"))
      .agg(dsum(rN(col("rank") / col("deg"), 12), 12).as("s"))
      .crossJoin(broadcast(n))
      .select(col("dst").as("id"),
        rN(lit(1.0 - Damping) / col("n") + lit(Damping) * col("s"), 12).as("rank"))

  /** Oracle unrolls the same 8 iterations as chained CTEs — identical
    * decimal accumulation and 12-dp per-iteration rounding, so the
    * comparison is bit-exact. The mutual-kNN CTE is MATERIALIZED:
    * `dir` references it twice, and letting DuckDB inline the
    * quadratic candidate scan twice pushed the 10× run past the
    * gate's 180 s budget (73 s materialized). */
  val pageRankOracle: String = {
    val base = s"${1.0 - Damping}/(SELECT n FROM nn)"
    val iterCtes = (1 to Iters).map { i =>
      s"""pr$i AS (
         |  SELECT e.dst AS id,
         |    ROUND($base + $Damping*CAST(SUM(CAST(ROUND(p.rank/e.deg, 12) AS DECIMAL(18,12))) AS DOUBLE), 12) AS rank
         |  FROM ed e JOIN pr${i - 1} p ON e.src = p.id
         |  GROUP BY e.dst
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH g AS MATERIALIZED (
       |  ${KnnGraph.knnGraphOracle.replace("ORDER BY id_a, id_b", "")}
       |),
       |dir AS (
       |  SELECT id_a AS src, id_b AS dst FROM g
       |  UNION ALL SELECT id_b, id_a FROM g
       |),
       |degt AS (SELECT src, COUNT(*) AS deg FROM dir GROUP BY src),
       |ed AS (SELECT d.src, d.dst, t.deg FROM dir d JOIN degt t ON d.src = t.src),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM degt),
       |pr0 AS (SELECT src AS id, ROUND(1.0/(SELECT n FROM nn), 12) AS rank FROM degt),
       |$iterCtes
       |SELECT p.id, t.deg, p.rank AS pagerank
       |FROM pr$Iters p JOIN degt t ON p.id = t.src
       |ORDER BY p.id""".stripMargin
  }

  // --------------------------------------------------------------- #71
  private val K = 5

  /** Farthest-point (k-center / Gonzalez) selection: greedily pick
    * k = 5 vectors from a deterministic pool slice, starting at the
    * lowest vec_id, each round adding the candidate whose distance to
    * its NEAREST already-chosen center is LARGEST (squared euclidean,
    * ties to the lower vec_id) — the maximally-spread exemplar picker
    * (2-approximation of the k-center optimum) a curation pipeline
    * uses for coreset seeding where MMR's λ-blend would still chase
    * relevance.
    *
    * Scale shape — the [[Mmr.mmrSelect]] pattern: inherently
    * sequential in k, so k driver rounds, each ONE distributed pass
    * over the localCheckpointed pool with the chosen set broadcast
    * (k × 64 doubles); per-round argmax is a TakeOrdered. The corpus
    * never shuffles; at 100 TB the pool is an ANN/stratified
    * pre-selection, result-sized not corpus-sized.
    *
    * Cross-engine determinism: each squared distance resolves from
    * the SAME rounded quantities both engines hold (norm2 + dot via
    * index-ordered folds), rounded to 6 dp before the min/argmax, and
    * ties break on vec_id — the greedy trajectory is engine-exact. */
  def kCenter(spark: SparkSession, dir: String): DataFrame = {
    val pool = Embeddings.vecs(spark, dir)
      .where(col("vec_id") % 3 === 1)
      .select("vec_id", "v", "norm2")
      .localCheckpoint()
    case class Pick(rank: Long, vecId: Long, minDist2: Option[Double],
        v: Seq[Double], norm2: Double)
    val first = pool.orderBy("vec_id").limit(1)
      .select("vec_id", "v", "norm2").head()
    val picks = scala.collection.mutable.ArrayBuffer(
      Pick(1L, first.getLong(0), None, first.getSeq[Double](1), first.getDouble(2)))
    while (picks.size < K) {
      import spark.implicits._
      val sel = picks.map(p => (p.vecId, p.v, p.norm2)).toSeq
        .toDF("sid", "sv", "snorm2")
      val top = pool
        .where(!col("vec_id").isin(picks.map(_.vecId).toSeq: _*))
        .crossJoin(broadcast(sel))
        .withColumn("d2",
          r6(col("norm2") + col("snorm2") - lit(2.0) * expr("graft_dot(v, sv)")))
        .groupBy("vec_id")
        .agg(min("d2").as("min_dist2"))
        .orderBy(col("min_dist2").desc, col("vec_id")).limit(1).head()
      val id = top.getLong(0)
      val row = pool.where(col("vec_id") === id).select("v", "norm2").head()
      picks += Pick(picks.size + 1L, id, Some(top.getDouble(1)),
        row.getSeq[Double](0), row.getDouble(1))
    }
    val schema = StructType(Seq(
      StructField("rank", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("min_dist2", DoubleType, nullable = true)))
    val rows: java.util.List[Row] = java.util.Arrays.asList(picks.toSeq.map(p =>
      Row(p.rank, p.vecId, p.minDist2.map(Double.box).orNull)): _*)
    spark.createDataFrame(rows, schema).orderBy("rank")
  }

  private def d2Sql(a: String, b: String, na: String, nb: String): String =
    s"ROUND($na + $nb - 2.0*list_dot_product($a, $b), 6)"

  val kCenterOracle: String =
    s"""WITH RECURSIVE e AS (${Embeddings.vecsSql}),
       |pool AS (SELECT vec_id, v, norm2 FROM e WHERE vec_id % 3 = 1),
       |sel AS (
       |  SELECT CAST(1 AS BIGINT) AS rank, vec_id,
       |    CAST(NULL AS DOUBLE) AS min_dist2, [vec_id] AS chosen
       |  FROM (SELECT * FROM pool ORDER BY vec_id LIMIT 1)
       |  UNION ALL
       |  SELECT s.rank + 1, t.vec_id, t.min_dist2,
       |    list_append(s.chosen, t.vec_id)
       |  FROM sel s JOIN LATERAL (
       |    SELECT c.vec_id,
       |      (SELECT MIN(${d2Sql("c.v", "sv.v", "c.norm2", "sv.norm2")})
       |       FROM pool sv WHERE list_contains(s.chosen, sv.vec_id)) AS min_dist2
       |    FROM pool c
       |    WHERE NOT list_contains(s.chosen, c.vec_id)
       |    ORDER BY min_dist2 DESC, c.vec_id LIMIT 1
       |  ) t ON true
       |  WHERE s.rank < $K
       |)
       |SELECT rank, vec_id, min_dist2 FROM sel ORDER BY rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (pageRank _),
    "embed_kcenter" -> (kCenter _))

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> pageRankOracle,
    "embed_kcenter" -> kCenterOracle)
}
