package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (pareto-frontier) query — Börzsönyi, Kossmann & Stocker,
  * ICDE 2001: the parts no other part beats on BOTH objectives
  * (lower-or-equal price AND greater-or-equal size, strictly better
  * on at least one). The multi-objective "best offers" shape every
  * catalog/procurement analytics layer needs and SQL only expresses
  * as a quadratic NOT EXISTS.
  */
object Skyline {

  // --------------------------------------------------------------- #73
  /** 2-D skyline of `part` minimizing p_retailprice, maximizing
    * p_size.
    *
    * Scale shape — NOT the O(n²) dominance join: a point q(price x,
    * size s) is skyline iff s exceeds every size at a strictly lower
    * price and no same-price point is larger, i.e. `s > M<(x) AND
    * s = max-at-price(x)` where M<(x) is the prefix-max of size over
    * prices < x. That prefix-max runs as the textbook TWO-LEVEL
    * distributed scan, all on the DISTINCT-PRICE frame (corpus
    * collapsed first by a partial-aggregable groupBy(price)):
    * per-bucket running max inside range buckets (parallel windows),
    * then the O(buckets) bucket-maxima frame takes its prefix max in
    * one tiny single-partition window (64 rows — the sk_power_budget
    * metadata-frame class, never corpus data) and broadcasts back.
    * The corpus itself sees one groupBy and one equi-join against the
    * distinct-price stats — no self-join, no global sort, no
    * quadratic pair work; dimensions beyond 2 would switch to the
    * block-nested-loop-with-prefiltering family, documented not
    * built. The two price-bound literals are a driver-side
    * metadata-scale lookup (the z-order bucket-enumeration
    * precedent). */
  def skyline(spark: SparkSession, dir: String): DataFrame =
    skylineOf(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_retailprice").as("price"),
          col("p_size").as("size")))
      .select(col("p_partkey"), col("price").as("p_retailprice"),
        col("size").as("p_size"))
      .orderBy("p_partkey")

  /** The skyline core over any (p_partkey, price, size) frame — shared
    * with the incremental streaming twin
    * ([[graft.streaming.SkylineStream]]), which exploits
    * skyline(A ∪ B) = skyline(skyline(A) ∪ B). */
  def skylineOf(p: DataFrame): DataFrame = {
    val prices = p.groupBy("price").agg(max("size").as("mx"))
      .localCheckpoint() // bounds lookup + stats build share one scan
    val bounds = prices.agg(min("price"), max("price")).head()
    if (bounds.isNullAt(0)) return p.limit(0).select("p_partkey", "price", "size")
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    val nb = 64
    val w = math.max((hi - lo) / nb, 1e-9)
    val bucketed = prices.withColumn("b",
      least(floor((col("price") - lit(lo)) / lit(w)), lit(nb - 1)).cast("int"))
    val inBucket = Window.partitionBy("b").orderBy("price")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("m_in", max("mx").over(inBucket))
    val overBuckets = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = bucketed.groupBy("b").agg(max("mx").as("bm"))
      .withColumn("m_lo", max("bm").over(overBuckets))
      .select("b", "m_lo")
    val stats = local.join(broadcast(prefix), "b")
      .withColumn("m_lt",
        greatest(coalesce(col("m_in"), lit(Int.MinValue)),
          coalesce(col("m_lo"), lit(Int.MinValue))))
      .select("price", "mx", "m_lt")
    p.join(stats, "price")
      .where(col("size") === col("mx") && col("size") > col("m_lt"))
      .select("p_partkey", "price", "size")
  }

  /** Oracle is the definitional quadratic dominance test — maximally
    * independent of the prefix-max characterization the operator
    * uses (part stays sf0.1-sized in the 10× corpus, so the n² stays
    * inside the gate budget). */
  val skylineOracle: String =
    """SELECT q.p_partkey, q.p_retailprice, q.p_size
      |FROM part q
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part p
      |  WHERE p.p_retailprice <= q.p_retailprice AND p.p_size >= q.p_size
      |    AND (p.p_retailprice < q.p_retailprice OR p.p_size > q.p_size))
      |ORDER BY q.p_partkey""".stripMargin

  // --------------------------------------------------------------- #79
  /** 3-objective skyline of `part`: minimize p_retailprice, maximize
    * p_size, maximize length(p_name) — the dimension step where the
    * 2-D prefix-max characterization alone stops working (a third
    * objective has no single total order to prefix over) and the
    * block-nested-loop-with-prefiltering family this file documented
    * as "not built" becomes the plan.
    *
    * Scale shape, three stages, all on the DISTINCT-TRIPLE frame
    * (corpus collapses first via one partial-aggregable groupBy):
    *
    *  1. CERTIFICATION by the 2-D operator — the prefix-max prefilter:
    *     a triple on the (price, size) 2-D skyline that also carries
    *     the max quality of its exact (price, size) class is PROVABLY
    *     3-D skyline (a dominator would need price ≤ and size ≥; on
    *     the 2-D frontier that forces price =, size =, then qual =
    *     max — no strict coordinate left). [[skylineOf]] runs verbatim
    *     as the certifier; certified points skip stage 2 entirely.
    *  2. PER-BUCKET dominance (the distributed BNL): a dominator has
    *     price ≤ the point's, but within a price-range bucket the
    *     pair work is bounded by the bucket population (the blocked-
    *     Jaccard discipline) — one equi-join on the bucket id with the
    *     dominance residual, anti-joining away locally dominated
    *     points. A true-skyline point is dominated by nobody, so every
    *     true-skyline point survives its bucket.
    *  3. GLOBAL MERGE over the RESULT-SIZED pool: if a point is
    *     dominated at all, it is dominated by a true-skyline point
    *     (dominance is transitive and antisymmetric on distinct
    *     triples), and every true-skyline point is in
    *     cert ∪ local-survivors — so the final anti-join's dominator
    *     side is frontier-sized and broadcasts; the corpus never
    *     self-joins globally.
    *
    * ≡ the definitional quadratic NOT EXISTS oracle (independent
    * formulation); Skyline3Spec pins bit-equality with the in-engine
    * brute force and the certification soundness invariant. */
  def skyline3(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_retailprice").as("price"),
        col("p_size").as("size"), length(col("p_name")).as("qual"))
    skyline3Of(p)
  }

  /** The 3-objective core over any (p_partkey, price, size, qual)
    * frame — separated so the spec can drive a price-degenerate corpus
    * through the real stages. */
  private[graft] def skyline3Of(p: DataFrame): DataFrame = {
    val t = p.groupBy("price", "size", "qual").agg(count(lit(1)).as("n"))
      .select("price", "size", "qual")
      .localCheckpoint() // shared by certifier, bucket join and merge
    // ---- stage 1: 2-D certification (prefix-max prefilter, reused)
    val sky2 = skylineOf(t.select(col("qual").as("p_partkey"), col("price"), col("size")))
      .select(col("p_partkey").as("qual"), col("price"), col("size"))
    val qmax = t.groupBy("price", "size").agg(max("qual").as("qmax"))
    val cert = sky2.join(qmax, Seq("price", "size"))
      .where(col("qual") === col("qmax"))
      .select("price", "size", "qual")
      .localCheckpoint()
    // ---- stage 2: per-bucket dominance over the uncertain rest.
    // EQUI-DEPTH buckets (r14 verdict "what's wrong" #4): ntile over
    // the distinct-triple order bounds every bucket's population at
    // ceil(T/nb) BY CONSTRUCTION — an equal-width price grid put a
    // price-degenerate corpus's whole triple frame in one bucket and
    // went quadratic on it (Skyline3Spec drives a 90%-one-price corpus
    // through this core and pins the bound). Bucketing is a pure
    // prefilter: the final frontier is BUCKETING-INVARIANT (stage 3
    // removes everything a true-skyline point dominates, and true
    // points survive any blocking), so at warehouse scale the ntile
    // window over the distinct-triple frame can be replaced by
    // approx-quantile split points without touching the answer —
    // here the frame is value-space-sized (the §79 leash) and the
    // exact window keeps the spec's population bound sharp.
    val nb = 128
    val tB = t.withColumn("b", ntile(nb).over(
        org.apache.spark.sql.expressions.Window
          .orderBy("price", "size", "qual")) - 1)
      .localCheckpoint()
    def dominates(dp: Column, ds: Column, dq: Column,
        pp: Column, ps: Column, pq: Column): Column =
      dp <= pp && ds >= ps && dq >= pq && (dp < pp || ds > ps || dq > pq)
    val uncertain = tB.join(cert, Seq("price", "size", "qual"), "left_anti")
    val dom = tB.select(col("b"),
      col("price").as("dp"), col("size").as("ds"), col("qual").as("dq"))
    val localSky = uncertain.join(dom,
        uncertain("b") === dom("b") &&
          dominates(col("dp"), col("ds"), col("dq"),
            uncertain("price"), uncertain("size"), uncertain("qual")),
        "left_anti")
      .select("price", "size", "qual")
      .localCheckpoint()
    // ---- stage 3: global merge against the frontier-sized pool
    val pool = cert.unionByName(localSky)
      .select(col("price").as("dp"), col("size").as("ds"), col("qual").as("dq"))
    val merged = localSky.join(broadcast(pool),
        dominates(col("dp"), col("ds"), col("dq"),
          col("price"), col("size"), col("qual")),
        "left_anti")
    val sky3 = cert.unionByName(merged)
    p.join(sky3, Seq("price", "size", "qual"))
      .select(col("p_partkey"), col("price").as("p_retailprice"),
        col("size").as("p_size"), col("qual").as("name_len"))
      .orderBy("p_partkey")
  }

  /** Independent formulation: the definitional quadratic dominance
    * test over the three objectives. */
  val skyline3Oracle: String =
    """WITH t AS (
      |  SELECT p_partkey, p_retailprice, p_size, length(p_name) AS name_len
      |  FROM part
      |)
      |SELECT q.p_partkey, q.p_retailprice, q.p_size, q.name_len
      |FROM t q
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM t p
      |  WHERE p.p_retailprice <= q.p_retailprice AND p.p_size >= q.p_size
      |    AND p.name_len >= q.name_len
      |    AND (p.p_retailprice < q.p_retailprice OR p.p_size > q.p_size
      |         OR p.name_len > q.name_len))
      |ORDER BY q.p_partkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skyline" -> (skyline _),
    "q_skyline3" -> (skyline3 _))

  val oracles: Map[String, String] = Map(
    "q_skyline" -> skylineOracle,
    "q_skyline3" -> skyline3Oracle)
}
