package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skyline" -> (skyline _))

  val oracles: Map[String, String] = Map(
    "q_skyline" -> skylineOracle)
}
