package graft.operators

import graft.Tables
import graft.funcs.r6
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog distinct-count sketch (Flajolet et al.
  * 2007; the m=256 / 8-bit-bucket configuration), implemented from
  * first principles so the estimate is a pure function of the data —
  * reproducible across engines, partitionings, and retries — unlike
  * `approx_count_distinct`, whose register hashing is
  * engine-internal and therefore un-oracleable.
  *
  * Why this matters at 100 TB: the HLL register table is the
  * canonical MERGEABLE sketch — per-partition partial maxima combine
  * map-side (max is associative/commutative), the shuffle carries at
  * most m rows per group regardless of input size, and stored
  * register tables from different days/segments union by max to
  * answer distinct-over-any-slice without rescanning. The whole
  * pipeline below is exact integer arithmetic (md5 → 60-bit int;
  * leading-zero rank via `bin` string length, not float log2; the
  * indicator sum Σ2^−Mj carried as Σ2^(53−Mj) in a BIGINT) so both
  * engines agree bit-for-bit; floats appear only in the final
  * estimate division, identically parenthesized on both sides.
  *
  * Output carries the exact distinct count alongside the estimate —
  * the accuracy report a sketch rollout starts with.
  */
object Hll {

  private val M = 256 // registers (b = 8 index bits; 52-bit rank field)

  /** α_256 · m² · 2⁵³ — the whole numerator of the raw estimate as one
    * double, computed HERE (not in each engine's SQL) so both engines
    * divide the identical value by the exact integer Σ2^(53−Mj). */
  private val AlphaScaled: Double =
    0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 9007199254740992.0

  // --------------------------------------------------------------- #54
  /** Per-event-type approximate distinct users: m=256 HLL with
    * LinearCounting small-range correction, plus the exact count for
    * comparison. `rho` = leading-zero count of the 52-bit rank field
    * + 1, computed as 53 − bitlength via `bin()` (integer-exact on
    * both engines). */
  /** The sketch itself: (group, register idx) → max rank. Mergeable —
    * registers from disjoint slices union by max (HllSpec pins it). */
  private[graft] def registers(ev: DataFrame): DataFrame = ev
    .withColumn("h", expr(
      "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
    .withColumn("idx", col("h") % M)
    .withColumn("w", expr(s"h DIV $M"))
    .withColumn("rho", when(col("w") === 0, lit(53))
      .otherwise(lit(53) - length(expr("bin(w)"))))
    .groupBy("event_type", "idx")
    .agg(max("rho").as("mj"))

  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("user_id"))
    val regs = registers(ev)
    val sums = regs.groupBy("event_type")
      .agg(count(lit(1)).as("n_hit"),
        sum(expr("shiftleft(1L, CAST(53 - mj AS INT))")).as("s_hit"))
      .withColumn("v_empty", lit(M.toLong) - col("n_hit"))
      .withColumn("s_scaled", col("s_hit") + col("v_empty") * lit(1L << 53))
      // AlphaScaled is ONE Scala-computed double fed verbatim to both
      // engines: spelling the formula in SQL made Spark parse 0.7213 /
      // 256.0 as DECIMAL literals (different arithmetic than DuckDB's
      // doubles — measured 3.5e-9 relative skew at sf0.1)
      .withColumn("raw_est", lit(AlphaScaled) / col("s_scaled").cast("double"))
      .withColumn("hll_estimate", r6(
        when(col("raw_est") <= 640.0 && col("v_empty") > 0,
          lit(256.0) * log(lit(256.0) / col("v_empty").cast("double")))
          .otherwise(col("raw_est"))))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    sums.join(exact, "event_type")
      .select("event_type", "n_hit", "s_scaled", "hll_estimate", "exact_distinct")
      .orderBy("event_type")
  }

  val hllDistinctOracle: String =
    s"""WITH h AS (
      |  SELECT event_type,
      |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h,
      |    user_id
      |  FROM events
      |), regs AS (
      |  SELECT event_type, h % 256 AS idx,
      |    MAX(CASE WHEN h // 256 = 0 THEN 53
      |             ELSE 53 - length(bin(h // 256)) END) AS mj
      |  FROM h GROUP BY 1, 2
      |), sums AS (
      |  SELECT event_type, COUNT(*) AS n_hit,
      |    CAST(SUM(1::BIGINT << CAST(53 - mj AS INT)) AS BIGINT) AS s_hit,
      |    256 - COUNT(*) AS v_empty
      |  FROM regs GROUP BY 1
      |), est AS (
      |  SELECT event_type, n_hit,
      |    s_hit + v_empty * (1::BIGINT << 53) AS s_scaled, v_empty,
      |    CAST($AlphaScaled AS DOUBLE)
      |      / CAST(s_hit + v_empty * (1::BIGINT << 53) AS DOUBLE) AS raw_est
      |  FROM sums
      |), ex AS (
      |  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct FROM events GROUP BY 1
      |)
      |SELECT e.event_type, e.n_hit, e.s_scaled,
      |  ROUND(CASE WHEN e.raw_est <= 640.0 AND e.v_empty > 0
      |             THEN 256.0 * ln(256.0 / CAST(e.v_empty AS DOUBLE))
      |             ELSE e.raw_est END, 6) + 0.0 AS hll_estimate,
      |  ex.exact_distinct
      |FROM est e JOIN ex USING (event_type)
      |ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_hll_distinct" -> (hllDistinct _))

  val oracles: Map[String, String] = Map(
    "sketch_hll_distinct" -> hllDistinctOracle)
}
