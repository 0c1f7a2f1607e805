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

  /** Estimate per event_type from a register table — shared by the
    * batch sketch and the streaming register-store maintenance. */
  private[graft] def estimateRegisters(regs: DataFrame): DataFrame = regs
    .groupBy("event_type")
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

  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("user_id"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    estimateRegisters(registers(ev)).join(exact, "event_type")
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

  // --------------------------------------------------------------- #56
  /** HLL SET ALGEBRA — why register sketches beat plain distinct
    * counters: stored sketches compose. For every unordered pair of
    * event types, the union estimate comes from the register-wise MAX
    * of the two sketches (the HLL union is exact w.r.t. the sketch:
    * sketch(A∪B) == max-merge(sketch(A), sketch(B))), and the
    * intersection by inclusion–exclusion — no second corpus scan per
    * question. At 100 TB the register tables are m rows per slice,
    * retained per day/segment, and ANY pair/union query runs on KBs.
    * The exact pairwise intersection rides along as the accuracy
    * report (computed from the distinct (type,user) table, which is
    * user-space-sized, not event-sized).
    *
    * The corpus is scanned twice total — once for the registers, once
    * for the distinct (type,user) table — both localCheckpointed
    * before the pair fan-out (10 pairs at 5 types) so no consumer
    * re-scans.
    */
  def hllSetOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("user_id"))
    val regs = registers(ev).localCheckpoint()
    val tu = ev.distinct().localCheckpoint()

    def est(grouped: DataFrame): DataFrame = grouped
      .withColumn("v_empty", lit(M.toLong) - col("n_hit"))
      .withColumn("s_scaled", col("s_hit") + col("v_empty") * lit(1L << 53))
      .withColumn("raw_est", lit(AlphaScaled) / col("s_scaled").cast("double"))
      .withColumn("est", r6(
        when(col("raw_est") <= 640.0 && col("v_empty") > 0,
          lit(256.0) * log(lit(256.0) / col("v_empty").cast("double")))
          .otherwise(col("raw_est"))))
    def sums(df: DataFrame, keys: String*): DataFrame = df
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_hit"),
        sum(expr("shiftleft(1L, CAST(53 - mj AS INT))")).as("s_hit"))

    val single = est(sums(regs, "event_type")).select("event_type", "est")
    val types = regs.select("event_type").distinct()
    val pairs = types.select(col("event_type").as("ta"))
      .crossJoin(types.select(col("event_type").as("tb")))
      .filter(col("ta") < col("tb"))
    val uregs = pairs
      .join(regs, regs("event_type") === col("ta") || regs("event_type") === col("tb"))
      .groupBy("ta", "tb", "idx").agg(max("mj").as("mj"))
    val uest = est(sums(uregs, "ta", "tb"))
      .select(col("ta"), col("tb"), col("est").as("est_union"))
    val exact = tu.as("ea")
      .join(tu.as("eb"), col("ea.user_id") === col("eb.user_id") &&
        col("ea.event_type") < col("eb.event_type"))
      .groupBy(col("ea.event_type").as("ta"), col("eb.event_type").as("tb"))
      .agg(countDistinct(col("ea.user_id")).as("exact_intersect"))

    uest
      .join(single.select(col("event_type").as("ta"), col("est").as("est_a")), "ta")
      .join(single.select(col("event_type").as("tb"), col("est").as("est_b")), "tb")
      .join(exact, Seq("ta", "tb"), "left")
      .na.fill(0L, Seq("exact_intersect"))
      // +0.0 everywhere a rounded value could be a signed zero (§5a #25)
      .withColumn("est_intersect",
        r6(col("est_a") + col("est_b") - col("est_union")) + lit(0.0))
      .withColumn("jaccard_est",
        r6(col("est_intersect") / col("est_union")) + lit(0.0))
      .select("ta", "tb", "est_a", "est_b", "est_union", "est_intersect",
        "jaccard_est", "exact_intersect")
      .orderBy("ta", "tb")
  }

  val hllSetOpsOracle: String =
    s"""WITH h AS (
      |  SELECT event_type,
      |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      |  FROM events
      |), regs AS (
      |  SELECT event_type, h % 256 AS idx,
      |    MAX(CASE WHEN h // 256 = 0 THEN 53
      |             ELSE 53 - length(bin(h // 256)) END) AS mj
      |  FROM h GROUP BY 1, 2
      |), est1 AS (
      |  SELECT event_type,
      |    ROUND(CASE WHEN raw_est <= 640.0 AND v_empty > 0
      |               THEN 256.0 * ln(256.0 / CAST(v_empty AS DOUBLE))
      |               ELSE raw_est END, 6) + 0.0 AS est
      |  FROM (
      |    SELECT event_type, 256 - COUNT(*) AS v_empty,
      |      CAST($AlphaScaled AS DOUBLE) /
      |        CAST(SUM(1::BIGINT << CAST(53 - mj AS INT))
      |          + (256 - COUNT(*)) * (1::BIGINT << 53) AS DOUBLE) AS raw_est
      |    FROM regs GROUP BY 1)
      |), types AS (SELECT DISTINCT event_type FROM regs
      |), pairs AS (
      |  SELECT x.event_type AS ta, y.event_type AS tb
      |  FROM types x, types y WHERE x.event_type < y.event_type
      |), uregs AS (
      |  SELECT p.ta, p.tb, r.idx, MAX(r.mj) AS mj
      |  FROM pairs p JOIN regs r
      |    ON r.event_type = p.ta OR r.event_type = p.tb
      |  GROUP BY 1, 2, 3
      |), uest AS (
      |  SELECT ta, tb,
      |    ROUND(CASE WHEN raw_est <= 640.0 AND v_empty > 0
      |               THEN 256.0 * ln(256.0 / CAST(v_empty AS DOUBLE))
      |               ELSE raw_est END, 6) + 0.0 AS est_union
      |  FROM (
      |    SELECT ta, tb, 256 - COUNT(*) AS v_empty,
      |      CAST($AlphaScaled AS DOUBLE) /
      |        CAST(SUM(1::BIGINT << CAST(53 - mj AS INT))
      |          + (256 - COUNT(*)) * (1::BIGINT << 53) AS DOUBLE) AS raw_est
      |    FROM uregs GROUP BY 1, 2)
      |), tu AS (SELECT DISTINCT event_type, user_id FROM events
      |), ex AS (
      |  SELECT a.event_type AS ta, b.event_type AS tb,
      |    COUNT(DISTINCT a.user_id) AS exact_intersect
      |  FROM tu a JOIN tu b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2
      |)
      |SELECT u.ta, u.tb, a.est AS est_a, b.est AS est_b, u.est_union,
      |  ROUND(a.est + b.est - u.est_union, 6) + 0.0 AS est_intersect,
      |  ROUND((ROUND(a.est + b.est - u.est_union, 6) + 0.0) / u.est_union, 6)
      |    + 0.0 AS jaccard_est,
      |  COALESCE(ex.exact_intersect, 0) AS exact_intersect
      |FROM uest u
      |JOIN est1 a ON a.event_type = u.ta
      |JOIN est1 b ON b.event_type = u.tb
      |LEFT JOIN ex ON ex.ta = u.ta AND ex.tb = u.tb
      |ORDER BY u.ta, u.tb""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_hll_distinct" -> (hllDistinct _),
    "sketch_hll_setops" -> (hllSetOps _))

  val oracles: Map[String, String] = Map(
    "sketch_hll_distinct" -> hllDistinctOracle,
    "sketch_hll_setops" -> hllSetOpsOracle)
}
