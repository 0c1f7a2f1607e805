package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Largest-Triangle-Three-Buckets downsampling — the shape-preserving
  * upgrade of the History API's auto-resolution bucketing
  * (HistoryAPI.ts:959 sizes buckets as range/500 and averages them;
  * LTTB instead keeps the REAL sample per bucket that best preserves
  * the series' visual extremes, the standard for chart backends).
  *
  * Variant: FIXED-ANCHOR LTTB (the standard streaming/parallel
  * approximation of Steinarsson 2013) — the triangle for bucket k is
  * anchored on bucket k-1's MEAN point rather than its selected
  * point, with the next-bucket mean as the third vertex (first/last
  * sample stand in at the ends). Decoupling each bucket's selection
  * from the previous bucket's PICK removes the only sequential
  * dependency in the walk, so the whole operator is relational:
  *
  *   rank per series → bucket id → per-bucket decimal mean →
  *   LAG/LEAD anchors over the ~NB bucket rows → per-bucket argmax
  *   (max_by with explicit tie-break), partial-aggregated map-side.
  *
  * No per-series arrays, no fold: a bucket with a billion points
  * costs one codegen'd max_by pass, and the samples never leave their
  * bucket's aggregation. (The previous formulation collected every
  * middle point into nested per-series arrays — one unbounded row per
  * hot series — exactly the 100 TB failure this rewrite removes.)
  *
  * Empty buckets (series shorter than ~NB+2): LAG/LEAD skip over
  * missing bucket ids on BOTH engines, carrying the nearest existing
  * bucket's mean — the short-series divergence of the old recursive
  * oracle walk is gone by construction (spec: DegenerateInputSpec).
  *
  * Cross-engine determinism: bucket index is integer `div`
  * arithmetic; means go through DECIMAL sums; the triangle area uses
  * the same IEEE double expression in both engines; the argmax keeps
  * the first maximum in (t, eid) order — Spark max_by on a
  * (area, -t, -eid) struct ≡ oracle ROW_NUMBER ORDER BY area DESC,
  * t, eid.
  *
  * Remaining per-series sort: the equal-COUNT bucket id needs a rank
  * (row_number per series), an external single-task sort for one
  * series — parallelism comes from the series count, which is the
  * dimension that actually grows in the telemetry model
  * (contexts × paths). If one monster series must downsample alone,
  * switch the bucket id to equal-TIME buckets
  * (`(t - min_t) * NB div span`, two algebraic aggregates, no rank) —
  * the reference's own bucketing (HistoryAPI.ts:959) is time-based,
  * so that variant is still semantics-faithful. */
object Downsample {

  private val NB = 50

  def lttb(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("t", "eid")
    val wp = Window.partitionBy("event_type")
    val idx = Tables.events(spark, dir)
      .select(col("event_type"), col("ts_ms").as("t"), col("event_id").as("eid"),
        col("value").as("v"))
      .withColumn("rn", row_number().over(w).cast("long") - 1L)
      .withColumn("n", count(lit(1)).over(wp))
    val firstP = idx.where(col("rn") === 0L)
      .select(col("event_type"), col("t").as("f_t"), col("v").as("f_v"))
    val lastP = idx.where(col("rn") === col("n") - 1L)
      .select(col("event_type"), col("t").as("l_t"), col("v").as("l_v"))
    val mid = idx.where(col("rn") >= 1L && col("rn") <= col("n") - 2L)
      .withColumn("k", expr(s"((rn - 1) * $NB) div (n - 2)"))
    // Anchor table: one row per (series, bucket) — NB rows per series
    // regardless of input size. LAG/LEAD default to the first/last
    // sample at the edges (and skip empty bucket ids, carrying the
    // nearest neighbor on both engines).
    val wb = Window.partitionBy("event_type").orderBy("k")
    val anchors = mid.groupBy("event_type", "k")
      .agg(
        (sum(col("t").cast(DecimalType(28, 0))).cast("double") / count(lit(1))).as("at"),
        (sum(col("v").cast(DecimalType(18, 6))).cast("double") / count(lit(1))).as("av"))
      .join(broadcast(firstP), "event_type")
      .join(broadcast(lastP), "event_type")
      .withColumn("pa_t", coalesce(lag("at", 1).over(wb), col("f_t").cast("double")))
      .withColumn("pa_v", coalesce(lag("av", 1).over(wb), col("f_v")))
      .withColumn("nt", coalesce(lead("at", 1).over(wb), col("l_t").cast("double")))
      .withColumn("nv", coalesce(lead("av", 1).over(wb), col("l_v")))
      .select("event_type", "k", "pa_t", "pa_v", "nt", "nv")
    // Per-bucket argmax of the triangle area: broadcast the tiny
    // anchor table onto the samples (no shuffle of the raw points for
    // the join), then one partial-aggregated max_by — the map side
    // reduces each task to ≤1 row per bucket before the exchange.
    val picks = mid.join(broadcast(anchors), Seq("event_type", "k"))
      .withColumn("area", abs(
        (col("pa_t") - col("nt")) * (col("v") - col("pa_v")) -
          (col("pa_t") - col("t").cast("double")) * (col("nv") - col("pa_v"))))
      .groupBy("event_type", "k")
      .agg(max_by(
        struct(col("t"), col("v")),
        struct(col("area"), (-col("t")).as("mt"), (-col("eid")).as("me"))).as("p"))
      .select(col("event_type"), col("p.t").as("tb"), col("p.v").as("vv"))
    firstP.select(col("event_type"), col("f_t").as("tb"), col("f_v").as("vv"))
      .unionAll(picks)
      .unionAll(lastP.select(col("event_type"), col("l_t").as("tb"), col("l_v").as("vv")))
      .select(col("event_type"), col("tb").as("ts_ms"), col("vv").as("value"))
      .orderBy("event_type", "ts_ms")
  }

  val lttbOracle: String =
    s"""WITH pos AS (
       |  SELECT event_type, epoch_ms(ts) AS t, event_id AS eid, value AS v FROM events
       |), idx AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY t, eid) - 1 AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n
       |  FROM pos
       |), firstp AS (
       |  SELECT event_type, t AS f_t, v AS f_v FROM idx WHERE rn = 0
       |), lastp AS (
       |  SELECT event_type, t AS l_t, v AS l_v FROM idx WHERE rn = n - 1
       |), mid AS (
       |  SELECT event_type, t, eid, v, ((rn - 1) * $NB) // (n - 2) AS k
       |  FROM idx WHERE rn >= 1 AND rn <= n - 2
       |), bstats AS (
       |  SELECT event_type, k,
       |    CAST(SUM(CAST(t AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*) AS at,
       |    CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS av
       |  FROM mid GROUP BY 1, 2
       |), anch AS (
       |  SELECT b.event_type, b.k,
       |    COALESCE(LAG(at) OVER wk, CAST(f.f_t AS DOUBLE)) AS pa_t,
       |    COALESCE(LAG(av) OVER wk, f.f_v) AS pa_v,
       |    COALESCE(LEAD(at) OVER wk, CAST(l.l_t AS DOUBLE)) AS nt,
       |    COALESCE(LEAD(av) OVER wk, l.l_v) AS nv
       |  FROM bstats b
       |  JOIN firstp f USING (event_type)
       |  JOIN lastp l USING (event_type)
       |  WINDOW wk AS (PARTITION BY b.event_type ORDER BY b.k)
       |), picks AS (
       |  SELECT m.event_type, m.k, m.t, m.v,
       |    ROW_NUMBER() OVER (PARTITION BY m.event_type, m.k
       |      ORDER BY abs((a.pa_t - a.nt) * (m.v - a.pa_v)
       |        - (a.pa_t - CAST(m.t AS DOUBLE)) * (a.nv - a.pa_v)) DESC,
       |        m.t, m.eid) AS rnk
       |  FROM mid m JOIN anch a ON a.event_type = m.event_type AND a.k = m.k
       |)
       |SELECT event_type, ts_ms, value FROM (
       |  SELECT event_type, f_t AS ts_ms, f_v AS value FROM firstp
       |  UNION ALL
       |  SELECT event_type, t, v FROM picks WHERE rnk = 1
       |  UNION ALL
       |  SELECT event_type, l_t, l_v FROM lastp
       |)
       |ORDER BY event_type, ts_ms""".stripMargin

  // --------------------------------------------------------------- M4
  /** M4 downsampling (Jugel et al., VLDB 2014): per (series,
    * time-bucket) keep the ≤4 REAL samples that bound the drawn line —
    * value-min, value-max, time-first, time-last — the
    * error-free-rendering guarantee for a width-NB pixel column. The
    * reference's History API offers `min`/`max`/`first`/`last` bucket
    * methods individually (HistoryAPI.ts:959 applyAggregateMethod);
    * M4 is their union kept as actual samples, the standard chart
    * backend contract alongside 51g's shape-preserving LTTB.
    *
    * Plan: per-series time bounds (one algebraic agg, broadcast back —
    * the join adds no shuffle to the scan), integer equal-TIME bucket
    * id, then ONE grouped aggregation with four partial-aggregable
    * min_by/max_by picks — the map side reduces every task to ≤1 row
    * per bucket before the exchange, so a bucket with a billion points
    * costs one codegen'd pass and no per-series sort exists at all
    * (unlike LTTB's equal-count rank, M4 needs no row_number — this is
    * the variant that survives one monster series). The ≤4·NB·series
    * picked points then dedupe (a sample can fill several roles) on a
    * trivially small set.
    *
    * Cross-engine determinism: every pick carries an explicit total
    * tie-break — min_by/max_by order structs (v,t,eid)/(v,-t,-eid)/
    * (t,eid) ≡ the oracle's ROW_NUMBER ORDER BY lists. */
  def m4(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.events(spark, dir)
      .select(col("event_type"), col("ts_ms").as("t"), col("event_id").as("eid"),
        col("value").as("v"))
    val bounds = pts.groupBy("event_type")
      .agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
    val picked = pts.join(broadcast(bounds), "event_type")
      .withColumn("k", expr(s"((t - mn) * $NB) div (mx - mn + 1)"))
      .groupBy("event_type", "k")
      .agg(
        min_by(struct(col("t"), col("v")), struct(col("v"), col("t"), col("eid"))).as("pmin"),
        max_by(struct(col("t"), col("v")),
          struct(col("v"), (-col("t")).as("mt"), (-col("eid")).as("me"))).as("pmax"),
        min_by(struct(col("t"), col("v")), struct(col("t"), col("eid"))).as("pfirst"),
        max_by(struct(col("t"), col("v")), struct(col("t"), col("eid"))).as("plast"))
    picked
      .select(col("event_type"),
        explode(array(col("pmin"), col("pmax"), col("pfirst"), col("plast"))).as("p"))
      .select(col("event_type"), col("p.t").as("ts_ms"), col("p.v").as("value"))
      .distinct()
      .orderBy("event_type", "ts_ms", "value")
  }

  val m4Oracle: String =
    s"""WITH pos AS (
       |  SELECT event_type, epoch_ms(ts) AS t, event_id AS eid, value AS v FROM events
       |), b AS (
       |  SELECT event_type, MIN(t) AS mn, MAX(t) AS mx FROM pos GROUP BY 1
       |), m AS (
       |  SELECT p.event_type, ((t - mn) * $NB) // (mx - mn + 1) AS k, t, eid, v
       |  FROM pos p JOIN b USING (event_type)
       |), r AS (
       |  SELECT event_type, k, t, v,
       |    ROW_NUMBER() OVER (PARTITION BY event_type, k ORDER BY v, t, eid) AS rmin,
       |    ROW_NUMBER() OVER (PARTITION BY event_type, k ORDER BY v DESC, t, eid) AS rmax,
       |    ROW_NUMBER() OVER (PARTITION BY event_type, k ORDER BY t, eid) AS rfirst,
       |    ROW_NUMBER() OVER (PARTITION BY event_type, k ORDER BY t DESC, eid DESC) AS rlast
       |  FROM m
       |)
       |SELECT DISTINCT event_type, t AS ts_ms, v AS value FROM r
       |WHERE rmin = 1 OR rmax = 1 OR rfirst = 1 OR rlast = 1
       |ORDER BY event_type, ts_ms, value""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_downsample_lttb" -> (lttb _),
    "sk_downsample_m4" -> (m4 _))

  val oracles: Map[String, String] = Map(
    "sk_downsample_lttb" -> lttbOracle,
    "sk_downsample_m4" -> m4Oracle)
}
