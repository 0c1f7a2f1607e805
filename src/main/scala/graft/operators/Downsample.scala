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
  * Algorithm (Steinarsson 2013): keep the first and last samples;
  * split the middle into NB equal-count buckets; walking left→right,
  * keep from each bucket the sample forming the largest triangle with
  * the previously KEPT sample and the next bucket's average.
  *
  * Spark-first shape: the per-bucket structure is relational (one
  * shuffle on (series, bucket): sorted point lists + exact-decimal
  * bucket averages + LEAD for the next-bucket reference), so only the
  * inherently sequential selection walk runs as a per-series ordered
  * fold (`aggregate` over NB bucket summaries — NB is the CHART WIDTH,
  * ~50, regardless of input size; the 100 TB of samples never leave
  * the bucket stage, which partial-aggregates map-side).
  *
  * Cross-engine determinism: bucket index is integer `div` arithmetic;
  * averages go through DECIMAL sums; the triangle area uses the same
  * IEEE double expression in both engines; argmax keeps the first
  * strict maximum in (ts, event_id) order — mirrored in the oracle as
  * ORDER BY area DESC, t, eid LIMIT 1 inside a recursive CTE (DuckDB
  * 1.0's list_reduce has no initial-state form). */
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
    val wb = Window.partitionBy("event_type").orderBy("k")
    val buckets = mid.groupBy("event_type", "k")
      .agg(
        array_sort(collect_list(struct(col("t"), col("eid"), col("v")))).as("pts"),
        (sum(col("t").cast(DecimalType(28, 0))).cast("double") / count(lit(1))).as("at"),
        (sum(col("v").cast(DecimalType(18, 6))).cast("double") / count(lit(1))).as("av"))
      .join(broadcast(lastP), "event_type")
      .withColumn("nt", coalesce(lead("at", 1).over(wb), col("l_t").cast("double")))
      .withColumn("nv", coalesce(lead("av", 1).over(wb), col("l_v")))
    val folded = buckets.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("k"), col("pts"), col("nt"), col("nv")))).as("bks"))
      .join(broadcast(firstP), "event_type")
      .join(broadcast(lastP), "event_type")
      // One fold over NB bucket summaries; the inner aggregate is the
      // per-bucket argmax. `transform(array(x), best -> …)[0]` binds
      // the argmax result once (no duplicated evaluation through
      // CollapseProject — SURVEY §5a.1).
      .withColumn("sel", expr(
        s"""aggregate(
           |  bks,
           |  named_struct(
           |    'at', CAST(f_t AS DOUBLE), 'av', f_v,
           |    'sel', CAST(array() AS ARRAY<STRUCT<tb: BIGINT, vv: DOUBLE>>)),
           |  (st, b) -> transform(array(
           |      aggregate(
           |        b.pts,
           |        named_struct('ba', CAST(-1.0 AS DOUBLE),
           |          'bt', CAST(NULL AS BIGINT), 'bv', CAST(NULL AS DOUBLE)),
           |        (bs, p) -> IF(
           |          abs((st.at - b.nt) * (p.v - st.av)
           |            - (st.at - CAST(p.t AS DOUBLE)) * (b.nv - st.av)) > bs.ba,
           |          named_struct(
           |            'ba', abs((st.at - b.nt) * (p.v - st.av)
           |              - (st.at - CAST(p.t AS DOUBLE)) * (b.nv - st.av)),
           |            'bt', p.t, 'bv', p.v),
           |          bs))),
           |    best -> named_struct(
           |      'at', CAST(best.bt AS DOUBLE), 'av', best.bv,
           |      'sel', concat(st.sel,
           |        array(named_struct('tb', best.bt, 'vv', best.bv)))))[0]
           |).sel""".stripMargin))
    folded
      .select(col("event_type"), explode(concat(
        array(struct(col("f_t").as("tb"), col("f_v").as("vv"))),
        col("sel"),
        array(struct(col("l_t").as("tb"), col("l_v").as("vv"))))).as("p"))
      .select(col("event_type"), col("p.tb").as("ts_ms"), col("p.vv").as("value"))
      .orderBy("event_type", "ts_ms")
  }

  val lttbOracle: String =
    s"""WITH RECURSIVE pos AS (
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
       |), bnext AS (
       |  SELECT b.event_type, b.k,
       |    COALESCE(LEAD(at) OVER (PARTITION BY b.event_type ORDER BY b.k),
       |      CAST(l.l_t AS DOUBLE)) AS nt,
       |    COALESCE(LEAD(av) OVER (PARTITION BY b.event_type ORDER BY b.k), l.l_v) AS nv
       |  FROM bstats b JOIN lastp l USING (event_type)
       |), walk AS (
       |  SELECT event_type, CAST(-1 AS BIGINT) AS k,
       |    CAST(f_t AS DOUBLE) AS a_t, f_v AS a_v,
       |    f_t AS sel_t, f_v AS sel_v
       |  FROM firstp
       |  UNION ALL
       |  SELECT w.event_type, w.k + 1,
       |    CAST((SELECT m.t FROM mid m JOIN bnext bn
       |            ON bn.event_type = m.event_type AND bn.k = m.k
       |          WHERE m.event_type = w.event_type AND m.k = w.k + 1
       |          ORDER BY abs((w.a_t - bn.nt) * (m.v - w.a_v)
       |            - (w.a_t - CAST(m.t AS DOUBLE)) * (bn.nv - w.a_v)) DESC, m.t, m.eid
       |          LIMIT 1) AS DOUBLE),
       |    (SELECT m.v FROM mid m JOIN bnext bn
       |            ON bn.event_type = m.event_type AND bn.k = m.k
       |          WHERE m.event_type = w.event_type AND m.k = w.k + 1
       |          ORDER BY abs((w.a_t - bn.nt) * (m.v - w.a_v)
       |            - (w.a_t - CAST(m.t AS DOUBLE)) * (bn.nv - w.a_v)) DESC, m.t, m.eid
       |          LIMIT 1),
       |    (SELECT m.t FROM mid m JOIN bnext bn
       |            ON bn.event_type = m.event_type AND bn.k = m.k
       |          WHERE m.event_type = w.event_type AND m.k = w.k + 1
       |          ORDER BY abs((w.a_t - bn.nt) * (m.v - w.a_v)
       |            - (w.a_t - CAST(m.t AS DOUBLE)) * (bn.nv - w.a_v)) DESC, m.t, m.eid
       |          LIMIT 1),
       |    (SELECT m.v FROM mid m JOIN bnext bn
       |            ON bn.event_type = m.event_type AND bn.k = m.k
       |          WHERE m.event_type = w.event_type AND m.k = w.k + 1
       |          ORDER BY abs((w.a_t - bn.nt) * (m.v - w.a_v)
       |            - (w.a_t - CAST(m.t AS DOUBLE)) * (bn.nv - w.a_v)) DESC, m.t, m.eid
       |          LIMIT 1)
       |  FROM walk w WHERE w.k + 1 <= ${NB - 1}
       |)
       |SELECT event_type, ts_ms, value FROM (
       |  SELECT event_type, sel_t AS ts_ms, sel_v AS value FROM walk
       |  UNION ALL
       |  SELECT event_type, l_t, l_v FROM lastp
       |)
       |ORDER BY event_type, ts_ms""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_downsample_lttb" -> (lttb _))

  val oracles: Map[String, String] = Map(
    "sk_downsample_lttb" -> lttbOracle)
}
