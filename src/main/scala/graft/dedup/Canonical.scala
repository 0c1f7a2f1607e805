package graft.dedup

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical-document selection: when a duplicate cluster spans
  * sources, which copy survives? Production corpora rank sources
  * (curated > crawl > bulk) and keep the best-ranked replica — not
  * the arbitrary min-id the plain dedup demos use. The keeper is
  * `min_by(struct(rank, doc_id))`: best source rank first, doc_id as
  * the total tie-break, one partial-aggregable pick per cluster.
  *
  * Scale: identical shape to exact dedup — ONE shuffle on the content
  * hash; the priority table is a broadcast-sized dim (here derived
  * from the source tag; in production a real lookup) applied
  * map-side before the aggregate, so the pick collapses partially
  * per partition like any min_by.
  */
object Canonical {

  // --------------------------------------------------------------- #58
  /** Exact duplicate clusters with priority-ranked keepers: lower
    * source number = more trusted (src1 ≻ src2 ≻ …); emits only
    * multi-doc clusters with the keeper and its source.
    *
    * The corpus is the base table UNION a deterministic mirror-site
    * slice (doc_id % 13 = 5, re-keyed +2^40 — a high bit outside any
    * generated id range, see [[Dedup.exactDedup]], source re-labeled
    * 'src'||(doc_id%7)) — the cross-source replica scenario canonical
    * selection exists for, and one where the seeded copy often
    * OUTRANKS the original (src0..src6 beat most of src0..src19), so
    * the keeper pick is exercised both ways. Mirrored verbatim in the
    * oracle → nonzero clusters at every gated SF (round-13
    * de-vacuation; the generated corpus alone has no exact dups below
    * sf0.1). */
  def canonicalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text", "source")
    val mirror = docs.where(col("doc_id") % 13 === 5)
      .withColumn("source",
        concat(lit("src"), (col("doc_id") % 7).cast("string")))
      .withColumn("doc_id", col("doc_id") + (1L << 40))
    canonicalOf(docs.unionByName(mirror))
  }

  /** Core on any (doc_id, text, source) frame — split out so the spec
    * can prove the keeper rule on a synthetic corpus independent of
    * the seeded-union staging above. */
  private[graft] def canonicalOf(docs: DataFrame): DataFrame = {
    docs
      .withColumn("rank", regexp_extract(col("source"), "(\\d+)", 1).cast("long"))
      .groupBy(md5(col("text")).as("content_md5"))
      .agg(count(lit(1)).as("n_docs"),
        min_by(struct(col("doc_id"), col("source")), struct(col("rank"), col("doc_id"))).as("keep"),
        min("rank").as("best_rank"))
      .where(col("n_docs") > 1)
      .select(col("content_md5"), col("n_docs"),
        col("keep.doc_id").as("keeper_id"), col("keep.source").as("keeper_source"),
        col("best_rank"))
      .orderBy("content_md5")
  }

  val canonicalDedupOracle: String =
    """WITH corpus AS (
      |  SELECT doc_id, text, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1099511627776 AS doc_id, text,
      |    'src' || CAST(doc_id % 7 AS VARCHAR) AS source
      |  FROM documents WHERE doc_id % 13 = 5
      |), d AS (
      |  SELECT doc_id, source, md5(text) AS content_md5,
      |    CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) AS rank
      |  FROM corpus
      |), picked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY content_md5 ORDER BY rank, doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY content_md5) AS n_docs,
      |    MIN(rank) OVER (PARTITION BY content_md5) AS best_rank
      |  FROM d
      |)
      |SELECT content_md5, n_docs, doc_id AS keeper_id, source AS keeper_source, best_rank
      |FROM picked WHERE rn = 1 AND n_docs > 1
      |ORDER BY content_md5""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_canonical" -> (canonicalDedup _))

  val oracles: Map[String, String] = Map(
    "dedup_canonical" -> canonicalDedupOracle)
}
