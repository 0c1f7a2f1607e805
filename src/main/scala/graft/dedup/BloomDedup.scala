package graft.dedup

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, BloomFilterAggregate, Complete}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bloom-prefiltered incremental dedup — the complement of
  * [[Dedup.incrementalDedup]] for the opposite size regime.
  *
  * `dedup_incremental` broadcasts the BATCH's distinct hashes into the
  * store scan: right when the batch is small (a day's crawl vs the
  * archive), impossible when the batch itself is too big to broadcast.
  * This operator flips the roles: the STORE is reduced to a Bloom
  * sketch whose size is fixed by its bit budget — megabytes regardless
  * of whether the store is 10 GB or 100 TB — and that sketch broadcasts
  * to the batch. Mechanically it is Spark's own runtime-filter
  * machinery made explicit: a `BloomFilterAggregate` over
  * `xxhash64(h)` wrapped in an uncorrelated scalar subquery (executed
  * once, embedded in the predicate as a literal — exactly what
  * `InjectRuntimeFilter` builds for shuffle-join pruning), probed by
  * codegen'd `BloomFilterMightContain` on the batch side.
  *
  * Bloom hits are then EXACT-verified with a semi-join against the
  * store, so false positives die before the output and the result is
  * bit-identical to the exact computation — which is why a plain-SQL
  * oracle can check it even though DuckDB cannot evaluate the sketch.
  * Candidate volume is |true dups| + fpp·|batch|, so the store probe
  * reads a sliver regardless of batch size.
  *
  * At production scale the sketch is built once and maintained
  * incrementally (bloom union is associative OR — each ingested file
  * contributes its bits), so the steady-state batch path never scans
  * the archive at all; the demo builds it inline to stay
  * self-contained. Size the bit budget to store cardinality: the demo
  * uses 2^16 items / 2^19 bits (8 bits/key ≈ 2% fpp); a 100 TB store
  * with 10^11 keys wants ~100 GB of bloom sharded by hash prefix, or a
  * per-partition sketch family — the operator shape is unchanged.
  */
object BloomDedup {

  // ------------------------------------------------------------- #29c
  /** Batch-vs-store dedup with the store as a broadcast Bloom sketch.
    * Split convention matches [[Dedup.incrementalDedup]]: doc_id ≡ 0
    * (mod 10) plays the arriving batch, the rest play the store.
    * Output: (doc_id, status ∈ dup_store | dup_batch | new). */
  def bloomIncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    def docs = Tables.documents(spark, dir)
      .withColumn("h", md5(col("text")))
    val batch = docs.where(col("doc_id") % 10 === 0).select("doc_id", "h")
    val store = docs.where(col("doc_id") % 10 =!= 0).select("h")

    // the store's sketch as an uncorrelated scalar subquery (a fresh
    // read, so no ExprId overlap with the outer plan)
    val hxPlan = store.select(xxhash64(col("h")).as("hx"))
      .queryExecution.analyzed
    val sketch = new BloomFilterAggregate(
      hxPlan.output.head, Literal(65536L), Literal(524288L))
    val bloomPlan = Aggregate(Nil,
      Seq(Alias(AggregateExpression(sketch, Complete, isDistinct = false),
        "bloom")()), hxPlan)
    val mightContain = GraftBridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomPlan),
      GraftBridge.expression(xxhash64(col("h")))))

    // bloom prefilter, then exact verification of the hits only: the
    // store scan is probed by candidate hashes, never the whole batch
    val candidates = batch.where(mightContain).select("h").distinct()
    val verified = store
      .join(broadcast(candidates), Seq("h"), "left_semi")
      .select("h").distinct()

    val w = Window.partitionBy("h").orderBy("doc_id")
    batch
      .withColumn("rk", row_number().over(w))
      .join(broadcast(verified.withColumn("in_store", lit(true))),
        Seq("h"), "left")
      .select(col("doc_id"),
        when(col("in_store"), lit("dup_store"))
          .when(col("rk") > 1, lit("dup_batch"))
          .otherwise(lit("new")).as("status"))
      .orderBy("doc_id")
  }

  val bloomIncrementalDedupOracle: String =
    """WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
      |b AS (
      |  SELECT doc_id, h, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rk
      |  FROM d WHERE doc_id % 10 = 0),
      |v AS (
      |  SELECT DISTINCT h FROM d
      |  WHERE doc_id % 10 <> 0 AND h IN (SELECT h FROM b))
      |SELECT b.doc_id,
      |  CASE WHEN v.h IS NOT NULL THEN 'dup_store'
      |       WHEN b.rk > 1 THEN 'dup_batch'
      |       ELSE 'new' END AS status
      |FROM b LEFT JOIN v ON b.h = v.h
      |ORDER BY b.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_bloom" -> (bloomIncrementalDedup _))

  val oracles: Map[String, String] = Map(
    "dedup_bloom" -> bloomIncrementalDedupOracle)
}
