package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions._

/** Minimal bridge into `private[sql]` surface: wrap an already-built
  * logical plan as a DataFrame. Used by graft's custom operators
  * (e.g. [[graft.plans.AsOfJoinNative]]) to hand a custom LogicalPlan
  * node to the session's QueryExecution — the same door the built-in
  * Dataset API uses. Nothing else from the private surface is touched.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Expression ↔ Column bridges (the `classic.ExpressionUtils`
    * surface is `private[sql]`): used where an operator must embed a
    * hand-built Catalyst expression — e.g. [[graft.dedup.BloomDedup]]
    * wrapping `BloomFilterMightContain(ScalarSubquery(...))` the same
    * way the optimizer's InjectRuntimeFilter does. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** True when the session's CacheManager holds no cached plans. Used
    * by specs to pin that per-batch operators (stream_dedup_lsh) do
    * not leak `.cache()` entries across micro-batches. */
  def noCachedPlans(spark: SparkSession): Boolean =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty
}
