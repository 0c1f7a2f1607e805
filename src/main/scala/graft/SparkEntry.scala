package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TimeSeries.queries ++ Angular.queries ++
      graft.spatial.Spatial.queries ++ Sessions.queries ++ SchemaOps.queries ++
      graft.sources.Gpx.queries ++ graft.sources.HiveStore.queries ++
      graft.sources.Migration.queries ++ graft.sources.Export.queries ++
      graft.sources.SignalKDelta.queries ++
      graft.text.TextOps.queries ++ graft.dedup.Dedup.queries ++
      graft.similarity.Embeddings.queries ++ graft.multimodal.Multimodal.queries ++
      graft.streaming.Streaming.queries ++ graft.api.ApiQueries.queries ++
      Relational2.queries ++ Relational3.queries ++ Relational4.queries ++
      Relational5.queries ++ AsOf.queries ++
      graft.plans.AsOfJoinNative.queries ++ graft.plans.IntervalJoinNative.queries ++
      graft.text.Pipeline.queries ++ graft.text.Pipeline2.queries ++
      graft.text.Pipeline3.queries ++ graft.text.Pipeline4.queries ++
      graft.text.Scrub.queries ++
      graft.spatial.Templates.queries ++
      graft.dedup.Components.queries ++
      Analytics.queries ++ Intervals.queries ++ Downsample.queries ++
      graft.sources.Compaction.queries ++ graft.spatial.Hull.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TimeSeries.oracles ++ Angular.oracles ++
      graft.spatial.Spatial.oracles ++ Sessions.oracles ++ SchemaOps.oracles ++
      graft.sources.Gpx.oracles ++ graft.sources.HiveStore.oracles ++
      graft.sources.Migration.oracles ++ graft.sources.Export.oracles ++
      graft.sources.SignalKDelta.oracles ++
      graft.text.TextOps.oracles ++ graft.dedup.Dedup.oracles ++
      graft.similarity.Embeddings.oracles ++ graft.multimodal.Multimodal.oracles ++
      graft.streaming.Streaming.oracles ++ graft.api.ApiQueries.oracles ++
      Relational2.oracles ++ Relational3.oracles ++ Relational4.oracles ++
      Relational5.oracles ++ AsOf.oracles ++
      graft.plans.AsOfJoinNative.oracles ++ graft.plans.IntervalJoinNative.oracles ++
      graft.text.Pipeline.oracles ++ graft.text.Pipeline2.oracles ++
      graft.text.Pipeline3.oracles ++ graft.text.Pipeline4.oracles ++
      graft.text.Scrub.oracles ++
      graft.spatial.Templates.oracles ++
      graft.dedup.Components.oracles ++
      Analytics.oracles ++ Intervals.oracles ++ Downsample.oracles ++
      graft.sources.Compaction.oracles ++ graft.spatial.Hull.oracles
}
