package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** THE single registry of operator modules. [[SparkEntry]] folds this
  * list into its `queries`/`oracleSql` maps and `ContractSpec` folds
  * the SAME list for its shadowing audit — so the two can never
  * disagree (round 8 shipped a red `sbt test` because the spec kept
  * its own copy of this list and it went stale at the last commits).
  *
  * Adding a module = adding ONE row here; forgetting the row means the
  * module's queries are absent from the driver gate, which the
  * per-round CORRECTNESS diff catches.
  */
object Modules {
  type QueryFn = (SparkSession, String) => DataFrame

  /** (module name, queries, oracles) per operator module. */
  val all: Seq[(String, Map[String, QueryFn], Map[String, String])] = Seq(
    ("Relational", operators.Relational.queries, operators.Relational.oracles),
    ("TimeSeries", operators.TimeSeries.queries, operators.TimeSeries.oracles),
    ("Angular", operators.Angular.queries, operators.Angular.oracles),
    ("Spatial", spatial.Spatial.queries, spatial.Spatial.oracles),
    ("Sessions", operators.Sessions.queries, operators.Sessions.oracles),
    ("SchemaOps", operators.SchemaOps.queries, operators.SchemaOps.oracles),
    ("Gpx", sources.Gpx.queries, sources.Gpx.oracles),
    ("HiveStore", sources.HiveStore.queries, sources.HiveStore.oracles),
    ("Migration", sources.Migration.queries, sources.Migration.oracles),
    ("Export", sources.Export.queries, sources.Export.oracles),
    ("SignalKDelta", sources.SignalKDelta.queries, sources.SignalKDelta.oracles),
    ("TextOps", text.TextOps.queries, text.TextOps.oracles),
    ("Dedup", dedup.Dedup.queries, dedup.Dedup.oracles),
    ("Embeddings", similarity.Embeddings.queries, similarity.Embeddings.oracles),
    ("Multimodal", multimodal.Multimodal.queries, multimodal.Multimodal.oracles),
    ("Streaming", streaming.Streaming.queries, streaming.Streaming.oracles),
    ("ApiQueries", api.ApiQueries.queries, api.ApiQueries.oracles),
    ("Relational2", operators.Relational2.queries, operators.Relational2.oracles),
    ("Relational3", operators.Relational3.queries, operators.Relational3.oracles),
    ("Relational4", operators.Relational4.queries, operators.Relational4.oracles),
    ("Relational5", operators.Relational5.queries, operators.Relational5.oracles),
    ("AsOf", operators.AsOf.queries, operators.AsOf.oracles),
    ("AsOfJoinNative", plans.AsOfJoinNative.queries, plans.AsOfJoinNative.oracles),
    ("IntervalJoinNative", plans.IntervalJoinNative.queries, plans.IntervalJoinNative.oracles),
    ("Pipeline", text.Pipeline.queries, text.Pipeline.oracles),
    ("Pipeline2", text.Pipeline2.queries, text.Pipeline2.oracles),
    ("Pipeline3", text.Pipeline3.queries, text.Pipeline3.oracles),
    ("Pipeline4", text.Pipeline4.queries, text.Pipeline4.oracles),
    ("Scrub", text.Scrub.queries, text.Scrub.oracles),
    ("Templates", spatial.Templates.queries, spatial.Templates.oracles),
    ("Components", dedup.Components.queries, dedup.Components.oracles),
    ("BloomDedup", dedup.BloomDedup.queries, dedup.BloomDedup.oracles),
    ("Analytics", operators.Analytics.queries, operators.Analytics.oracles),
    ("Intervals", operators.Intervals.queries, operators.Intervals.oracles),
    ("Downsample", operators.Downsample.queries, operators.Downsample.oracles),
    ("Compaction", sources.Compaction.queries, sources.Compaction.oracles),
    ("Hull", spatial.Hull.queries, spatial.Hull.oracles),
    ("Olap", operators.Olap.queries, operators.Olap.oracles),
    ("AnnCompact", similarity.AnnCompact.queries, similarity.AnnCompact.oracles),
    ("Hll", operators.Hll.queries, operators.Hll.oracles),
    ("Chunking", text.Chunking.queries, text.Chunking.oracles),
    ("Cms", operators.Cms.queries, operators.Cms.oracles),
    ("Containment", dedup.Containment.queries, dedup.Containment.oracles),
    ("Canonical", dedup.Canonical.queries, dedup.Canonical.oracles),
    ("Winnow", text.Winnow.queries, text.Winnow.oracles),
    ("Paragraph", dedup.Paragraph.queries, dedup.Paragraph.oracles),
    ("Holdout", text.Holdout.queries, text.Holdout.oracles),
    ("BpeFit", text.BpeFit.queries, text.BpeFit.oracles),
    ("LshStore", dedup.LshStore.queries, dedup.LshStore.oracles),
    ("BufferUnion", sources.BufferUnion.queries, sources.BufferUnion.oracles),
    ("ZOrderStore", spatial.ZOrderStore.queries, spatial.ZOrderStore.oracles),
    ("StoredIndex", similarity.StoredIndex.queries, similarity.StoredIndex.oracles),
    ("Mmr", similarity.Mmr.queries, similarity.Mmr.oracles),
    ("Funnel", operators.Funnel.queries, operators.Funnel.oracles),
    ("Geofence", spatial.Geofence.queries, spatial.Geofence.oracles),
    ("Quarantine", sources.Quarantine.queries, sources.Quarantine.oracles),
    ("Templates2", spatial.Templates2.queries, spatial.Templates2.oracles),
    ("Analytics2", operators.Analytics2.queries, operators.Analytics2.oracles),
    ("KnnGraph", similarity.KnnGraph.queries, similarity.KnnGraph.oracles),
    ("Corpus", text.Corpus.queries, text.Corpus.oracles),
    ("Graph2", similarity.Graph2.queries, similarity.Graph2.oracles),
    ("GraphStore", similarity.GraphStore.queries, similarity.GraphStore.oracles),
    ("Hybrid", similarity.Hybrid.queries, similarity.Hybrid.oracles),
    ("Markov", operators.Markov.queries, operators.Markov.oracles),
    ("Skyline", operators.Skyline.queries, operators.Skyline.oracles),
    ("MarkovStream", streaming.MarkovStream.queries, streaming.MarkovStream.oracles),
    ("BandStream", streaming.BandStream.queries, streaming.BandStream.oracles),
    ("LifecycleStream", streaming.LifecycleStream.queries, streaming.LifecycleStream.oracles),
    ("SkylineStream", streaming.SkylineStream.queries, streaming.SkylineStream.oracles),
    ("TopTerms", text.TopTerms.queries, text.TopTerms.oracles),
    ("Novelty", text.Novelty.queries, text.Novelty.oracles),
    ("Seasonal", operators.Seasonal.queries, operators.Seasonal.oracles),
    ("FunnelStream", streaming.FunnelStream.queries, streaming.FunnelStream.oracles),
    ("Triplets", similarity.Triplets.queries, similarity.Triplets.oracles),
    ("RollingCorr", operators.RollingCorr.queries, operators.RollingCorr.oracles),
    ("Dsir", text.Dsir.queries, text.Dsir.oracles),
    ("WeightedSample", text.WeightedSample.queries, text.WeightedSample.oracles),
    ("Pca", similarity.Pca.queries, similarity.Pca.oracles),
    ("KmvOverlap", dedup.KmvOverlap.queries, dedup.KmvOverlap.oracles),
    ("AnnEval", similarity.AnnEval.queries, similarity.AnnEval.oracles),
    ("KmvStream", streaming.KmvStream.queries, streaming.KmvStream.oracles),
    ("KlMix", text.KlMix.queries, text.KlMix.oracles),
    ("PcaStream", streaming.PcaStream.queries, streaming.PcaStream.oracles),
    ("AnnStream", streaming.AnnStream.queries, streaming.AnnStream.oracles),
    ("GraphStream", streaming.GraphStream.queries, streaming.GraphStream.oracles),
    ("DriftMonitor", similarity.DriftMonitor.queries, similarity.DriftMonitor.oracles),
    ("IndexRefresh", similarity.IndexRefresh.queries, similarity.IndexRefresh.oracles),
    ("DeleteRepair", similarity.DeleteRepair.queries, similarity.DeleteRepair.oracles),
    ("LiveDelete", streaming.LiveDelete.queries, streaming.LiveDelete.oracles))

  def queries: Map[String, QueryFn] = all.map(_._2).reduce(_ ++ _)
  def oracles: Map[String, String] = all.map(_._3).reduce(_ ++ _)
}
