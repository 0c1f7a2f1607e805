package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants of [[SparkEntry]] itself. The
  * queries/oracles maps are built by `++` over ~30 module maps, and
  * `++` silently SHADOWS duplicate keys — a name collision would make
  * an operator quietly vanish from the correctness gate. */
class ContractSpec extends AnyFunSuite {

  private val moduleQueryMaps = Seq(
    graft.operators.Relational.queries, graft.operators.TimeSeries.queries,
    graft.operators.Angular.queries, graft.spatial.Spatial.queries,
    graft.operators.Sessions.queries, graft.operators.SchemaOps.queries,
    graft.sources.Gpx.queries, graft.sources.HiveStore.queries,
    graft.sources.Migration.queries, graft.sources.Export.queries,
    graft.sources.SignalKDelta.queries, graft.text.TextOps.queries,
    graft.dedup.Dedup.queries, graft.similarity.Embeddings.queries,
    graft.multimodal.Multimodal.queries, graft.streaming.Streaming.queries,
    graft.api.ApiQueries.queries, graft.operators.Relational2.queries,
    graft.operators.Relational3.queries, graft.operators.Relational4.queries,
    graft.operators.AsOf.queries, graft.plans.AsOfJoinNative.queries,
    graft.plans.IntervalJoinNative.queries, graft.text.Pipeline.queries,
    graft.text.Pipeline2.queries, graft.text.Pipeline3.queries,
    graft.text.Scrub.queries, graft.spatial.Templates.queries,
    graft.dedup.Components.queries, graft.operators.Analytics.queries,
    graft.operators.Intervals.queries, graft.operators.Downsample.queries,
    graft.sources.Compaction.queries)

  test("no query name is shadowed by the module-map merge") {
    val perModule = moduleQueryMaps.map(_.keySet)
    val total = perModule.map(_.size).sum
    val merged = perModule.reduce(_ ++ _)
    val dupes = perModule.flatMap(_.toSeq).groupBy(identity)
      .collect { case (k, vs) if vs.size > 1 => k }
    assert(dupes.isEmpty, s"duplicate query names across modules: $dupes")
    assert(merged.size == total)
    // and the merge above is exactly what SparkEntry exposes
    assert(SparkEntry.queries.keySet == merged)
  }

  test("every oracle points at a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names are stable lowercase identifiers") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming query names: $bad")
  }

  test("the gate is as wide as the round claims") {
    // 140 oracle-checked queries as of round 7 (kmeans_fit,
    // dedup_incremental_lsh, embed_pq, ann_pq_topk joined the gate) —
    // a shrink means a module fell out of SparkEntry's merge
    assert(SparkEntry.queries.size >= 140)
    assert(SparkEntry.oracleSql.size >= 140)
  }
}
