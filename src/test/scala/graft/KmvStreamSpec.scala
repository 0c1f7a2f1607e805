package graft

import graft.dedup.KmvOverlap
import graft.streaming.KmvStream

/** Live KMV sketch maintenance (streaming/KmvStream.scala). */
class KmvStreamSpec extends SparkSpec {

  test("trigger-at-a-time sketch maintenance equals the one-shot batch answer bit-for-bit") {
    // bottom-k is a mergeable synopsis: k-smallest-distinct(K(A) ∪ K(B))
    // = K(A ∪ B), so the slicing must be invisible in the estimate
    val live = KmvStream.streamKmvOverlap(spark, sfDir).collect().toSeq
    val batch = KmvOverlap.kmvOverlap(spark, sfDir).collect().toSeq
    assert(live === batch)
    assert(live.nonEmpty)
  }

  test("live postings appends answer bm25 identically to the one-shot batch build") {
    val live = graft.streaming.KmvStream.streamBm25Postings(spark, sfDir).collect().toSeq
    val batch = graft.similarity.Hybrid.bm25(spark, sfDir).collect().toSeq
    assert(live === batch)
    assert(live.nonEmpty)
  }
}
