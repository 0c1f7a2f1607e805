package graft

import graft.similarity.Pca
import graft.streaming.PcaStream

/** Live PCA moment-store maintenance (streaming/PcaStream.scala). */
class PcaStreamSpec extends SparkSpec {

  test("trigger-at-a-time moment maintenance equals the one-shot batch projection bit-for-bit") {
    // exact scaled-long moment sums are associative over any corpus
    // slicing, so the merged store buffer — and therefore the whole
    // eigen trajectory and every projection — must be bit-identical
    val live = PcaStream.streamPcaMoments(spark, sfDir).collect().toSeq
    val batch = Pca.embedPca(spark, sfDir).collect().toSeq
    assert(live === batch)
    assert(live.nonEmpty)
  }
}
