package graft

import org.apache.spark.sql.functions._

/** Hybrid RRF retrieval: rank-fusion invariants and the broadcast
  * plan shape.
  */
class HybridSpec extends SparkSpec {

  private lazy val out = graft.similarity.Hybrid.hybridRrf(spark, sfDir).collect()

  test("fused lists are dense, deduped and correctly scored") {
    assert(out.nonEmpty)
    val byProbe = out.groupBy(_.getLong(0))
    assert(byProbe.keySet == Set(0L, 1L, 2L))
    byProbe.values.foreach { rows =>
      // dense ranks 1..10, no duplicate candidate
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 10))
      val cands = rows.map(_.getLong(2))
      assert(cands.distinct.length == cands.length)
      rows.foreach { r =>
        // rrf recomputes from the two ranks (absent leg contributes 0)
        val kw = if (r.isNullAt(3)) 0.0 else 1.0 / (60.0 + r.getInt(3))
        val cos = if (r.isNullAt(4)) 0.0 else 1.0 / (60.0 + r.getInt(4))
        assert(r.getDouble(5) == kw + cos)
        // the probe itself never appears as a candidate
        assert(r.getLong(2) != r.getLong(0))
      }
      // fused order is non-increasing in rrf
      val sorted = rows.sortBy(_.getInt(1)).map(_.getDouble(5))
      sorted.sliding(2).foreach { p =>
        if (p.length == 2) assert(p(0) >= p(1))
      }
    }
  }

  test("a doc ranked #1 by BOTH modalities is the fused #1") {
    // constructed property on real data: if any probe has the same
    // candidate leading both lists, fusion must keep it on top
    val both = out.filter(r => !r.isNullAt(3) && !r.isNullAt(4) &&
      r.getInt(3) == 1 && r.getInt(4) == 1)
    both.foreach(r => assert(r.getInt(1) == 1))
  }

  private lazy val rr = graft.similarity.Hybrid.rerankCe(spark, sfDir).collect()

  test("rerank: dense top-10 per probe, candidates all from stage-1 store probes, ce consistent and ordered") {
    assert(rr.nonEmpty)
    val byProbe = rr.groupBy(_.getLong(0))
    assert(byProbe.keySet == Set(0L, 1L, 2L))
    // stage-1 candidate sets: the two STORE probes
    val bm = graft.similarity.Hybrid.bm25Stored(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = graft.similarity.StoredIndex.annIvfPqStored(spark, sfDir).collect()
      .filter(_.getLong(0) < 3).map(r => (r.getLong(0), r.getLong(1))).toSet
    byProbe.foreach { case (p, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 10))
      val cands = rows.map(_.getLong(2))
      assert(cands.distinct.length == cands.length)
      rows.foreach { r =>
        val (doc, cos, cov, ce) =
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
        assert(doc != p, "the probe reranked itself")
        assert(bm.contains((p, doc)) || ann.contains((p, doc)),
          s"candidate ($p,$doc) came from neither store probe")
        assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9)
        assert(cov >= 0.0 && cov <= 1.0)
        // the blend recomputes from the row's own rounded features
        assert(math.abs(ce - (0.6 * cos + 0.4 * cov)) < 5e-7,
          s"ce $ce drifted from 0.6*$cos + 0.4*$cov")
      }
      // rerank order is non-increasing in ce; ties ascend by doc_id
      rows.sortBy(_.getInt(1)).sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getDouble(5) > lo.getDouble(5) ||
            (hi.getDouble(5) == lo.getDouble(5) && hi.getLong(2) < lo.getLong(2)))
        case _ =>
      }
    }
  }

  test("rerank stage broadcasts the candidate set — the corpora never shuffle for the joint scoring") {
    val plan = graft.similarity.Hybrid.rerankCe(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan.take(2000))
    // joint features run over a result-scale candidate list: the only
    // exchanges feeding the window are broadcast or the tiny
    // candidate-distinct — the documents/embeddings corpus scans join
    // broadcast-side only
    assert(!plan.contains("SortMergeJoin"),
      "a corpus-side sort-merge join appeared in the rerank stage:\n" + plan.take(3000))
  }

  test("both corpora broadcast the probes — neither corpus shuffles for the join") {
    val plan = graft.similarity.Hybrid.hybridRrf(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      plan.take(2000))
    // the bounded-heap aggregate is present on both legs (partial
    // top-k before the exchange — candidates never shuffle)
    assert("partial_graft_topk".r.findAllIn(plan).size >= 2, plan.take(3000))
  }
}
