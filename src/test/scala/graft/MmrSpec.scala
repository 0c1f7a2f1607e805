package graft

import graft.similarity.Mmr
import org.apache.spark.sql.functions._

class MmrSpec extends SparkSpec {

  test("mmr picks k distinct pool members and actually diversifies vs plain top-k") {
    val picks = Mmr.mmrSelect(spark, sfDir).collect()
    assert(picks.length == 5)
    val ids = picks.map(_.getAs[Long]("vec_id")).toSeq
    assert(ids.distinct.size == 5)
    ids.foreach(id => assert(id % 7 == 3, s"pick $id outside the pool"))
    // rank 1 is the pure-relevance argmax (no selected set yet)
    assert(picks(0).isNullAt(picks(0).fieldIndex("max_sim")))
    assert(picks(0).getAs[Double]("score") == picks(0).getAs[Double]("rel"))
    // diversity is load-bearing: the greedy trajectory must differ from
    // plain top-5-by-relevance on this corpus (if it didn't, the
    // redundancy penalty would be vacuous here)
    val top5 = Mmr.relevancePool(spark, sfDir)
      .orderBy(col("rel").desc, col("vec_id")).limit(5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ids != top5, s"MMR degenerated to plain top-k: $ids")
    // every later pick carries a max_sim strictly below 1 (no duplicate
    // of an already-selected vector can be re-picked)
    picks.drop(1).foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("max_sim")))
      assert(r.getAs[Double]("max_sim") < 1.0)
    }
  }
}
