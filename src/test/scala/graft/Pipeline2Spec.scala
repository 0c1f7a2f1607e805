package graft

import graft.text.Pipeline2
import org.apache.spark.sql.functions._

class Pipeline2Spec extends SparkSpec {

  test("ngramStream emits len-n+1 ngrams per doc, in order") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d", "s"), (2L, "x y", "s"))
      .toDF("doc_id", "text", "source")
    val got = Pipeline2.ngramStream(docs, 3).orderBy("doc_id", "ngram")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(got.toSeq == Seq((1L, "a b c"), (1L, "b c d")))
  }

  test("decontaminate never flags a benchmark doc and hits are positive") {
    val rows = Pipeline2.decontaminate(spark, sfDir).collect()
    assert(rows.forall(_.getLong(0) % 20 != 0))
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("decontaminate broadcasts the benchmark ngram set") {
    val plan = Pipeline2.decontaminate(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast semi-join:\n$plan")
  }

  test("quality_repetition fractions are in range and consistent") {
    val rows = Pipeline2.qualityRepetition(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dup = r.getDouble(2); val top = r.getDouble(3)
      assert(dup >= 0.0 && dup < 1.0)
      // the most frequent bigram is at least one of n, at most all dups + 1
      assert(top > 0.0 && top <= 1.0)
      assert(r.getBoolean(4) == (dup <= 0.05 && top <= 0.08))
    }
  }

  test("substring dedup pairs are ordered and positive") {
    val rows = Pipeline2.substringDedup(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) > 0)
    }
  }

  test("mix_balance keeps everything from the smallest source") {
    val rows = Pipeline2.mixBalance(spark, sfDir).collect()
    assert(rows.length > 1)
    val minSrc = rows.minBy(_.getLong(3)) // smallest total_tokens
    assert(minSrc.getLong(2) == minSrc.getLong(1), "min source keeps all docs")
    assert(minSrc.getDouble(5) == 1.0)
    // every other source's kept tokens is <= its total
    rows.foreach(r => assert(r.getLong(4) <= r.getLong(3)))
  }
}
