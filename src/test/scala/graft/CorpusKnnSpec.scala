package graft

import graft.similarity.KnnGraph
import graft.text.Corpus
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantics + plan shape for the round-13 corpus-composition and
  * kNN-graph operators. */
class CorpusKnnSpec extends SparkSpec {

  private def planStr(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("domain cap: every source keeps min(cap, n) docs, checksums within bounds") {
    val rows = Corpus.domainCap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs"); val kept = r.getAs[Long]("n_kept")
      assert(kept == math.min(18L, n), s"${r.getAs[String]("source")}: $kept of $n")
      assert(r.getAs[Long]("kept_chars") > 0)
    }
  }

  test("domain cap: hash selection is partition-count invariant") {
    val base = Corpus.domainCap(spark, sfDir).collect().map(_.mkString("|")).toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val alt = Corpus.domainCap(spark, sfDir).collect().map(_.mkString("|")).toSeq
      assert(alt == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("domain cap plan: per-group limit runs as a bounded heap, not a full sort") {
    val p = planStr(Corpus.domainCap(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), p.take(3000))
  }

  test("entropy: bounded by log2 of the alphabet, flag consistent") {
    val rows = Corpus.textEntropy(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_bits")
      val d = r.getAs[Long]("distinct_chars")
      assert(h >= 0.0, s"negative entropy $h")
      // per-term rounding admits a whisker over the bound
      assert(h <= math.log(d.toDouble) / math.log(2.0) + 1e-3, s"H $h over log2($d)")
      assert(r.getAs[Boolean]("low_entropy") == (h < 3.0))
      if (d > 1) {
        val ne = r.getAs[Double]("norm_entropy")
        assert(ne >= 0.0 && ne <= 1.0 + 1e-3, s"norm $ne")
      }
    }
    // real English text must not trip the low-entropy gate wholesale
    assert(rows.count(_.getAs[Boolean]("low_entropy")) < rows.length / 2)
  }

  test("entropy matches a driver-side recount on a sample") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .where(col("doc_id") < 10).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Corpus.textEntropy(spark, sfDir)
      .where(col("doc_id") < 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy_bits")).toMap
    docs.foreach { case (id, text) =>
      val n = text.length.toDouble
      val ref = text.groupBy(identity).values.map { g =>
        val p = g.length / n
        math.round(p * math.log(p) / math.log(2.0) * 1e6) / 1e6
      }.sum
      assert(math.abs(got(id) - math.abs(ref)) < 1e-5, s"doc $id: ${got(id)} vs $ref")
    }
  }

  test("knn graph equals brute-force mutual top-5 within labels") {
    val vecs = Tables.embeddings(spark, sfDir).collect().map { r =>
      (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.round(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val byLabel = vecs.groupBy(_._2)
    val topk: Map[Long, Seq[(Long, Double, Int)]] = byLabel.values.flatMap { block =>
      block.map { case (id, _, v) =>
        val ranked = block.filter(_._1 != id)
          .map { case (oid, _, ov) => (oid, cos(v, ov)) }
          .sortBy { case (oid, c) => (-c, oid) }
          .take(5).zipWithIndex
          .map { case ((oid, c), i) => (oid, c, i + 1) }
        id -> ranked.toSeq
      }
    }.toMap
    val expected = topk.flatMap { case (a, ns) =>
      ns.flatMap { case (b, c, rab) =>
        if (a < b) topk(b).find(_._1 == a).map(x => (a, b, c, rab, x._3)) else None
      }
    }.toSet
    val got = KnnGraph.knnGraph(spark, sfDir).collect().map { r =>
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("cos"),
        r.getAs[Int]("rank_ab"), r.getAs[Int]("rank_ba"))
    }.toSet
    assert(got == expected,
      s"graph mismatch: ${(got diff expected).take(3)} vs ${(expected diff got).take(3)}")
    assert(got.nonEmpty)
  }

  test("knn graph plan: bounded-heap aggregate, no rank window over candidate pairs") {
    val p = planStr(KnnGraph.knnGraph(spark, sfDir))
    assert(p.contains("graft_topk"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }
}
