package graft

import graft.spatial.Templates
import graft.text.Pipeline3
import org.apache.spark.sql.functions._

class Pipeline3Spec extends SparkSpec {

  test("boilerplate scrub drops exactly the cross-doc 5-gram cover") {
    import spark.implicits._
    // "a b c d e" appears in docs 1 and 2 (at pos 0 and 1); doc 3 is
    // untouched. Expected covers: doc1 pos 0-4 -> "f g" survives;
    // doc2 pos 1-5 -> "z q" survives.
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "z a b c d e q"),
      (3L, "p q r s t u v")).toDF("doc_id", "text")
    val got = Pipeline3.scrubDocs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 7L, 2L, "f g"),
      (2L, 7L, 2L, "z q"),
      (3L, 7L, 7L, "p q r s t u v")))
  }

  test("boilerplate scrub: doc shorter than the n-gram survives whole") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    // 3 tokens -> no 5-grams -> nothing is boilerplate
    val got = Pipeline3.scrubDocs(docs).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(got.toSeq == Seq((1L, "a b c"), (2L, "a b c")))
  }

  test("boilerplate scrub: fully-covered doc rebuilds to empty string") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    val got = Pipeline3.scrubDocs(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq((1L, 0L, ""), (2L, 0L, "")))
  }

  test("stratified sampling keeps min(k, stratum size) per stratum, deterministically") {
    val docs = Tables.documents(spark, sfDir)
    val sizes = docs.groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = Pipeline3.stratifiedTopK(docs, 20)
    val perStratum = got.groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(perStratum.nonEmpty)
    perStratum.foreach { case (k, n) => assert(n == math.min(20L, sizes(k))) }
    // deterministic: a second evaluation picks the identical id set
    val ids1 = got.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Pipeline3.stratifiedTopK(docs, 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }

  test("token-budget sampling: rate = min(1, B/total), kept tokens track the budget") {
    val rows = Pipeline3.sampleTokenBudget(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTotal, nKept) = (r.getLong(1), r.getLong(2))
      val (total, kept) = (r.getLong(3), if (r.isNullAt(4)) 0L else r.getLong(4))
      val rate = r.getDouble(5)
      assert(nKept <= nTotal && kept <= total)
      assert(math.abs(rate - math.min(1.0, 20000.0 / total)) < 1e-6)
      if (rate >= 1.0) assert(nKept == nTotal && kept == total)
      // hash-keep deviation is O(sqrt(B)) in tokens — 30% covers the
      // worst stratum at every SF the suite runs
      else assert(math.abs(kept - 20000.0) < 0.3 * 20000.0,
        s"${r.getString(0)}: kept $kept tokens vs budget 20000")
    }
  }

  test("stratified sampling plans a WindowGroupLimit (map-side top-k, no full sort)") {
    val plan = Pipeline3.stratifiedTopK(Tables.documents(spark, sfDir), 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
  }

  test("nav summary invariants: distances, fractions, spread in range") {
    val rows = Templates.navSummary(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0) // total_distance_m
      assert(r.getLong(3) > 0L) // n_fixes
      if (!r.isNullAt(6)) {
        val f = r.getDouble(6) // stationary_frac
        assert(f >= 0.0 && f <= 1.0)
      }
      if (!r.isNullAt(7)) {
        val s = r.getDouble(7) // course_spread
        assert(s >= -1e-6 && s <= 1.0 + 1e-6)
      }
    }
  }

  test("nav summary n_fixes reconciles with the raw view-event count") {
    val total = Templates.navSummary(spark, sfDir)
      .agg(sum("n_fixes")).collect()(0).getLong(0)
    val views = Tables.events(spark, sfDir)
      .where(col("event_type") === "view").count()
    // inner join may drop (user, day) groups with no click/signup rows,
    // so reconciliation is <=; at test scale every group has both legs
    assert(total <= views)
    assert(total > views / 2)
  }
}
