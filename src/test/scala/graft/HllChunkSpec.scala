package graft

import graft.operators.Hll
import graft.text.Chunking
import org.apache.spark.sql.functions._

/** HyperLogLog sketch (operators/Hll.scala) and sliding-window
  * chunking (text/Chunking.scala). */
class HllChunkSpec extends SparkSpec {

  test("hll: estimate within 20% of exact for every group (m=256 → ~6.5% std err)") {
    val rows = Hll.hllDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("hll_estimate")
      val exact = r.getAs[Long]("exact_distinct").toDouble
      assert(math.abs(est - exact) / exact <= 0.20,
        s"${r.getAs[String]("event_type")}: est $est vs exact $exact")
    }
  }

  test("hll: registers are mergeable — max-union of disjoint halves equals the full sketch") {
    val ev = Tables.events(spark, sfDir).select(col("event_type"), col("user_id"), col("event_id"))
    val full = Hll.registers(ev.drop("event_id"))
    val a = Hll.registers(ev.where(col("event_id") % 2 === 0).drop("event_id"))
    val b = Hll.registers(ev.where(col("event_id") % 2 === 1).drop("event_id"))
    val merged = a.unionByName(b).groupBy("event_type", "idx").agg(max("mj").as("mj"))
    assert(merged.exceptAll(full).count() === 0)
    assert(full.exceptAll(merged).count() === 0)
  }

  test("hll set ops: union estimate is monotone and subadditive; intersection tracks exact") {
    val rows = Hll.hllSetOps(spark, sfDir).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (ea, eb, eu) = (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
        r.getAs[Double]("est_union"))
      val ei = r.getAs[Double]("est_intersect")
      val exact = r.getAs[Long]("exact_intersect").toDouble
      // max-merge registers dominate each input sketch pointwise →
      // the union estimate is ≥ each single estimate and ≤ their sum
      assert(eu >= math.max(ea, eb) - 1e-6, r.toString)
      assert(eu <= ea + eb + 1e-6, r.toString)
      // inclusion–exclusion intersection within combined sketch error
      // (three ±6.5%-stderr estimates; loose 3-sigma-ish bound scaled
      // to the union size)
      assert(math.abs(ei - exact) <= 0.35 * eu + 5.0,
        s"${r.getString(0)}/${r.getString(1)}: est $ei vs exact $exact (union $eu)")
      val j = r.getAs[Double]("jaccard_est")
      assert(j >= 0.0 && j <= 1.0 + 1e-6, r.toString)
    }
  }

  test("hll set ops: union estimate equals the single-sketch estimate of the concatenated slice") {
    // sketch(A∪B) == max-merge(sketch(A), sketch(B)) exactly — so the
    // pairwise union estimate must equal hllDistinct's estimate over
    // events filtered to the two types, re-labeled as one group
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"))
    val two = ev.select(col("event_type")).distinct()
      .orderBy("event_type").limit(2).collect().map(_.getString(0))
    val (ta, tb) = (two(0), two(1))
    val setops = Hll.hllSetOps(spark, sfDir)
      .filter(col("ta") === ta && col("tb") === tb)
      .select("est_union").collect().head.getDouble(0)
    val merged = Hll.registers(
      ev.filter(col("event_type").isin(ta, tb))
        .withColumn("event_type", lit("both")))
    val mj = merged.collect().map(r => (r.getLong(1), r.getInt(2).toLong)).toMap
    // recompute the estimate exactly as the operator does
    val nHit = mj.size.toLong
    val sHit = mj.values.map(m => 1L << (53 - m).toInt).sum
    val vEmpty = 256L - nHit
    val sScaled = sHit + vEmpty * (1L << 53)
    val alpha = 0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 9007199254740992.0
    val raw = alpha / sScaled.toDouble
    val est = if (raw <= 640.0 && vEmpty > 0) 256.0 * math.log(256.0 / vEmpty.toDouble) else raw
    val r6 = math.round(est * 1e6) / 1e6
    assert(math.abs(r6 - setops) < 1e-9, s"$r6 vs $setops")
  }

  test("chunking: stride windows tile the doc — stripped chunks reassemble the text") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rebuilt = Chunking.chunkOverlap(spark, sfDir)
      .withColumn("head48", array_join(slice(split(col("chunk_text"), " "), 1, 48), " "))
      .groupBy("doc_id")
      .agg(array_join(expr("transform(array_sort(collect_list(struct(chunk_idx, head48))), s -> s.head48)"), " ")
        .as("joined"))
      .select("doc_id", "joined").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rebuilt.keySet === docs.keySet)
    rebuilt.foreach { case (id, txt) => assert(txt === docs(id), s"doc $id") }
  }

  test("chunking: chunk count is ceil(tokens/stride); lengths are min(64, n - 48*idx)") {
    val out = Chunking.chunkOverlap(spark, sfDir).cache()
    val perDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max("chunk_idx").as("max_idx"))
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val j = perDoc.join(toks, "doc_id")
      .withColumn("expected", expr("(n + 47) DIV 48"))
    assert(j.where(col("n_chunks") =!= col("expected")).count() === 0)
    assert(j.where(col("max_idx") =!= col("expected") - 1).count() === 0)
    // exact window-clamp length for EVERY chunk (note: the PENULTIMATE
    // chunk is also short when the last stride lands within 16 tokens
    // of the end — the clamp formula covers every case)
    assert(out.join(toks, "doc_id")
      .where(col("chunk_len") =!= least(lit(64L), col("n") - col("chunk_idx") * 48))
      .count() === 0)
    out.unpersist()
  }
}
