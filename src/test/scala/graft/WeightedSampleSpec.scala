package graft

import graft.text.WeightedSample
import org.apache.spark.sql.functions._

/** Per-language PPS weighted sampling (text/WeightedSample.scala). */
class WeightedSampleSpec extends SparkSpec {

  private lazy val out = WeightedSample.weightedK(spark, sfDir).cache()

  test("weighted sample takes min(k, |lang|) docs per language with dense ranks") {
    assert(out.count() > 0)
    val langSizes = Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n"))
    val taken = out.groupBy("lang").agg(count(lit(1)).as("t"), max("rank").as("mr"))
    val j = taken.join(langSizes, "lang").collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val (t, mr, n) = (r.getAs[Long]("t"), r.getAs[Long]("mr"), r.getAs[Long]("n"))
      assert(t === math.min(30L, n))
      assert(mr === t) // dense 1..t
    }
    // gkey non-increasing within each language's rank order
    val bad = out.as("a").join(out.as("b"),
      col("a.lang") === col("b.lang") && col("a.rank") + 1 === col("b.rank"))
      .where(col("a.gkey") < col("b.gkey"))
    assert(bad.count() === 0)
  }

  test("weighted sample is deterministic and salt-independent of the holdout carve") {
    val again = WeightedSample.weightedK(spark, sfDir).collect().toSeq
    assert(out.collect().toSeq === again)
    // different salt ⇒ genuinely different selection order somewhere
    // (the holdout carve orders by an unweighted ':holdout' hash)
    val hold = graft.text.Holdout.holdoutK(spark, sfDir)
      .select("lang", "rank", "doc_id").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val ours = out.select("lang", "rank", "doc_id").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(hold !== ours)
  }

  test("one row's selection key matches a driver-side reconstruction") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def r6d(x: Double): Double =
      java.math.BigDecimal.valueOf(x * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1e6

    val top = out.orderBy("lang", "rank").limit(1).head()
    val (id, gkey) = (top.getAs[Long]("doc_id"), top.getAs[Double]("gkey"))
    val nChars = Tables.documents(spark, sfDir)
      .where(col("doc_id") === id).head().getAs[Long]("n_chars")
    val u = (Integer.parseInt(md5hex(id.toString + ":wk").take(4), 16) + 0.5) / 65536.0
    val expected = r6d(r6d(math.log((nChars + 1).toDouble)) +
      r6d(-math.log(-r6d(math.log(u)))))
    assert(math.abs(gkey - expected) < 1e-9)
  }
}
