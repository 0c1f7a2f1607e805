package graft

import graft.text.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance resampling (text/Dsir.scala). The third test
  * rebuilds one selected document's score end-to-end on the driver
  * (java MessageDigest md5, BigDecimal HALF_UP rounding) — an
  * engine-independent reconstruction, not a re-run of the Spark
  * plan. */
class DsirSpec extends SparkSpec {

  private lazy val out = Dsir.sampleDsir(spark, sfDir).cache()

  test("dsir selects only candidate-pool (non-target) documents, ranked 1..n") {
    assert(out.count() > 0)
    assert(out.where(col("lang") === "en").count() === 0)
    val ranks = out.orderBy("rank").select("rank").collect().map(_.getInt(0))
    assert(ranks.toSeq === (1 to ranks.length))
    // gkey is non-increasing in rank order
    val keys = out.orderBy("rank").select("gkey").collect().map(_.getDouble(0))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
  }

  test("dsir is deterministic across runs") {
    val again = Dsir.sampleDsir(spark, sfDir).collect().toSeq
    assert(out.collect().toSeq === again)
  }

  test("one selected doc's score matches a driver-side reconstruction") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def r6d(x: Double): Double =
      java.math.BigDecimal.valueOf(x * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1e6
    def bucketOf(term: String): Int = Integer.parseInt(md5hex(term).take(2), 16) % 64

    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tc = new Array[Long](64); val cc = new Array[Long](64)
    docs.foreach { case (_, lang, text) =>
      val counts = if (lang == "en") tc else cc
      text.split(" ", -1).foreach(t => counts(bucketOf(t)) += 1)
    }
    val (tott, totc) = (tc.sum, cc.sum)
    val lr = Array.tabulate(64)(b => r6d(math.log(
      ((tc(b) + 1) * (totc + 64)).toDouble / ((cc(b) + 1) * (tott + 64)).toDouble)))

    val top = out.orderBy("rank").limit(1).head()
    val (topId, topScore) = (top.getAs[Long]("doc_id"), top.getAs[Double]("score"))
    val text = docs.find(_._1 == topId).get._3
    val nb = new Array[Long](64)
    text.split(" ", -1).foreach(t => nb(bucketOf(t)) += 1)
    // DECIMAL-summed in the engine; 6dp terms summed exactly here via BigDecimal
    val expected = (0 until 64).filter(nb(_) > 0)
      .map(b => java.math.BigDecimal.valueOf(r6d(nb(b) * lr(b))).setScale(6))
      .foldLeft(java.math.BigDecimal.ZERO)(_ add _).doubleValue()
    assert(math.abs(topScore - expected) < 1e-9)

    // gumbel key reconstruction from the doc_id-seeded uniform
    val u = (Integer.parseInt(md5hex(topId.toString).take(4), 16) + 0.5) / 65536.0
    val gk = r6d(topScore + r6d(-math.log(-r6d(math.log(u)))))
    assert(math.abs(top.getAs[Double]("gkey") - gk) < 1e-9)
  }
}
