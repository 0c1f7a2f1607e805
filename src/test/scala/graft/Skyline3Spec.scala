package graft

import org.apache.spark.sql.functions._

/** 3-objective skyline: the staged certify/bucket/merge plan must
  * equal the definitional brute force bit-for-bit.
  */
class Skyline3Spec extends SparkSpec {

  test("skyline3 equals the in-engine brute-force dominance test") {
    val fast = graft.operators.Skyline.skyline3(spark, sfDir).collect()
    val p = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"),
        length(col("p_name")).as("name_len"))
    p.createOrReplaceTempView("sk3_t")
    val brute = spark.sql(
      """SELECT q.* FROM sk3_t q
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM sk3_t p
        |  WHERE p.p_retailprice <= q.p_retailprice AND p.p_size >= q.p_size
        |    AND p.name_len >= q.name_len
        |    AND (p.p_retailprice < q.p_retailprice OR p.p_size > q.p_size
        |         OR p.name_len > q.name_len))
        |ORDER BY q.p_partkey""".stripMargin).collect()
    assert(fast.map(_.toString).toSeq == brute.map(_.toString).toSeq)
    assert(fast.nonEmpty)
  }

  test("the 3-D frontier contains the max-quality 2-D frontier and is larger") {
    // every 2-D (price, size) skyline part carrying its class's max
    // comment length is certified 3-D skyline; relaxing to a third
    // objective can only ADD frontier points
    val sky2 = graft.operators.Skyline.skyline(spark, sfDir).collect()
      .map(r => (r.getDouble(1), r.getInt(2))).toSet
    val sky3 = graft.operators.Skyline.skyline3(spark, sfDir).collect()
    assert(sky3.length >= sky2.size)
    val sky3Pairs = sky3.map(r => (r.getDouble(1), r.getInt(2))).toSet
    assert(sky2.subsetOf(sky3Pairs),
      "a 2-D frontier (price,size) pair vanished from the 3-D frontier")
  }
  test("price-degenerate corpus: equi-depth buckets stay population-bounded, answer exact") {
    // 90% of parts forced to ONE price — the corpus shape that put the
    // whole distinct-triple frame into a single equal-width bucket
    // (r14 verdict) and made stage 2 quadratic on it
    val p = Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        when(pmod(col("p_partkey"), lit(10)) < 9, lit(1000.0))
          .otherwise(col("p_retailprice")).as("price"),
        col("p_size").as("size"), length(col("p_name")).as("qual"))
    val fast = graft.operators.Skyline.skyline3Of(p)
      .withColumnRenamed("p_retailprice", "price")
      .withColumnRenamed("p_size", "size")
      .withColumnRenamed("name_len", "qual")
      .collect()
    p.createOrReplaceTempView("sk3_degen")
    val brute = spark.sql(
      """SELECT q.* FROM sk3_degen q
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM sk3_degen p
        |  WHERE p.price <= q.price AND p.size >= q.size AND p.qual >= q.qual
        |    AND (p.price < q.price OR p.size > q.size OR p.qual > q.qual))
        |ORDER BY q.p_partkey""".stripMargin).collect()
    assert(fast.map(_.toString).toSeq == brute.map(_.toString).toSeq)
    assert(fast.nonEmpty)
    // the population bound the equi-depth bucketing guarantees: ntile
    // caps every bucket at ceil(T/128) distinct triples even though
    // one price carries ~90% of the corpus
    val t = p.groupBy("price", "size", "qual").agg(count(lit(1)))
      .select("price", "size", "qual")
    val total = t.count()
    val maxPop = t.withColumn("b", ntile(128).over(
        org.apache.spark.sql.expressions.Window.orderBy("price", "size", "qual")) - 1)
      .groupBy("b").agg(count(lit(1)).as("n"))
      .agg(max("n")).head().getLong(0)
    assert(maxPop <= (total + 127) / 128,
      s"bucket population $maxPop exceeds ceil($total/128)")
  }
}
