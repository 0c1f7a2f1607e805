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
}
