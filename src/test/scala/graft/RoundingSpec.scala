package graft

import org.apache.spark.sql.functions._

/** Pins [[funcs.r6]] to DuckDB's ROUND semantics (std::round of the
  * ×1e6-scaled BINARY value) on the exact strand doubles where Spark's
  * built-in round — which rounds the shortest-DECIMAL repr — disagrees.
  * These are the measured sf0.1 failures of §5a #23: a value whose
  * shortest repr reads "…5" but whose binary value is just below the
  * tie rounds UP under Spark's repr-based HALF_UP and DOWN under
  * DuckDB's scaled std::round. The driver hashes bits, so funcs.r6
  * must take DuckDB's side.
  */
class RoundingSpec extends SparkSpec {
  import spark.implicits._

  // (input, DuckDB ROUND(x, 6)) — references computed with DuckDB
  private val cases = Seq(
    32.0741665 -> 32.074166, // measured: sk_weather_impact avg_speed
    0.1268065 -> 0.126806,   // measured: sk_angular_tier value_cos_avg
    -0.0632425 -> -0.063242, // binary just above the negative tie
    0.9999995 -> 1.0,
    1.5e-6 -> 2.0e-6,        // true binary tie ties away from zero
    0.7 -> 0.7,              // already at 6 dp: exact passthrough
    123.4567891 -> 123.456789)

  test("r6 matches DuckDB's scaled-binary ROUND on repr-vs-binary strands") {
    val got = cases.map(_._1).toDF("x")
      .select(funcs.r6(col("x")).as("r"))
      .as[Double].collect()
    cases.zip(got).foreach { case ((x, want), r) =>
      assert(r == want, s"r6($x) = $r, want $want")
    }
  }

  test("the strand class is real: Spark's repr-based round disagrees") {
    // documents WHY r6 is not round(x, 6): on the measured strand the
    // two roundings differ by exactly one step
    val Seq((builtin, scaled)) = Seq(32.0741665).toDF("x")
      .select(round(col("x"), 6).as("b"), funcs.r6(col("x")).as("s"))
      .as[(Double, Double)].collect().toSeq
    assert(builtin == 32.074167 && scaled == 32.074166)
  }

  test("rN generalizes: millimeter distances and 1-dp medians") {
    val Seq((d3, d1)) = Seq((1234.5678915, 7.25)).toDF("a", "b")
      .select(funcs.rN(col("a"), 3).as("d3"), funcs.rN(col("b"), 1).as("d1"))
      .as[(Double, Double)].collect().toSeq
    assert(d3 == 1234.568 || d3 == 1234.567) // strand-dependent, just 3 dp
    assert(math.abs(d3 * 1000 - math.rint(d3 * 1000)) < 1e-9)
    assert(d1 == 7.3) // half-integer medians tie away from zero
  }

  test("r6 emits +0.0 for tiny negatives (the oracle normalizes to match)") {
    val Seq(z) = Seq(-2.5e-7).toDF("x")
      .select(funcs.r6(col("x"))).as[Double].collect().toSeq
    assert(z == 0.0 &&
      java.lang.Double.doubleToRawLongBits(z) == 0L,
      "Spark-side rounded zero must be +0.0; DuckDB keeps -0.0, " +
        "which is why possibly-negative oracle outputs add `+ 0.0`")
  }
}
