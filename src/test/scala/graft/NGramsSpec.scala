package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.sql.catalyst.util.ArrayData

class NGramsSpec extends SparkSpec {

  private def lit(xs: Seq[String]) =
    Literal.create(xs, ArrayType(StringType))

  private def evalGrams(xs: Seq[String], n: Int): Seq[String] = {
    val r = graft.functions.NGrams(lit(xs), n).eval(null).asInstanceOf[ArrayData]
    (0 until r.numElements()).map(r.getUTF8String(_).toString)
  }

  test("interpreted eval: windows, short input, n=1") {
    assert(evalGrams(Seq("a", "b", "c", "d"), 3) == Seq("a b c", "b c d"))
    assert(evalGrams(Seq("a", "b"), 3) == Seq.empty)
    assert(evalGrams(Seq.empty, 3) == Seq.empty)
    assert(evalGrams(Seq("a", "b"), 1) == Seq("a", "b"))
    assert(evalGrams(Seq("x", "y"), 2) == Seq("x y"))
  }

  test("codegen path equals the lambda formulation on the real corpus") {
    val toks = Tables.documents(spark, sfDir)
      .select(split(col("text"), " ").as("t"))
    val native = toks
      .select(explode(graft.functions.NGrams.ngrams(col("t"), 3)).as("g"))
      .groupBy("g").count()
    val lambda = toks.where(size(col("t")) >= 3)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 2), " +
          "i -> concat_ws(' ', t[i-1], t[i], t[i+1]))")).as("g"))
      .groupBy("g").count()
    assert(native.exceptAll(lambda).count() == 0)
    assert(lambda.exceptAll(native).count() == 0)
    assert(native.count() > 0)
  }

  test("SQL registration enforces the literal-n contract") {
    graft.functions.NGrams.register(spark)
    import spark.implicits._
    val got = Seq(Seq("p", "q", "r")).toDF("t")
      .selectExpr("graft_ngrams(t, 2) AS g").head.getSeq[String](0)
    assert(got == Seq("p q", "q r"))
  }
}
