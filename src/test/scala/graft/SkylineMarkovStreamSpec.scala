package graft

import graft.operators.{Markov, Skyline}
import graft.streaming.MarkovStream
import org.apache.spark.sql.functions._

/** Skyline operator (operators/Skyline.scala) and the streaming
  * transition-matrix twin (streaming/MarkovStream.scala). */
class SkylineMarkovStreamSpec extends SparkSpec {

  test("skyline equals the quadratic dominance model exactly") {
    val out = Skyline.skyline(spark, sfDir)
    val p = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    val q = p.select(col("p_partkey").as("qk"),
      col("p_retailprice").as("qp"), col("p_size").as("qs"))
    val dominated = q.join(p,
        col("p_retailprice") <= col("qp") && col("p_size") >= col("qs") &&
          (col("p_retailprice") < col("qp") || col("p_size") > col("qs")),
        "left_semi")
    val model = q.join(dominated.select(col("qk").as("dk")),
        col("qk") === col("dk"), "left_anti")
      .select(col("qk").as("p_partkey"), col("qp").as("p_retailprice"),
        col("qs").as("p_size"))
    assert(out.exceptAll(model).count() === 0)
    assert(model.exceptAll(out).count() === 0)
    assert(out.count() > 0)
  }

  test("skyline plan: corpus never self-joins; big windows are bucket-partitioned") {
    val plan = Skyline.skyline(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the only UNpartitioned window is the O(buckets) prefix-max frame:
    // its input is the groupBy(b) maxima, never row-scale data
    val unpart = "windowspecdefinition\\(([a-z_]+#\\d+L?) ASC".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(unpart.forall(_.startsWith("b#")),
      s"unpartitioned window over non-bucket frame: $unpart\n$plan")
  }

  test("streamTransitionMatrix drains to the exact batch matrix") {
    val streamed = MarkovStream.streamTransitionMatrix(spark, sfDir)
    val batch = Markov.transitionMatrix(spark, sfDir)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    assert(batch.count() > 0)
  }
}
