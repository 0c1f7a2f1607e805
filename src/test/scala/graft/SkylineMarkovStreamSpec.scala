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

  test("streamSkyline's incremental frontier equals the batch skyline") {
    val streamed = graft.streaming.SkylineStream.streamSkyline(spark, sfDir)
    val batch = Skyline.skyline(spark, sfDir)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    assert(batch.count() > 0)
  }

  test("topTerms plans a WindowGroupLimit and emits contiguous per-doc ranks") {
    val q = graft.text.TopTerms.topTerms(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n${plan.take(3000)}")
    val out = q.cache()
    val perDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("k"), max("rank").as("mx"), min("rank").as("mn"))
    assert(perDoc.where(col("k") > 3 || col("mx") =!= col("k") || col("mn") =!= 1)
      .count() === 0)
    // every document with at least one term is represented
    assert(out.select("doc_id").distinct().count() ===
      Tables.documents(spark, sfDir).where(length(col("text")) > 0).count())
  }

  test("streamFunnel drains to the exact batch funnel with partial conversions") {
    val streamed = graft.streaming.FunnelStream.streamFunnel(spark, sfDir)
    val batch = graft.operators.Funnel.funnel(spark, sfDir)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    val r = streamed.head()
    assert(r.getAs[Long]("n_view") > 0)
    // thresholds keep the funnel partial — a trivially-complete funnel
    // would prove nothing about the stage chaining
    assert(r.getAs[Long]("n_purchase_after_click") < r.getAs[Long]("n_view"))
  }

  test("streamTransitionMatrix drains to the exact batch matrix") {
    val streamed = MarkovStream.streamTransitionMatrix(spark, sfDir)
    val batch = Markov.transitionMatrix(spark, sfDir)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    assert(batch.count() > 0)
  }
}
