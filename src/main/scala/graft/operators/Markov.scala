package graft.operators

import graft.Tables
import graft.funcs.r6
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-user event
  * sequences — the sequence-analytics sibling of [[Funnel]]: where the
  * funnel asks "did this ordered chain happen", the transition matrix
  * fits the empirical next-step distribution P(to | from) that a
  * behavioral model / session simulator / anomaly scorer consumes
  * (a transition whose observed probability is rare flags the same
  * state machines the reference's command automation walks,
  * commands.ts state transitions generalized to data).
  */
object Markov {

  // --------------------------------------------------------------- #72
  /** Global (from_type → to_type) transition counts and probabilities
    * over per-user event streams ordered by (ts_ms, event_id).
    *
    * Scale shape: ONE exchange — the per-user LAG window shuffles on
    * user_id (at warehouse scale the event store is already bucketed
    * by user, making this exchange-free), then the transition-pair
    * aggregation collapses to an O(|event types|²) frame with map-side
    * combine, and the per-from normalization windows over THAT tiny
    * frame (O(types²), never the corpus). No self-join of the event
    * table on adjacent rows.
    *
    * Cross-engine determinism: counts are exact integers; p = n/total
    * is one IEEE divide of identical longs, 6-dp rounded both sides. */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val perFrom = Window.partitionBy("from_type")
    pairs
      .withColumn("p", r6(col("n") / sum(col("n")).over(perFrom)))
      .orderBy("from_type", "to_type")
  }

  val transitionMatrixOracle: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(ts), event_id) AS from_type
      |  FROM events
      |), pairs AS (
      |  SELECT from_type, event_type AS to_type, COUNT(*) AS n
      |  FROM seq WHERE from_type IS NOT NULL
      |  GROUP BY 1, 2
      |)
      |SELECT from_type, to_type, n,
      |  ROUND(n / SUM(n) OVER (PARTITION BY from_type), 6) AS p
      |FROM pairs
      |ORDER BY from_type, to_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_transition_matrix" -> (transitionMatrix _))

  val oracles: Map[String, String] = Map(
    "sk_transition_matrix" -> transitionMatrixOracle)
}
