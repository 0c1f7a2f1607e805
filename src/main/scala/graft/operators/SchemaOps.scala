package graft.operators

import graft.Tables
import graft.funcs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema validation / smart-type detection — the reference's
  * schema-service.ts and type-detector.ts: classify string-encoded
  * values (numeric-as-string, boolean-as-string), report violations,
  * and repair by casting to the proper type.
  */
object SchemaOps {

  // --------------------------------------------------------------- #25
  /** Validation + repair over a mixed string column (synthesized from
    * documents so both engines see identical strings): classify each
    * value as numeric / boolean / string via try-cast probes, then
    * "repair" numerics by casting and aggregate them. */
  def schemaRepair(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("str_val", expr(
        "CASE WHEN doc_id % 3 = 0 THEN CAST(n_chars AS STRING) WHEN doc_id % 3 = 1 THEN 'true' ELSE lang END"))
      .withColumn("detected_type", expr(
        """CASE WHEN try_cast(str_val AS DOUBLE) IS NOT NULL THEN 'numeric'
          |     WHEN lower(str_val) IN ('true','false') THEN 'boolean'
          |     ELSE 'string' END""".stripMargin))
      .groupBy("detected_type")
      .agg(count(lit(1)).as("n_values"),
        davg(expr("try_cast(str_val AS DOUBLE)")).as("avg_repaired"))
      .orderBy("detected_type")

  val schemaRepairOracle: String =
    """WITH v AS (
      |  SELECT CASE WHEN doc_id % 3 = 0 THEN CAST(n_chars AS VARCHAR)
      |              WHEN doc_id % 3 = 1 THEN 'true' ELSE lang END AS str_val
      |  FROM documents
      |), c AS (
      |  SELECT str_val,
      |    CASE WHEN try_cast(str_val AS DOUBLE) IS NOT NULL THEN 'numeric'
      |         WHEN lower(str_val) IN ('true','false') THEN 'boolean'
      |         ELSE 'string' END AS detected_type
      |  FROM v
      |)
      |SELECT detected_type, COUNT(*) AS n_values,
      |  CAST(SUM(CAST(try_cast(str_val AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
      |    / COUNT(try_cast(str_val AS DOUBLE)) AS avg_repaired
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- #26
  /** Smart type detection over the value column: integral vs
    * fractional split per series plus range — the writer's
    * DOUBLE-vs-INT64 decision (type-detector.ts). */
  def valueTyping(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(when(col("value") === floor(col("value")), 1)).as("n_integral"),
        count(when(col("value") =!= floor(col("value")), 1)).as("n_fractional"),
        count(when(col("value").isNull, 1)).as("n_null"),
        min("value").as("min_value"),
        max("value").as("max_value"))
      .orderBy("event_type")

  val valueTypingOracle: String =
    """SELECT event_type,
      |  COUNT(CASE WHEN value = FLOOR(value) THEN 1 END) AS n_integral,
      |  COUNT(CASE WHEN value <> FLOOR(value) THEN 1 END) AS n_fractional,
      |  COUNT(CASE WHEN value IS NULL THEN 1 END) AS n_null,
      |  MIN(value) AS min_value, MAX(value) AS max_value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk_schema_repair" -> (schemaRepair _),
    "sk_value_typing" -> (valueTyping _))

  val oracles: Map[String, String] = Map(
    "sk_schema_repair" -> schemaRepairOracle,
    "sk_value_typing" -> valueTypingOracle)
}
