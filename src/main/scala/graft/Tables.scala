package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Readers for the driver-generated testdata tables.
  *
  * Every operator in the library takes DataFrames; these helpers only
  * bind the driver's directory convention (`<sfDir>/<table>.parquet`).
  * At production scale the same operators run over arbitrary
  * hive-partitioned stores (see [[graft.sources.HiveStore]]).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader rejects; read it as raw nanos (legacy conf) and expose an
    * epoch-millis `ts_ms` BIGINT — the canonical time column for every
    * time-series operator (and hash-stable across engines). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // The nanos conf is consumed when the relation resolves its schema,
    // so it can be scoped: set, plan the read, restore (verified — the
    // plan executes correctly after the restore). Keeps demo reads from
    // permanently mutating shared session state.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      // Raw `ts` (nanos) is kept alongside ts_ms: time-range predicates
      // belong on the physical column so they push down to the parquet
      // scan (row-group pruning); ts_ms is for bucketing arithmetic.
      table(spark, dir, "events")
        .withColumn("ts_ms", expr("ts div 1000000"))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
