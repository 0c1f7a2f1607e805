package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The persisted DELETE LOG of a live-maintained store — what makes a
  * deletion DURABLE against the store's own ingest: a GDPR/retention
  * delete must hold even for ids that arrive (or re-arrive) AFTER the
  * delete was applied, so every ingest batch is anti-joined against
  * the log before it touches the store. Without this, the production
  * sequence "triggers → delete → more triggers" silently resurrects
  * any deleted id whose source row lands in a later batch.
  *
  * Shape: a tiny append-only parquet table (`<store>/deletes`, one id
  * column) — delete-set-sized, never corpus-sized. Appends are
  * idempotent in effect (the log is read as a SET; a crashed delete's
  * re-run appending the same ids changes nothing), and the gate is a
  * broadcast anti-join: O(|batch|) per trigger.
  */
object DeleteLog {

  private def logDir(store: String) = store + "/deletes"

  /** Record `ids` (a single-column frame) as deleted. Append-only;
    * duplicates are harmless (set semantics at read). */
  def append(spark: SparkSession, store: String, ids: DataFrame): Unit =
    ids.coalesce(1).write.mode("append").parquet(logDir(store))

  /** The deleted-id set, or None when nothing was ever deleted. */
  def ids(spark: SparkSession, store: String): Option[DataFrame] = {
    val fs = Fs.of(spark, store)
    if (!fs.exists(new Path(logDir(store)))) None
    else Some(spark.read.parquet(logDir(store)).distinct())
  }

  /** Gate an ingest batch: drop every row whose `idCol` the log holds. */
  def gate(spark: SparkSession, store: String, batch: DataFrame,
      idCol: String): DataFrame =
    ids(spark, store) match {
      case Some(del) => batch.join(
        org.apache.spark.sql.functions.broadcast(del), Seq(idCol), "left_anti")
      case None => batch
    }
}
