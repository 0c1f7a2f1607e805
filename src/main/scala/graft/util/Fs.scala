package graft.util

import org.apache.spark.sql.SparkSession

/** Filesystem resolution FROM the store path (never hardcoded local).
  *
  * A store rooted at `s3a://…`, `hdfs://…` or a plain `/dir` resolves to
  * the FileSystem its URI names, so the maintenance choreography built on
  * listings and renames — retention sweeps, backup diffs, compaction
  * publishes, migration skip-existing checks, streaming store swaps —
  * runs unchanged against cloud object stores. That is the reference's
  * actual deployment (signalk-parquet utils/cloud-endpoint.ts:1-80 and
  * the data-handler cloud fallback archive to S3/R2); a
  * `FileSystem.getLocal` would silently operate on the wrong namespace
  * for any non-`file:` store root.
  */
object Fs {

  /** The FileSystem that owns `path`, from the session's Hadoop conf. */
  def of(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
}
