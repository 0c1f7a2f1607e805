package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared staging for time-ordered replay slices: carve a frame with
  * a `ts_ms` column into `n` consecutive archive-time ranges, one
  * parquet file per slice, mod-time-stamped in replay order so the
  * file source (`maxFilesPerTrigger=1`, `latestFirst=false`) delivers
  * one slice per trigger in time order — the [[Replay.stage]]
  * mechanism for operators that need their own column set. At
  * warehouse scale this is a metadata walk over time partitions; here
  * the test archive is one file, so each slice write is a row-group-
  * pruned scan (the slice is a bounded replay quantum, not a corpus
  * shuffle). */
private[streaming] object Slices {

  def stage(df: DataFrame, tag: String, nSlices: Int): String = {
    val bounds = df.agg(min("ts_ms"), max("ts_ms")).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val w = (hi - lo) / nSlices + 1
    val srcDir = java.nio.file.Files.createTempDirectory(s"graft_${tag}_src").toString
    var i = 0
    while (i < nSlices) {
      val sliceDir = s"$srcDir/work_$i"
      df.where(col("ts_ms") >= lo + i * w && col("ts_ms") < lo + (i + 1) * w)
        .repartition(1).write.mode("overwrite").parquet(sliceDir)
      val part = new java.io.File(sliceDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(srcDir, f"slice_$i%04d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000000000L + i * 60000L)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(sliceDir))
      i += 1
    }
    srcDir
  }
}
