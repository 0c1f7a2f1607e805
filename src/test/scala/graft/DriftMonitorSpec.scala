package graft

import graft.similarity.DriftMonitor
import org.apache.spark.sql.functions._

/** The drift alarm must fire on the seeded shifted batch and stay near
  * zero on an in-distribution control batch; the report must be an
  * internally consistent histogram pair. */
class DriftMonitorSpec extends SparkSpec {

  test("seeded drift fires the alarm; a no-drift control batch does not") {
    val drifted = DriftMonitor.reportWithShift(spark, sfDir, 0.5)
    val control = DriftMonitor.reportWithShift(spark, sfDir, 0.0)
    val klD = drifted.select("kl").head().getDouble(0)
    val klC = control.select("kl").head().getDouble(0)
    assert(klD > 1.0, s"drifted KL $klD — the alarm did not fire")
    assert(klC >= 0.0 && klC < klD / 10,
      s"control KL $klC vs drifted $klD — no separation")
  }

  test("report is a consistent histogram pair: counts partition both corpora, terms sum to kl") {
    val r = DriftMonitor.reportWithShift(spark, sfDir, 0.5).collect()
    assert(r.length == 16)
    val emb = Tables.embeddings(spark, sfDir)
    val nRef = emb.where(pmod(col("vec_id"), lit(4L)) =!= 3L).count()
    val nBatch = emb.where(pmod(col("vec_id"), lit(4L)) === 3L).count()
    assert(r.map(_.getLong(1)).sum == nRef)
    assert(r.map(_.getLong(2)).sum == nBatch)
    val kl = r.head.getDouble(4)
    assert(r.forall(_.getDouble(4) == kl))
    assert(math.abs(r.map(_.getDouble(3)).sum - kl) < 1e-5)
  }

  test("live moment store serves the identical drift report (drain == batch, bit for bit)") {
    val live = graft.streaming.PcaStream.streamDriftReport(spark, sfDir).collect()
    val batch = DriftMonitor.reportWithShift(spark, sfDir, 0.5).collect()
    assert(live.nonEmpty)
    assert(live.map(_.toString).toSeq == batch.map(_.toString).toSeq)
  }
}
