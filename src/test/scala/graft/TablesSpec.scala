package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** The events-time seam. The driver's generator has shipped `events.ts`
  * as TIMESTAMP(NANOS) (readable only as raw-nanos BIGINT under the
  * legacy conf) and later as TIMESTAMP(MICROS) naive (TIMESTAMP_NTZ) —
  * the round-10 artifact loss was exactly this seam: a hardcoded nanos
  * assumption reinterpreted micros 1000× off (batch threw; streams were
  * silently wrong). These tests pin every encoding to the same epoch-ms
  * answer so a future re-generation changes nothing. */
class TablesSpec extends SparkSpec {
  private val ms = 1704067200123L // 2024-01-01T00:00:00.123Z

  private def oneRow(dt: DataType, v: Any): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(Row(v)),
      StructType(Seq(StructField("ts", dt))))

  test("tsMillis: raw-nanos BIGINT (legacy TIMESTAMP(NANOS) read)") {
    val df = oneRow(LongType, ms * 1000000L + 456789L)
    val got = df.select(Tables.tsMillis(LongType).as("ts_ms")).head.getLong(0)
    assert(got === ms)
  }

  test("tsMillis: TIMESTAMP_NTZ micros (naive, UTC session)") {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      ms / 1000, ((ms % 1000) * 1000000L).toInt, java.time.ZoneOffset.UTC)
    val df = oneRow(TimestampNTZType, ldt)
    val got = df.select(Tables.tsMillis(TimestampNTZType).as("ts_ms")).head.getLong(0)
    assert(got === ms)
  }

  test("tsMillis: tz-adjusted TIMESTAMP micros") {
    val df = oneRow(TimestampType, java.time.Instant.ofEpochMilli(ms))
    val got = df.select(Tables.tsMillis(TimestampType).as("ts_ms")).head.getLong(0)
    assert(got === ms)
  }

  test("tsRange is inclusive-exclusive and type-correct for each encoding") {
    val inside = ms; val before = ms - 1000; val atEnd = ms + 1000
    def rows(dt: DataType, mk: Long => Any) = {
      val df = spark.createDataFrame(
        java.util.Arrays.asList(Row(mk(before)), Row(mk(inside)), Row(mk(atEnd))),
        StructType(Seq(StructField("ts", dt))))
      df.where(Tables.tsRange(dt, ms, ms + 1000)).count()
    }
    assert(rows(LongType, m => m * 1000000L) === 1L)
    assert(rows(TimestampNTZType, m => java.time.LocalDateTime.ofEpochSecond(
      m / 1000, ((m % 1000) * 1000000L).toInt, java.time.ZoneOffset.UTC)) === 1L)
    assert(rows(TimestampType, m => java.time.Instant.ofEpochMilli(m)) === 1L)
  }

  test("events loader yields BIGINT ts_ms in the 2024 window for the shipped testdata") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts_ms").dataType === LongType)
    val mm = ev.agg(
      org.apache.spark.sql.functions.min("ts_ms"),
      org.apache.spark.sql.functions.max("ts_ms")).head
    // 2024-01-01 .. 2024-12-31 — a unit slip (s/us/ns) lands far outside
    assert(mm.getLong(0) >= 1704067200000L && mm.getLong(1) < 1735689600000L,
      s"ts_ms out of 2024 window: $mm")
  }

  test("events loader keeps the physical ts column for pushdown-able predicates") {
    val ev = Tables.events(spark, sfDir)
    val dt = ev.schema("ts").dataType
    val n = ev.where(Tables.tsRange(dt, 1704067200000L, 1704672000000L)).count()
    val viaMs = ev.where(col("ts_ms") >= 1704067200000L && col("ts_ms") < 1704672000000L).count()
    assert(n === viaMs)
  }
}
