package graft

import org.apache.spark.sql.functions._

/** Server-local timezone round-trip (HistoryAPI.ts parseDateTime /
  * utcToLocalTimestamp): bare request timestamps parse as configured-
  * zone local time, explicit-offset timestamps parse as-is, and
  * response timestamps render with the zone's offset — including
  * across a DST boundary, where the offset the string carries must
  * change with the wall clock.
  */
class LocaltimeSpec extends SparkSpec {
  import graft.api.History

  private val NY = "America/New_York"

  test("bare timestamps parse as configured-zone local time") {
    // 2024-01-05T00:00 EST (−05:00) = 05:00Z
    assert(History.parseDateTimeMs("2024-01-05T00:00", NY) == 1704430800000L)
    // normalization: HH:MM gains :00 seconds — same instant
    assert(History.parseDateTimeMs("2024-01-05T00:00:00", NY) == 1704430800000L)
    // July is EDT (−04:00): the SAME wall time is an hour earlier in UTC
    assert(History.parseDateTimeMs("2024-07-05T00:00", NY) ==
      History.parseDateTimeMs("2024-07-05T04:00", "UTC"))
  }

  test("explicit zone info wins over the configured zone") {
    assert(History.hasTimezoneInfo("2024-01-05T00:00:00Z"))
    assert(History.hasTimezoneInfo("2024-01-05T00:00:00+02:00"))
    assert(History.hasTimezoneInfo("2024-01-05T00:00:00-0500"))
    assert(!History.hasTimezoneInfo("2024-01-05T00:00:00"))
    assert(History.parseDateTimeMs("2024-01-05T05:00:00Z", NY) == 1704430800000L)
    assert(History.parseDateTimeMs("2024-01-05T00:00:00-05:00", NY) == 1704430800000L)
  }

  test("DST boundaries: gap resolves forward, overlap takes the earlier offset") {
    // spring-forward 2024-03-10: 02:30 EST does not exist → 03:30 EDT
    assert(History.parseDateTimeMs("2024-03-10T02:30", NY) ==
      History.parseDateTimeMs("2024-03-10T03:30:00-04:00", NY))
    // fall-back 2024-11-03: 01:30 occurs twice → EARLIER offset (EDT)
    assert(History.parseDateTimeMs("2024-11-03T01:30", NY) ==
      History.parseDateTimeMs("2024-11-03T01:30:00-04:00", NY))
  }

  test("rendered offset flips across the DST boundary") {
    import spark.implicits._
    // one bucket either side of the 2024-03-10 07:00Z spring-forward
    val df = Seq(1710050400000L, 1710057600000L).toDF("ts_ms")
      .select(History.localTimestamp(col("ts_ms"), NY).as("local"))
      .collect().map(_.getString(0)).toSeq
    assert(df == Seq("2024-03-10T01:00:00-05:00", "2024-03-10T04:00:00-04:00"))
  }

  test("units map: registry hit and Not-available placeholder") {
    import spark.implicits._
    val registry = Seq(("a.b", "m/s")).toDF("path", "units")
    val specs = Seq(History.PathSpec.parse("a.b:max"), History.PathSpec.parse("c.d"))
    val out = History.unitsFor(registry, specs).orderBy("path").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
      Seq(("a.b", "max", "m/s"), ("c.d", "average", "Not available")))
  }
}
