package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions entry point must give a fresh session the
  * graft-native functions without any runtime register() call. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects graft_polyhash into a new session") {
    val shared = spark // force shared session init first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val got = s2.sql("SELECT graft_polyhash('abc', 31) AS h").head().getLong(0)
      val want = "abc".getBytes.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
      assert(got == want)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
