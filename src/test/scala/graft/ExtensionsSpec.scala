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
      // graft_dense is arity-checked: a zero-arg call must raise a real
      // arity error, not a bare NoSuchElementException from exprs.head
      val e = intercept[Exception] { s2.sql("SELECT graft_dense()").collect() }
      assert(e.getMessage.contains("1 argument") || e.getMessage.contains("graft_dense"),
        s"unexpected error: ${e.getMessage}")
      assert(s2.sql("SELECT graft_dense(array(double(1.0), double(2.0))) AS v").head()
        .getSeq[Double](0).toList == List(1.0, 2.0))
      // round-12 injections: merge-walk overlap + bounded top-k agg
      assert(s2.sql("SELECT graft_overlap(array('a','b','c'), array('b','c','d')) AS o")
        .head().getLong(0) == 2L)
      val top = s2.sql(
        """SELECT graft_topk(s, i, 2) AS t FROM VALUES
          |  (1.0D, 1L), (3.0D, 2L), (2.0D, 3L) AS v(s, i)""".stripMargin)
        .head().getSeq[org.apache.spark.sql.Row](0)
      assert(top.map(r => (r.getDouble(0), r.getLong(1))) == Seq((3.0, 2L), (2.0, 3L)))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
