package graft

/** Executes EVERY registered query end-to-end at sf0.001. ContractSpec
  * proves the registry is consistent; this proves each entry actually
  * RUNS against the shipped testdata — the round-10 lesson: a testdata
  * re-generation broke all 61 sk_* queries and every stream, and no
  * spec noticed because none drove the full per-query path on the real
  * files. With this spec, `sbt test` is the early-warning: any
  * environment/schema drift that would zero the driver's correctness
  * artifact fails here first, with the per-query error visible.
  *
  * Result VALUES are not asserted (that is the DuckDB oracle gate's
  * job); this pins "runs and returns rows" only, so it stays cheap at
  * the smallest SF.
  */
class SmokeAllQueriesSpec extends SparkSpec {

  test("every SparkEntry query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
    }
    assert(failures.isEmpty, failures.map { case (n, m) => s"\n  $n: $m" }.mkString)
  }
}
