package graft

/** Pins the physical schema of every driver-generated table. The
  * generator re-encoded `events.ts` between rounds (nanos → micros,
  * §5a #26) and the drift surfaced only in end-of-round artifacts; this
  * sentinel makes ANY regeneration drift — a re-typed column, a
  * renamed/added/dropped field — a precise `sbt test` failure naming
  * the table and the exact delta, hours before the driver runs.
  *
  * If this fails after a legitimate regeneration: first check every
  * consumer of the changed column (the time seam lives in
  * Tables.tsMillis/tsRange), then update the pin.
  */
class SchemaSentinelSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp_ntz",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  for ((name, want) <- expected.toSeq.sortBy(_._1))
    test(s"$name schema matches the pinned generator layout") {
      val got = Tables.table(spark, sfDir, name).schema
        .map(f => f.name -> f.dataType.simpleString)
      assert(got == want,
        s"\n  table $name drifted:\n  expected: $want\n  actual:   $got" +
          "\n  (audit every consumer of the changed column before re-pinning)")
    }
}
