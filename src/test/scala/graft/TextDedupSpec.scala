package graft

import graft.text.TextOps
import graft.dedup.Dedup
import graft.similarity.Embeddings
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("polyHash matches the reference fold (DuckDB cross-check value)") {
    // list_reduce(ascii folds of 'hello', *31 mod 1e9+7) == 99162322
    val h = Seq("hello").toDF("t").select(TextOps.polyHash("t", 31)).head().getLong(0)
    assert(h == 99162322L)
  }

  test("occurrences counts non-overlapping literal matches") {
    val n = Seq(" the cat the dog ").toDF("t")
      .select(TextOps.occurrences(col("t"), " the ")).head().getLong(0)
    assert(n == 2)
  }

  test("exact dedup groups identical texts") {
    val rows = Dedup.exactDedup(spark, sfDir).collect()
    // the seeded re-crawl union guarantees clusters at every SF
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_docs") >= 2))
    // keepers are base-corpus ids; re-crawl copies never win min()
    rows.foreach(r => assert(r.getAs[Long]("keeper_id") < (1L << 40)))
  }

  test("minhash signatures identical for identical token sets") {
    val df = Seq((1L, "b a c"), (2L, "c b a"), (3L, "x y z")).toDF("doc_id", "text")
    df.createOrReplaceTempView("mh_docs")
    val sigs = df
      .withColumn("toks", array_sort(array_distinct(split(col("text"), " "))))
      .withColumn("thashes", expr(
        "transform(toks, t -> aggregate(transform(sequence(1, length(t)), i -> CAST(ascii(substring(t, i, 1)) AS BIGINT)), CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007))"))
      .withColumn("sig", expr(
        "transform(sequence(0, 127), i -> array_min(transform(thashes, h -> ((2*i + 3) * h + 1000003 * i) % 1000000007)))"))
      .select("doc_id", "sig").collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("simhash of identical token sets has hamming 0; pairs found by banding") {
    val pairs = Dedup.simHash(spark, sfDir).collect()
    // dense synthetic corpus: exact-duplicate token sets exist
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getAs[Long]("hamming") <= 3))
  }

  test("LSH candidates contain every exact-jaccard pair (recall check)") {
    val lsh = Dedup.minHashLsh(spark, sfDir).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = {
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), array_sort(array_distinct(split(col("text"), " "))).as("toks"))
      val a = docs.select(col("doc_id").as("id_a"), col("toks").as("toks_a"))
      val b = docs.select(col("doc_id").as("id_b"), col("toks").as("toks_b"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))).cast("double"))
        .withColumn("j", graft.funcs.rN(col("inter") / (size(col("toks_a")) + size(col("toks_b")) - col("inter")), 6))
        .where(col("j") >= 0.95)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(lsh == exact, s"LSH=${lsh.size} exact=${exact.size}")
  }

  test("ann_lsh recall against brute force is nontrivial") {
    val exact = Embeddings.annTopK(spark, sfDir)
      .select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Embeddings.annLshTopK(spark, sfDir)
      .select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.1, s"recall $recall")
    // every approx result must share the probe's hyperplane bucket — sanity: non-empty
    assert(approx.nonEmpty)
  }

  test("ann_ivf recall against brute force is nontrivial") {
    val exact = Embeddings.annTopK(spark, sfDir)
      .select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Embeddings.annIvfTopK(spark, sfDir)
      .select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.1, s"recall $recall")
  }

  test("gpx parser extracts trkpt fields from crafted XML") {
    val xml = """<?xml version="1.0"?><gpx><trk><trkseg>
      |<trkpt lat="40.5" lon="-73.25"><ele>12.5</ele><time>2024-01-01T00:00:00.000Z</time></trkpt>
      |<trkpt lat="41.0" lon="-74.0"><time>2024-01-01T01:00:00.000Z</time></trkpt>
      |</trkseg></trk></gpx>""".stripMargin
    val rows = graft.sources.Gpx.parseTrkpts(Seq(xml).toDF("gpx"), "gpx")
      .orderBy("lat").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("lat") == 40.5)
    assert(rows(0).getAs[Double]("lon") == -73.25)
    assert(rows(0).getAs[Double]("ele") == 12.5)
    assert(rows(1).getAs[Any]("ele") == null)
    assert(rows(0).getAs[String]("time_str") == "2024-01-01T00:00:00.000Z")
  }

  test("multimodal decode stub matches SQL-expressible features") {
    val feats = graft.multimodal.Multimodal.mmFeatures(spark, sfDir).limit(5).collect()
    feats.foreach { r =>
      assert(r.getAs[Long]("byte_len") > 0)
      assert(r.getAs[String]("content_md5").length == 32)
      val mp = r.getAs[Double]("fake_mean_pixel")
      assert(mp >= 0.0 && mp <= 1.0)
    }
  }
}
