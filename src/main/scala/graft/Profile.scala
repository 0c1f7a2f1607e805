package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for operator stages (not part of the contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.PolyHash.register(spark)

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // --- minhash stages
    val tokenHashes = Tables.documents(spark, dir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), array_sort(array_distinct(split(col("text"), " "))).as("toks"))
      .withColumn("thashes", expr("transform(toks, t -> graft_polyhash(t, 31))"))
      .select(col("doc_id"), explode(col("thashes")).as("h"))
    t("token hashes")(tokenHashes.count())
    val permCols = (0 until 128).map { i =>
      min(pmod(lit(2L * i + 3) * col("h") + lit(1000003L * i), lit(1000000007L))).as(s"s$i")
    }
    val sigs = tokenHashes.groupBy("doc_id").agg(permCols.head, permCols.tail: _*)
      .withColumn("sigarr", array((0 until 128).map(i => col(s"s$i")): _*))
      .select("doc_id", "sigarr")
    t("signatures (128 min-aggs)")(sigs.count())
    val groups = sigs.groupBy("sigarr")
      .agg(min("doc_id").as("gid"), collect_list("doc_id").as("members"))
      .cache()
    t("signature groups")(println("groups=" + groups.count()))
    t("full minHashLsh")(println("pairs=" + graft.dedup.Dedup.minHashLsh(spark, dir).count()))

    // --- components stages
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 50).cast("long").as("size_bucket"),
        array_sort(array_distinct(split(col("text"), " "))).as("toks"))
    val g2 = docs.groupBy("lang", "size_bucket", "toks")
      .agg(min("doc_id").as("rep"), collect_list("doc_id").as("members"))
      .localCheckpoint()
    t("cc: quotient groups")(println("reps=" + g2.count()))
    val a = g2.select(col("lang"), col("size_bucket"), col("rep").as("src"), col("toks").as("toks_a"))
    val b = g2.select(col("lang"), col("size_bucket"), col("rep").as("dst"), col("toks").as("toks_b"))
    val repEdges = a.join(b, Seq("lang", "size_bucket"))
      .where(col("src") < col("dst"))
      .where(expr("element_at(transform(array(size(array_intersect(toks_a, toks_b))), i -> round(CAST(i AS DOUBLE) / (size(toks_a) + size(toks_b) - i), 6)), 1)") >= 0.8)
      .select("src", "dst")
    t("cc: rep edges")(println("edges=" + repEdges.count()))
    t("cc: full")(println("components=" + graft.dedup.Components.nearDupComponents(spark, dir).count()))

    spark.stop()
  }
}
