package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness (not part of the driver contract):
  * stage-level timings for whichever operator is being tuned. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.PolyHash.register(spark)
    graft.functions.JaccardSim.register(spark)

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // --- connected-components stages
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 50).cast("long").as("size_bucket"),
        graft.dedup.Dedup.tokens.as("toks"))
    val wG = org.apache.spark.sql.expressions.Window.partitionBy("gkey")
    val groups = docs
      .withColumn("gkey",
        struct(xxhash64(col("lang"), col("size_bucket"), col("toks")).as("h1"),
          hash(col("lang"), col("size_bucket"), col("toks")).as("h2")))
      .withColumn("rep", min("doc_id").over(wG))
      .withColumn("grp_n", count(lit(1)).over(wG))
      .localCheckpoint()
      .where(col("doc_id") === col("rep"))
      .select("lang", "size_bucket", "toks", "rep", "grp_n")
    t("cc groups")(println("n=" + groups.count()))
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val a = groups.select(col("lang"), col("size_bucket"),
      col("rep").as("src"), col("toks").as("toks_a"))
      .repartition(nPart, col("lang"), col("size_bucket"))
    val b = groups.select(col("lang"), col("size_bucket"),
      col("rep").as("dst"), col("toks").as("toks_b"))
      .repartition(nPart, col("lang"), col("size_bucket"))
    val repEdges = a.join(b, Seq("lang", "size_bucket"))
      .where(col("src") < col("dst"))
      .where(least(size(col("toks_a")), size(col("toks_b"))).cast("double") >=
        lit(0.7999) * greatest(size(col("toks_a")), size(col("toks_b"))))
      .where(graft.dedup.Dedup.jaccard(col("toks_a"), col("toks_b")) >= 0.8)
      .select("src", "dst")
    t("cc rep edges")(println("n=" + repEdges.count()))
    val edges2 = repEdges.localCheckpoint()
    t("cc components only")(println("n=" +
      graft.dedup.Components.connectedComponents(edges2).count()))

    // inline loop replication with per-round timing
    {
      val e = edges2.select(col("src"), col("dst"))
        .unionAll(edges2.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("src"))
        .localCheckpoint()
      var labels = e.groupBy(col("src").as("id"))
        .agg(min(col("dst")).as("nmin"))
        .select(col("id"), least(col("id"), col("nmin")).as("lbl"))
        .localCheckpoint(false)
      def checksum(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(coalesce(sum("lbl"), lit(0L))).head.getLong(0)
      var prev = t("  seed+checksum")(checksum(labels))
      var round = 0
      var converged = false
      while (!converged && round < 20) {
        val prop = e.join(labels, e("src") === labels("id"))
          .select(col("dst").as("id"), col("lbl"))
        labels = labels.unionByName(prop)
          .groupBy("id").agg(min("lbl").as("lbl"))
          .localCheckpoint(false)
        val cur = t(s"  round $round")(checksum(labels))
        converged = cur == prev
        prev = cur
        round += 1
      }
      println("[profile] rounds = " + round)
    }
    t("cc full op")(graft.dedup.Components.nearDupComponents(spark, dir).count())
    t("resolve full op")(graft.dedup.Components.resolveClusters(spark, dir).count())
    spark.stop()
  }
}
