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
    graft.functions.JaccardSim.register(spark)

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // --- minhash stages
    val tokenHashes = Tables.documents(spark, dir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), graft.dedup.Dedup.tokens.as("toks"))
      .withColumn("thashes", expr("transform(toks, t -> graft_polyhash(t, 31))"))
      .select(col("doc_id"), explode(col("thashes")).as("h"))
    t("token hashes")(tokenHashes.count())
    val permCols = (0 until 128).map { i =>
      min(pmod(lit(2L * i + 3) * col("h") + lit(1000003L * i), lit(1000000007L))).as(s"s$i")
    }
    val sigs = tokenHashes.groupBy("doc_id").agg(permCols.head, permCols.tail: _*)
      .withColumn("sigarr", array((0 until 128).map(i => col(s"s$i")): _*))
      .select("doc_id", "sigarr")
    t("signatures")(sigs.count())
    val groups = sigs.groupBy("sigarr")
      .agg(min("doc_id").as("gid"), collect_list("doc_id").as("members"))
      .cache()
    t("groups")(println("n=" + groups.count()))
    val within = groups
      .select(col("members"), explode(col("members")).as("id_x"))
      .select(col("id_x"), explode(col("members")).as("id_y"))
      .where(col("id_x") < col("id_y"))
      .select(col("id_x").as("id_a"), col("id_y").as("id_b"))
    t("within pairs")(println("n=" + within.count()))
    val bandStructs = (0 until 16).map { j =>
      struct(lit(j).as("band_idx"),
        hash((0 until 8).map(k => col("sigarr")(8 * j + k)): _*).as("band_key"))
    }
    val repBands = groups
      .select(col("gid"), explode(array(bandStructs: _*)).as("band"))
      .select(col("gid"), col("band.band_idx"), col("band.band_key"))
    val groupPairs = repBands.toDF("gid_a", "band_idx", "band_key")
      .join(repBands.toDF("gid_b", "band_idx", "band_key"), Seq("band_idx", "band_key"))
      .where(col("gid_a") < col("gid_b"))
      .select("gid_a", "gid_b")
      .distinct()
    t("group pairs")(println("n=" + groupPairs.count()))
    val membersOf = groups.select(col("gid"), col("members"))
    val cross = groupPairs
      .join(broadcast(membersOf.toDF("gid_a", "mem_a")), "gid_a")
      .join(broadcast(membersOf.toDF("gid_b", "mem_b")), "gid_b")
      .select(explode(col("mem_a")).as("id_x"), col("mem_b"))
      .select(col("id_x"), explode(col("mem_b")).as("id_y"))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
    val candidates = within.unionAll(cross)
    t("candidates")(println("n=" + candidates.count()))
    val toksById = Tables.documents(spark, dir).select(col("doc_id"), graft.dedup.Dedup.tokens.as("toks"))
    val out = candidates
      .join(broadcast(toksById.withColumnRenamed("doc_id", "id_a").withColumnRenamed("toks", "toks_a")), "id_a")
      .join(broadcast(toksById.withColumnRenamed("doc_id", "id_b").withColumnRenamed("toks", "toks_b")), "id_b")
      .where(least(size(col("toks_a")), size(col("toks_b"))).cast("double") >=
        lit(0.9499) * greatest(size(col("toks_a")), size(col("toks_b"))))
      .withColumn("jaccard", graft.dedup.Dedup.jaccard(col("toks_a"), col("toks_b")))
      .where(col("jaccard") >= 0.95)
      .select("id_a", "id_b", "jaccard")
    t("verify")(println("n=" + out.count()))
    t("full op")(graft.dedup.Dedup.minHashLsh(spark, dir).count())
    t("full op again")(graft.dedup.Dedup.minHashLsh(spark, dir).count())
    spark.stop()
  }
}
