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

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.documents(spark, dir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), array_sort(array_distinct(split(col("text"), " "))).as("toks"))
      .withColumn("thashes", expr(
        "transform(toks, t -> aggregate(transform(sequence(1, length(t)), i -> CAST(ascii(substring(t, i, 1)) AS BIGINT)), CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007))"))
      .withColumn("bands", expr(
        """transform(array(transform(sequence(0, 127), i -> array_min(transform(thashes, h -> ((2*i + 3) * h + 1000003 * i) % 1000000007)))),
          |  sig -> transform(sequence(0, 15), j -> struct(j AS band_idx,
          |    hash(sig[8*j], sig[8*j+1], sig[8*j+2], sig[8*j+3], sig[8*j+4], sig[8*j+5], sig[8*j+6], sig[8*j+7]) AS band_key)))[0]""".stripMargin))

    t("sig+bands compute")(docs.select(col("doc_id"), col("bands")).count())
    val banded = docs
      .select(col("doc_id"), explode(col("bands")).as("band"))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_key"))
    banded.cache()
    t("banded count")(println(banded.count()))
    val joined = banded.toDF("id_a", "band_idx", "band_key")
      .join(banded.toDF("id_b", "band_idx", "band_key"), Seq("band_idx", "band_key"))
      .where(col("id_a") < col("id_b"))
    t("join output count")(println(joined.count()))
    val candidates = joined.select("id_a", "id_b").distinct()
    candidates.cache()
    t("candidates distinct count")(println(candidates.count()))
    val toksById = Tables.documents(spark, dir)
      .select(col("doc_id"), array_sort(array_distinct(split(col("text"), " "))).as("toks"))
    val verified = candidates
      .join(broadcast(toksById.toDF("id_a", "toks_a")), "id_a")
      .join(broadcast(toksById.toDF("id_b", "toks_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))).cast("double"))
      .withColumn("jaccard", round(col("inter") / (size(col("toks_a")) + size(col("toks_b")) - col("inter")), 6))
      .where(col("jaccard") >= 0.95)
    t("verify count")(println(verified.count()))
    spark.stop()
  }
}
