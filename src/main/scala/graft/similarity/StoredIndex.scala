package graft.similarity

import graft.funcs.r6
import graft.sources.Staging
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED form of the IVFADC index — the steady-state read path
  * a production vector store actually serves from. [[Embeddings]]'
  * `ann_ivfpq_topk` proves the arithmetic but rebuilds the index
  * (coarse cells, PQ codebook, codes) from the raw corpus on every
  * query; at 100 TB that rebuild IS the corpus scan the index exists
  * to avoid. Here the index is staged to parquet once at "ingest" —
  * four tables: `centroids` (16 rows), `codebook` (128 rows), `lists`
  * (one (neighbor_id, bucket) row per vector), `codes` (8 rows per
  * vector, 4-bit codes) — and the query plan touches the RAW CORPUS
  * FLOATS ONLY FOR THE PROBE ROWS (`vec_id < 5`, pushed to the
  * embeddings scan; StoredIndexSpec pins that every embeddings
  * FileScan carries that pushed filter). At warehouse scale `codes`/
  * `lists` are partitioned by bucket so the nprobe cell pruning is
  * partition pruning, and the whole search reads O(corpus/K · nprobe)
  * code bytes + a few KB of broadcast index metadata.
  *
  * Staging = [[Staging.stagedDir]] (fingerprint-idempotent across
  * JVMs); results are bit-identical to the inline rebuild because the
  * staged tables are deterministic functions of the corpus (rounded
  * distances, min_by ties to the lower id — the exact columns
  * [[Embeddings.ivfAssign]]/pqCodes compute) and parquet stores
  * BIGINT/DOUBLE losslessly. Oracle: the same full-recompute SQL as
  * `ann_ivfpq_topk` — the store must be result-invisible.
  *
  * Reference: signalk-parquet has no vector index; this is the
  * training-pipeline extension at its production composition (FAISS
  * IVFADC, Jégou et al. 2011, persisted like a warehouse table).
  */
object StoredIndex {

  // ------------------------------------------------------------- #40ac
  /** Stage the four index tables once per (fingerprint, sf dir). */
  private[graft] def stageIvfPq(spark: SparkSession, dir: String): String =
    Staging.stagedDir("graft_ivfpq_store", dir, "v1:ivf16:pq8x16", "embeddings") { root =>
      graft.functions.L2Distance.register(spark)
      val e = Embeddings.vecs(spark, dir)
      val centroids = e.where(col("vec_id") >= 100 && col("vec_id") < 116)
        .select(col("vec_id").as("cent_id"), col("v").as("v_c"))
      centroids.write.parquet(s"$root/centroids")
      val subs = Embeddings.pqSubs(spark, dir)
      val codebook = Embeddings.pqCodebook(subs)
      codebook.write.parquet(s"$root/codebook")
      Embeddings.pqCodes(subs, codebook).write.parquet(s"$root/codes")
      // ingest-side full-corpus cell assignment: the map-side min_by
      // collapse (keep = 1), paid once here, never at query time
      Embeddings.ivfAssign(e, centroids, 1)
        .select(col("vec_id").as("neighbor_id"), col("cent_id").as("bucket"))
        .write.parquet(s"$root/lists")
    }

  /** IVFADC top-5 from the STAGED index: same output contract as
    * `ann_ivfpq_topk` (probe_id, neighbor_id, adist2, rank). */
  def annIvfPqStored(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.L2Distance.register(spark)
    graft.functions.KnownNonNullElements.register(spark)
    val root = stageIvfPq(spark, dir)
    // graft_dense on every parquet-loaded vector column: the file
    // source forces containsNull=true, which would put a per-element
    // null branch inside the graft_l2sq loops (see Embeddings.vecs)
    val centroids = spark.read.parquet(s"$root/centroids")
      .select(col("cent_id"), expr("graft_dense(v_c)").as("v_c"))
    val codebook = spark.read.parquet(s"$root/codebook")
      .select(col("sub"), col("cent_id"), expr("graft_dense(cs)").as("cs"))
    val codes = spark.read.parquet(s"$root/codes")
    val lists = spark.read.parquet(s"$root/lists")
    // the ONLY raw-corpus touch: probe rows (vec_id < 5, pushed down)
    val probeVecs = Embeddings.vecs(spark, dir).where(col("vec_id") < 5)
    val probeCells = Embeddings.ivfAssign(probeVecs, centroids, 4)
      .select(col("vec_id").as("probe_id"), col("cent_id").as("bucket"))
    val probes = Embeddings.pqSubsOf(probeVecs)
      .select(col("vec_id").as("probe_id"), col("sub"), col("xs"))
    val cand = broadcast(probeCells).join(lists, Seq("bucket"))
      .where(col("probe_id") =!= col("neighbor_id"))
      .select("probe_id", "neighbor_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("adist2"), col("neighbor_id"))
    broadcast(cand).join(codes, Seq("neighbor_id"))
      .join(broadcast(codebook.withColumnRenamed("cent_id", "code")), Seq("sub", "code"))
      .join(broadcast(probes), Seq("sub", "probe_id"))
      .withColumn("part", r6(expr("graft_l2sq(xs, cs)"))
        .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
      .groupBy("probe_id", "neighbor_id")
      .agg(sum(col("part")).cast("double").as("adist2"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select("probe_id", "neighbor_id", "adist2", "rank")
      .orderBy("probe_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ivfpq_stored" -> (annIvfPqStored _))

  /** The store is result-invisible: the oracle is the full-recompute
    * IVFADC SQL, identical to ann_ivfpq_topk's. */
  val oracles: Map[String, String] = Map(
    "ann_ivfpq_stored" -> Embeddings.annIvfPqTopKOracle)
}
