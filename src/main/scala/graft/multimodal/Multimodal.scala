package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed feature
  * extraction through a batched decoder.
  *
  * The real decode (image/audio libs) is STUBBED — [[DecodeStub]]
  * computes deterministic fake features — but the Spark plumbing is
  * real: a binary column, a typed `Dataset` batch pipeline
  * (mapPartitions = one decoder instance per partition, the same shape
  * a JNI/FFmpeg decoder needs), and a schema contract checked against
  * a SQL oracle.
  */
object Multimodal {

  case class MMRecord(doc_id: Long, payload: Array[Byte])
  case class MMFeature(doc_id: Long, byte_len: Long, content_md5: String,
      fake_mean_pixel: Double, n_frames: Long)

  /** Stand-in for a media decoder: deterministic features from bytes.
    * Replace `decode` with the real library call; the pipeline shape
    * (per-partition batching, typed output) stays. */
  object DecodeStub {
    def decode(payload: Array[Byte]): (Long, String, Double, Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(payload).map("%02x".format(_)).mkString
      // Polynomial hash over bytes — matches TextOps.polyHash on ASCII.
      var h = 0L
      payload.foreach { b => h = (h * 31 + (b & 0xffL)) % 1000000007L }
      val meanPixel = BigDecimal(h % 256L / 255.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (payload.length.toLong, hex, meanPixel, payload.length / 100 + 1)
    }
  }

  /** Batched typed decode: one decoder per partition, records streamed
    * through it. */
  def decodeFeatures(records: Dataset[MMRecord]): Dataset[MMFeature] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition decoder setup would go here (codec init, JNI…)
      it.map { r =>
        val (len, md5hex, mean, frames) = DecodeStub.decode(r.payload)
        MMFeature(r.doc_id, len, md5hex, mean, frames)
      }
    }
  }

  // --------------------------------------------------------------- #40
  /** documents.text → binary payload → batched decode → typed feature
    * frame. Oracle recomputes the same features relationally. */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val records = Tables.documents(spark, dir)
      .repartition(col("doc_id")) // decode batches on every core
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MMRecord]
    decodeFeatures(records).toDF()
      .orderBy("doc_id")
  }

  val mmFeaturesOracle: String =
    """SELECT doc_id,
      |  octet_length(encode(text))::BIGINT AS byte_len,
      |  md5(text) AS content_md5,
      |  ROUND((list_reduce(list_transform(string_split(text, ''), ch -> ascii(ch)::BIGINT),
      |    (a, b) -> (a * 31 + b) % 1000000007) % 256) / 255.0, 6) AS fake_mean_pixel,
      |  (octet_length(encode(text)) // 100 + 1)::BIGINT AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> (mmFeatures _))

  val oracles: Map[String, String] = Map(
    "mm_features" -> mmFeaturesOracle)
}
