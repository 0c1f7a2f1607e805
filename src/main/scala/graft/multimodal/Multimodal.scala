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

  case class ImageFeature(doc_id: Long, width: Int, height: Int,
      mean_luma: Double)

  /** REAL image decode through the exact same seam as
    * [[decodeFeatures]] — `javax.imageio` (pure JVM, no extra deps)
    * replaces the stub inside the one-decoder-per-partition
    * `mapPartitions` without the pipeline shape changing at all: the
    * decoder instance (here the ImageIO reader context) is established
    * per partition, records stream through it, typed features come
    * out. This is the drop-in point a libjpeg/FFmpeg JNI decoder uses;
    * MultimodalDecodeSpec drives a real PNG through it and asserts
    * pixel-derived features. Payloads that are not decodable images
    * yield a null-feature row (width -1) rather than poisoning the
    * task — the per-record guard a 100 TB dirty corpus needs. */
  def decodeImages(records: Dataset[MMRecord]): Dataset[ImageFeature] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition decoder context: ImageIO scanners are cached
      // statically by the JVM; a JNI decoder would init here
      it.map { r =>
        // NonFatal, not just IOException: imageio decoders throw
        // RuntimeExceptions on malformed payloads too (CMMException
        // for broken ICC profiles, IndexOutOfBounds in the JPEG
        // reader) — all must degrade to the sentinel row, not kill
        // the task.
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) ImageFeature(r.doc_id, -1, -1, -1.0)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
              x += 1
            }
            y += 1
          }
          val mean = BigDecimal(sum / (w.toLong * h))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          ImageFeature(r.doc_id, w, h, mean)
        }
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

  // -------------------------------------------------------------- #40p
  /** Frame sampling plumbing: each payload is cut into fixed 100-byte
    * "frames" and every 2nd frame is sampled — the explode/slice shape
    * a video pipeline uses (keyframe stride), with the decode itself
    * still stubbed to a hash. One row per sampled frame, no shuffle:
    * the explode and slicing are per-row projections, so a 100 TB
    * corpus fans out in place and downstream per-frame featurizers
    * parallelize on the exploded rows. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_frames", (length(col("text")) / 100).cast("long") + 1)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(2L))).as("frame_idx"))
      .withColumn("frame",
        expr("substring(text, CAST(frame_idx * 100 + 1 AS INT), 100)"))
      .select(col("doc_id"), col("frame_idx"),
        md5(col("frame").cast("binary")).as("frame_md5"),
        length(col("frame")).cast("long").as("frame_len"))
      .orderBy("doc_id", "frame_idx")

  val frameSampleOracle: String =
    """SELECT d.doc_id, f.frame_idx,
      |  md5(substring(d.text, CAST(f.frame_idx * 100 + 1 AS INT), 100)) AS frame_md5,
      |  CAST(LENGTH(substring(d.text, CAST(f.frame_idx * 100 + 1 AS INT), 100)) AS BIGINT) AS frame_len
      |FROM documents d,
      |  LATERAL (SELECT unnest(generate_series(0, LENGTH(d.text) // 100, 2)) AS frame_idx) f
      |ORDER BY d.doc_id, f.frame_idx""".stripMargin

  // -------------------------------------------------------------- #40q
  case class MMResized(doc_id: Long, orig_len: Long, resized_len: Long,
      resized_md5: String)

  /** Resize plumbing: payload in, smaller payload out, through the
    * same one-resizer-per-partition typed batch shape as
    * [[decodeFeatures]]. The resize itself is STUBBED as a
    * deterministic 2:1 byte decimation (a real libvips/swscale call
    * drops in without touching the pipeline); output carries the
    * resized payload's length and digest so the oracle can check the
    * transform byte-for-byte. */
  def resizePayloads(records: Dataset[MMRecord]): Dataset[MMResized] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        // stub resize: keep every 2nd byte (offsets 0, 2, 4, …)
        val resized = Array.tabulate((r.payload.length + 1) / 2)(i => r.payload(2 * i))
        md.reset()
        val hex = md.digest(resized).map("%02x".format(_)).mkString
        MMResized(r.doc_id, r.payload.length.toLong, resized.length.toLong, hex)
      }
    }
  }

  def mmResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val records = Tables.documents(spark, dir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MMRecord]
    resizePayloads(records).toDF().orderBy("doc_id")
  }

  val mmResizeOracle: String =
    """SELECT doc_id,
      |  CAST(LENGTH(text) AS BIGINT) AS orig_len,
      |  CAST((LENGTH(text) + 1) // 2 AS BIGINT) AS resized_len,
      |  md5(array_to_string(
      |    list_transform(range(1, LENGTH(text) + 2, 2), i -> substring(text, CAST(i AS INT), 1)),
      |    '')) AS resized_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- #40u
  /** Audio-window plumbing: each payload is cut into OVERLAPPING
    * fixed-size segments (window 200 bytes, hop 100 — the 50%-overlap
    * spectrogram-window shape; frame_sample's frames are disjoint),
    * with a stubbed per-segment energy feature (polynomial hash
    * standing in for RMS; a real PCM decode drops into the same
    * projection). Explode + substring are per-row projections inside
    * whole-stage codegen — no shuffle, a 100 TB corpus fans out in
    * place exactly like [[frameSample]]. */
  def audioSegments(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.PolyHash.register(spark)
    Tables.documents(spark, dir)
      // empty payload guard: sequence(0, -100, 100) THROWS in Spark
      // (start > stop with positive step) where DuckDB's
      // generate_series returns empty — filter the degenerate row out
      // in both engines instead of diverging on it
      .where(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L),
          floor((length(col("text")) - 1) / 100).cast("long") * 100, lit(100L)))
          .as("seg_start"))
      .withColumn("segment",
        expr("substring(text, CAST(seg_start + 1 AS INT), 200)"))
      .select(col("doc_id"), col("seg_start"),
        length(col("segment")).cast("long").as("seg_len"),
        md5(col("segment").cast("binary")).as("seg_md5"),
        // codegen'd byte loop (graft.functions.PolyHash), not an
        // interpreted aggregate() lambda — §5a hot-path rule
        graft.funcs.r6(expr("graft_polyhash(segment, 31)").mod(lit(1000L)) / lit(1000.0))
          .as("fake_rms"))
      .orderBy("doc_id", "seg_start")
  }

  val audioSegmentsOracle: String =
    """SELECT d.doc_id, s.seg_start,
      |  CAST(LENGTH(substring(d.text, CAST(s.seg_start + 1 AS INT), 200)) AS BIGINT) AS seg_len,
      |  md5(substring(d.text, CAST(s.seg_start + 1 AS INT), 200)) AS seg_md5,
      |  ROUND((list_reduce(list_transform(
      |      string_split(substring(d.text, CAST(s.seg_start + 1 AS INT), 200), ''),
      |      ch -> ascii(ch)::BIGINT), (a, b) -> (a * 31 + b) % 1000000007)
      |    % 1000) / 1000.0, 6) AS fake_rms
      |FROM documents d,
      |  LATERAL (SELECT unnest(generate_series(0, ((LENGTH(d.text) - 1) // 100) * 100, 100))
      |    AS seg_start) s
      |WHERE LENGTH(d.text) > 0
      |ORDER BY d.doc_id, s.seg_start""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> (mmFeatures _),
    "mm_resize" -> (mmResize _),
    "mm_frame_sample" -> (frameSample _),
    "mm_audio_segments" -> (audioSegments _))

  val oracles: Map[String, String] = Map(
    "mm_features" -> mmFeaturesOracle,
    "mm_resize" -> mmResizeOracle,
    "mm_frame_sample" -> frameSampleOracle,
    "mm_audio_segments" -> audioSegmentsOracle)
}
