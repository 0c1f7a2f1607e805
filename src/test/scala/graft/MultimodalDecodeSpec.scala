package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MMRecord

/** A REAL media decode through the multimodal seam: encode 8×8 PNGs in
  * memory with known pixels, push them through the same
  * one-decoder-per-partition `mapPartitions` path the stub uses, and
  * assert the pixel-derived features — the proof that the stub's
  * pipeline shape (binary column in, typed feature row out, decoder
  * context per partition) accepts a real library decoder unchanged.
  */
class MultimodalDecodeSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic w×h PNG: pixel (x, y) is the grey level
    * `(x * 31 + y * 7) % 256` on all three channels. */
  private def png(w: Int, h: Int): (Array[Byte], Double) = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var sum = 0.0
    for (y <- 0 until h; x <- 0 until w) {
      val g = (x * 31 + y * 7) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
      sum += g
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val mean = BigDecimal(sum / (w.toLong * h))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (bos.toByteArray, mean)
  }

  test("javax.imageio decodes real PNGs through the per-partition seam") {
    val (p8, mean8) = png(8, 8)
    val (p16, mean16) = png(16, 4)
    // >1 partition so the per-partition decoder context path is real
    val records = spark.createDataset(Seq(
      MMRecord(1L, p8), MMRecord(2L, p16))).repartition(2)
    val out = Multimodal.decodeImages(records).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out.size == 2)
    assert(out(1L).width == 8 && out(1L).height == 8)
    assert(out(1L).mean_luma == mean8, s"got ${out(1L).mean_luma}, want $mean8")
    assert(out(2L).width == 16 && out(2L).height == 4)
    assert(out(2L).mean_luma == mean16, s"got ${out(2L).mean_luma}, want $mean16")
  }

  test("undecodable payloads degrade to a sentinel row, not a task failure") {
    val junk = Array[Byte](1, 2, 3, 4, 5)
    val (p8, _) = png(8, 8)
    val out = Multimodal.decodeImages(
      spark.createDataset(Seq(MMRecord(1L, junk), MMRecord(2L, p8))))
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).width == -1 && out(1L).mean_luma == -1.0)
    assert(out(2L).width == 8)
  }

  /** 2:1 box-filter downscale (each output pixel = the mean of its
    * 2×2 source block) re-encoded as PNG — a true thumbnail, the
    * real-pixel analog of mm_resize's byte decimation. */
  private def boxHalf(payload: Array[Byte]): Array[Byte] = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(payload))
    val (w, h) = (img.getWidth / 2, img.getHeight / 2)
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      var sum = 0
      for (dy <- 0 to 1; dx <- 0 to 1) {
        val rgb = img.getRGB(2 * x + dx, 2 * y + dy)
        sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      }
      val g = sum / 12
      out.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  test("real-PNG pHash is stable under a 2:1 box-filter resize; banding finds the pair") {
    // varied but smooth 32×32 image: block-averaged 8×8 grids of the
    // original and its true 2:1 thumbnail agree up to rounding, so
    // the dHash comparisons — and hence the fingerprint — survive
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val g = (128 + 100 * math.sin(x * 0.55) * math.cos(y * 0.35)).toInt.max(0).min(255)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val orig = bos.toByteArray
    val thumb = boxHalf(orig)
    val junk = Array[Byte](9, 9, 9)
    val out = Multimodal.imagePhash(spark.createDataset(Seq(
      MMRecord(1L, orig), MMRecord(2L, thumb), MMRecord(3L, junk))).repartition(2))
      .collect().map(f => f.doc_id -> f.phash).toMap
    assert(out(3L) == -1L, "junk must hit the sentinel")
    val hamming = java.lang.Long.bitCount(out(1L) ^ out(2L))
    assert(hamming <= 3, s"pHash not resize-stable: hamming $hamming")
    // and the pigeonhole banding that mmPhashDedup joins on must
    // put the pair in at least one common bucket
    val bandsOf = (fp: Long) => (0 until 4).map(b => (b, (fp >> (14 * b)) & 16383L)).toSet
    assert((bandsOf(out(1L)) & bandsOf(out(2L))).nonEmpty,
      "orig and thumbnail share no band — banding would miss the pair")
    assert((bandsOf(out(1L)) & bandsOf(out(3L))).isEmpty ||
      java.lang.Long.bitCount(out(1L) ^ out(3L)) > 3,
      "junk must not verify as a near-dup")
  }

  /** Same deterministic pixels, JPEG-encoded: a SECOND real codec
    * through the identical seam. JPEG is lossy, so dimensions must be
    * exact but the luma mean only codec-close. */
  private def jpeg(w: Int, h: Int): (Array[Byte], Double) = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var sum = 0.0
    for (y <- 0 until h; x <- 0 until w) {
      val g = (x * 31 + y * 7) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
      sum += g
    }
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "jpg", bos), "JVM has no JPEG writer")
    (bos.toByteArray, sum / (w.toLong * h))
  }

  test("JPEG decodes through the same seam: exact dims, codec-close luma, sentinel intact") {
    val (j16, jMean) = jpeg(16, 16)
    val (p8, pMean) = png(8, 8)
    val dirty = j16.take(j16.length / 2) // truncated JPEG: decoder throws mid-scan
    // one partition carries BOTH codecs plus a dirty payload — the
    // decoder context is format-agnostic and failure-isolated
    val out = Multimodal.decodeImages(spark.createDataset(Seq(
      MMRecord(1L, j16), MMRecord(2L, p8), MMRecord(3L, dirty))).repartition(1))
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).width == 16 && out(1L).height == 16)
    assert(math.abs(out(1L).mean_luma - jMean) < 3.0,
      s"JPEG luma ${out(1L).mean_luma} vs source $jMean drifted past codec loss")
    assert(out(2L).width == 8 && out(2L).mean_luma == pMean)
    assert(out(3L).width == -1 && out(3L).mean_luma == -1.0,
      "truncated JPEG must hit the sentinel, not fail the task")
  }

  test("round-trip: stub and real decoder share the pipeline signature") {
    // the same Dataset[MMRecord] feeds both decoders — the seam is the
    // type, not the implementation
    val (p8, _) = png(8, 8)
    val records = spark.createDataset(Seq(MMRecord(7L, p8)))
    val stub = Multimodal.decodeFeatures(records).collect()
    val real = Multimodal.decodeImages(records).collect()
    assert(stub.head.doc_id == real.head.doc_id)
    assert(stub.head.byte_len == p8.length.toLong)
  }
}
