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
