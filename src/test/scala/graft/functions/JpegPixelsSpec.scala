package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JPEG pixel decode: fixtures are ImageIO-encoded (the JDK's own
  * JPEG writer), decoded through [[JpegDecode]]/[[JpegPixels]], and
  * pinned byte-for-byte against an INDEPENDENT `ImageIO.read` of the
  * same payload — within one JVM the bundled decoder is
  * deterministic, which is exactly the spec-gated (not oracle-gated)
  * contract the expression documents. */
class JpegPixelsSpec extends SparkSpec {

  private def encodeJpeg(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out), "JDK JPEG writer missing")
    out.toByteArray
  }

  private def rgbGradient(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 7 + y) % 256 << 16) | ((y * 13 + x) % 256 << 8) | ((x + y * 5) % 256))
    img
  }

  private def grayRamp(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 11 + y * 3) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("decode matches an independent ImageIO read byte for byte (RGB + gray)") {
    for (src <- Seq(rgbGradient(17, 9), grayRamp(8, 12))) {
      val bytes = encodeJpeg(src)
      val d = JpegDecode.decode(bytes)
      assert(d != null)
      val ref = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      assert((d.width, d.height, d.channels) ==
        ((ref.getWidth, ref.getHeight, ref.getRaster.getNumBands)))
      val refSamples = ref.getRaster.getPixels(
        0, 0, ref.getWidth, ref.getHeight,
        new Array[Int](ref.getWidth * ref.getHeight * ref.getRaster.getNumBands))
      assert(d.pixels.length == refSamples.length)
      for (i <- refSamples.indices)
        assert((d.pixels(i) & 0xFF) == refSamples(i), s"sample $i")
    }
  }

  test("decode is lossy-faithful: samples within JPEG quantization error of the source") {
    val w = 16; val h = 16
    val src = grayRamp(w, h)
    val d = JpegDecode.decode(encodeJpeg(src))
    assert(d != null && d.channels == 1)
    // default-quality JPEG of a smooth ramp stays close to the source
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w) {
      val want = src.getRaster.getSample(x, y, 0)
      val got = d.pixels(y * w + x) & 0xFF
      maxErr = math.max(maxErr, math.abs(want - got))
    }
    assert(maxErr <= 24, s"maxErr=$maxErr — decode drifted beyond quantization noise")
  }

  test("expression + SQL surface agree; stats expose dims and channel means") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val bytes = encodeJpeg(rgbGradient(6, 4))
    val df = Seq((1L, bytes)).toDF("id", "payload")
    df.createOrReplaceTempView("jpeg_px_fixture")
    val viaSql = spark.sql(
      "SELECT graft_jpeg_pixels(payload) AS px, graft_jpeg_stats(payload) AS st FROM jpeg_px_fixture")
      .head()
    val viaCol = df.select(
      GraftFunctions.jpegPixels(col("payload")).as("px"),
      GraftFunctions.jpegPixelStats(col("payload")).as("st")).head()
    val px = viaSql.getAs[Array[Byte]]("px")
    assert(px.sameElements(viaCol.getAs[Array[Byte]]("px")))
    val st = viaSql.getSeq[Double](1)
    assert(st == viaCol.getSeq[Double](1))
    assert(st(0) == 6.0 && st(1) == 4.0 && st(2) == 3.0)
    // means recomputed from the pixel buffer
    for (c <- 0 until 3) {
      val mean = px.indices.filter(_ % 3 == c).map(px(_) & 0xFF).sum.toDouble / (6 * 4)
      assert(st(3 + c) == mean)
    }
  }

  test("non-JPEG, corrupt, and bomb-shaped payloads yield NULL, never throw") {
    // a JPEG header declaring 20k x 20k x 3 (> 64 MiB) with no body
    val bomb = Array[Int](
      0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x0B, 0x08,
      0x4E, 0x20, 0x4E, 0x20, 0x03).map(_.toByte)
    val truncated = encodeJpeg(rgbGradient(8, 8)).take(40)
    assert(JpegDecode.decode(null) == null)
    assert(JpegDecode.decode(Array[Byte](1, 2, 3)) == null)
    assert(JpegDecode.decode("not an image".getBytes) == null)
    assert(JpegDecode.decode(bomb) == null)
    assert(JpegDecode.decode(truncated) == null)
  }

  test("Multimodal.imagePixels dispatches JPEG next to PNG in one layout") {
    import spark.implicits._
    val jpegBytes = encodeJpeg(grayRamp(5, 5))
    val pngBytes = graft.operators.Multimodal.encodePng(5, 5, 1, (x, y, _) => (x * 11 + y * 3) % 256)
    val df = Seq((1L, jpegBytes), (2L, pngBytes), (3L, "junk".getBytes))
      .toDF("id", "payload")
    val rows = df.select(col("id"),
      graft.operators.Multimodal.imagePixels(col("payload")).as("px"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Array[Byte]]("px"))).toMap
    assert(rows(1L).exists(_.length == 25))
    assert(rows(2L).exists(_.length == 25))
    assert(rows(3L).isEmpty)
    // the PNG path is exact: it must reproduce the ramp verbatim
    val png = rows(2L).get
    for (y <- 0 until 5; x <- 0 until 5)
      assert((png(y * 5 + x) & 0xFF) == (x * 11 + y * 3) % 256)
  }
}
