package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PNG pixel decode: hand-built fixtures for each filter type plus
  * javax.imageio as an INDEPENDENT reference codec — ImageIO encodes
  * (with its own filter heuristics), [[PngDecode]] decodes, pixels
  * must match the BufferedImage source exactly. ImageIO stays
  * test-side only: the production path is the dependency-free
  * expression. */
class PngPixelsSpec extends SparkSpec {

  // ---- minimal PNG encoder (filter 0 rows, correct CRCs) ----
  private def chunk(cType: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def be32(v: Long): Unit =
      out.write(Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte))
    be32(data.length)
    val tb = cType.getBytes("US-ASCII")
    out.write(tb); out.write(data)
    val crc = new CRC32(); crc.update(tb); crc.update(data)
    be32(crc.getValue)
    out.toByteArray
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = d.deflate(buf); d.end()
    buf.take(n)
  }

  /** Encode `pixels` (row-major, channel-interleaved) with per-row
    * filter bytes from `filters` (cycled). */
  private def png(w: Int, h: Int, colorType: Int, channels: Int,
      pixels: Array[Byte], filters: Seq[Int] = Seq(0)): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdr = new ByteArrayOutputStream()
    def be32(v: Int): Unit = ihdr.write(Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte))
    be32(w); be32(h)
    ihdr.write(8); ihdr.write(colorType); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    val stride = w * channels
    val raw = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      val f = filters(y % filters.length)
      raw(y * (1 + stride)) = f.toByte
      // filter the row against the RECONSTRUCTED neighbors (spec §9)
      for (x <- 0 until stride) {
        val v = pixels(y * stride + x) & 0xFF
        val left = if (x >= channels) pixels(y * stride + x - channels) & 0xFF else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) & 0xFF else 0
        val ul = if (y > 0 && x >= channels) pixels((y - 1) * stride + x - channels) & 0xFF else 0
        val filtered = f match {
          case 0 => v
          case 1 => v - left
          case 2 => v - up
          case 3 => v - ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            v - pred
          case _ => v // bogus filter byte fixtures: raw value, invalid tag
        }
        raw(y * (1 + stride) + 1 + x) = (filtered & 0xFF).toByte
      }
    }
    val out = new ByteArrayOutputStream()
    out.write(sig)
    out.write(chunk("IHDR", ihdr.toByteArray))
    out.write(chunk("IDAT", deflate(raw)))
    out.write(chunk("IEND", Array.empty[Byte]))
    out.toByteArray
  }

  private def pix(vals: Int*): Array[Byte] = vals.map(_.toByte).toArray

  test("decode: filter-0 RGB round trip, exact bytes") {
    val pixels = pix(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val d = PngDecode.decode(png(2, 2, 2, 3, pixels))
    assert(d != null && d.width == 2 && d.height == 2 && d.channels == 3)
    assert(d.pixels.toSeq == pixels.toSeq)
  }

  test("decode: every filter type (sub/up/average/paeth) reconstructs exactly") {
    val rnd = new scala.util.Random(7)
    val (w, h, ch) = (9, 8, 4)
    val pixels = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
    for (filters <- Seq(Seq(1), Seq(2), Seq(3), Seq(4), Seq(0, 1, 2, 3, 4))) {
      val d = PngDecode.decode(png(w, h, 6, ch, pixels, filters))
      assert(d != null, s"filters=$filters")
      assert(d.pixels.toSeq == pixels.toSeq, s"filters=$filters")
    }
  }

  test("Adam7 interlaced decode == progressive decode for random shapes, channels, filters") {
    val rnd = new scala.util.Random(19)
    // shapes chosen to exercise EMPTY passes (w or h < 8 skips pass
    // scanlines entirely), single-pixel, and pass-boundary sizes
    for ((w, h) <- Seq((1, 1), (3, 2), (7, 5), (8, 8), (9, 8), (13, 11), (33, 17));
         ch <- Seq(1, 2, 3, 4)) {
      def p(x: Int, y: Int, c: Int): Int = (x * 31 + y * 17 + c * 7 + w + h) % 256
      val filters = Array.fill(math.max(w, h))(rnd.nextInt(5))
      val plain = graft.operators.Multimodal.encodePng(w, h, ch, p, y => filters(y))
      val adam7 = graft.operators.Multimodal.encodePng(w, h, ch, p, y => filters(y),
        interlaced = true)
      val dp = PngDecode.decode(plain)
      val di = PngDecode.decode(adam7)
      assert(dp != null && di != null, s"${w}x$h ch=$ch")
      assert(di.width == w && di.height == h && di.channels == ch)
      assert(di.pixels.toSeq == dp.pixels.toSeq,
        s"interlaced pixels must equal progressive for ${w}x$h ch=$ch")
    }
    // and against the independent JDK codec: ImageIO reads our
    // interlaced output to the same pixels
    val avi7 = graft.operators.Multimodal.encodePng(23, 17, 3,
      (x, y, c) => (x * 13 + y * 29 + c * 37) % 256, interlaced = true)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(avi7))
    assert(ref != null, "ImageIO must accept the Adam7 wire output")
    val d = PngDecode.decode(avi7)
    for (y <- 0 until 17; x <- 0 until 23) {
      val argb = ref.getRGB(x, y)
      val base = (y * 23 + x) * 3
      assert((d.pixels(base) & 0xFF) == ((argb >> 16) & 0xFF) &&
        (d.pixels(base + 1) & 0xFF) == ((argb >> 8) & 0xFF) &&
        (d.pixels(base + 2) & 0xFF) == (argb & 0xFF), s"($x,$y)")
    }
  }

  test("palette PNGs expand through PLTE (+tRNS alpha), interlaced too, guards hold") {
    val pal = (0 until 11).map(i => (i * 23 % 256, i * 57 % 256, i * 91 % 256))
    def idx(x: Int, y: Int): Int = (x * 3 + y * 7) % 11
    // opaque palette → RGB
    val plain = graft.operators.Multimodal.encodePngPalette(13, 9, pal, idx)
    val d = PngDecode.decode(plain)
    assert(d != null && d.channels == 3 && d.width == 13 && d.height == 9)
    for (y <- 0 until 9; x <- 0 until 13) {
      val (r, g, b) = pal(idx(x, y))
      val base = (y * 13 + x) * 3
      assert((d.pixels(base) & 0xFF) == r && (d.pixels(base + 1) & 0xFF) == g &&
        (d.pixels(base + 2) & 0xFF) == b, s"($x,$y)")
    }
    // tRNS SHORTER than the palette: listed entries carry alpha,
    // trailing entries opaque (spec default) → RGBA
    val alpha = Seq(10, 255, 0, 128)
    val dt = PngDecode.decode(
      graft.operators.Multimodal.encodePngPalette(13, 9, pal, idx, alpha))
    assert(dt != null && dt.channels == 4)
    for (y <- 0 until 9; x <- 0 until 13) {
      val i = idx(x, y)
      val expA = if (i < alpha.size) alpha(i) else 255
      assert((dt.pixels((y * 13 + x) * 4 + 3) & 0xFF) == expA, s"($x,$y)")
    }
    // Adam7 palette: identical expansion
    val di = PngDecode.decode(
      graft.operators.Multimodal.encodePngPalette(13, 9, pal, idx, alpha,
        interlaced = true))
    assert(di != null && di.pixels.toSeq == dt.pixels.toSeq,
      "interlaced palette must expand to the same RGBA")
    // ImageIO reads our palette wire output to the same RGB
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(plain))
    assert(ref != null)
    for (y <- 0 until 9; x <- 0 until 13) {
      val argb = ref.getRGB(x, y)
      val base = (y * 13 + x) * 3
      assert((d.pixels(base) & 0xFF) == ((argb >> 16) & 0xFF) &&
        (d.pixels(base + 1) & 0xFF) == ((argb >> 8) & 0xFF) &&
        (d.pixels(base + 2) & 0xFF) == (argb & 0xFF), s"imageio ($x,$y)")
    }
    // guard: a palette image with NO readable PLTE refuses (tag
    // corrupted → the walk never records a palette)
    val plteAt = plain.indexOfSlice("PLTE".getBytes)
    val noPlte = plain.clone()
    for ((c, k) <- "zzzz".getBytes.zipWithIndex) noPlte(plteAt + k) = c
    assert(PngDecode.decode(noPlte) == null, "missing PLTE must refuse")
  }

  test("decode matches javax.imageio as an independent reference codec") {
    val rnd = new scala.util.Random(42)
    for ((imgType, channels) <- Seq(
        BufferedImage.TYPE_3BYTE_BGR -> 3,
        BufferedImage.TYPE_4BYTE_ABGR -> 4,
        BufferedImage.TYPE_BYTE_GRAY -> 1)) {
      val (w, h) = (23, 17)
      val bi = new BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w)
        bi.setRGB(x, y, rnd.nextInt() | 0xFF000000) // opaque random
      val baos = new ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "png", baos))
      val d = PngDecode.decode(baos.toByteArray)
      assert(d != null, s"type=$imgType")
      assert(d.width == w && d.height == h && d.channels == channels)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = bi.getRGB(x, y)
        val base = (y * w + x) * channels
        channels match {
          case 3 =>
            assert(((d.pixels(base) & 0xFF) == ((argb >> 16) & 0xFF)) &&
              ((d.pixels(base + 1) & 0xFF) == ((argb >> 8) & 0xFF)) &&
              ((d.pixels(base + 2) & 0xFF) == (argb & 0xFF)), s"($x,$y)")
          case 4 =>
            assert(((d.pixels(base) & 0xFF) == ((argb >> 16) & 0xFF)) &&
              ((d.pixels(base + 3) & 0xFF) == ((argb >>> 24) & 0xFF)), s"($x,$y)")
          case 1 => // gray: compare the stored raster sample directly
            assert((d.pixels(base) & 0xFF) == bi.getRaster.getSample(x, y, 0), s"($x,$y)")
        }
      }
    }
  }

  test("decode: guards — bomb IHDR, palette, truncation, bad filter, non-PNG") {
    // decompression bomb: huge declared dims rejected before inflate
    val bomb = png(2, 2, 2, 3, pix(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
    // patch IHDR width to 100000 (offset 16..19) and fix nothing else:
    // decode must fail on the raw-size guard, not OOM
    val patched = bomb.clone()
    patched(16) = 0; patched(17) = 1; patched(18) = 0x86.toByte; patched(19) = 0xA0.toByte
    assert(PngDecode.decode(patched) == null)
    val good = png(2, 1, 2, 3, pix(1, 2, 3, 4, 5, 6))
    assert(PngDecode.decode(good) != null)
    assert(PngDecode.decode(good.take(30)) == null)            // truncated
    assert(PngDecode.decode("not a png".getBytes) == null)     // wrong magic
    val palette = png(2, 1, 3, 1, pix(0, 1)) // colorType 3 with NO PLTE
    assert(PngDecode.decode(palette) == null, "PLTE-less palette must refuse")
    val badFilter = png(2, 1, 2, 3, pix(1, 2, 3, 4, 5, 6), Seq(9))
    assert(PngDecode.decode(badFilter) == null)
  }

  test("PngPixelStats expression + SQL registration over a DataFrame") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // uniform 4x2 RGB: means are exact
    val uniform = png(4, 2, 2, 3, Array.fill(24)(0).zipWithIndex
      .map { case (_, i) => (i % 3 match { case 0 => 100; case 1 => 150; case 2 => 200 }).toByte })
    val df = Seq((1L, uniform), (2L, "plain text".getBytes)).toDF("id", "payload")
    val out = df.select($"id", graft.operators.Multimodal.imagePixelStats($"payload").as("st"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Double](1))).toMap
    assert(out(1L).get == Seq(4.0, 2.0, 3.0, 100.0, 150.0, 200.0))
    assert(out(2L).isEmpty) // non-PNG → NULL, never stub numbers
    df.createOrReplaceTempView("png_fixture")
    val viaSql = spark.sql(
      "SELECT id, graft_png_stats(payload) FROM png_fixture WHERE id = 1").collect()
    assert(viaSql.head.getSeq[Double](1) == Seq(4.0, 2.0, 3.0, 100.0, 150.0, 200.0))
    // raw pixels surface too
    val px = df.filter($"id" === 1).select(graft.operators.Multimodal.imagePixels($"payload"))
      .head().getAs[Array[Byte]](0)
    assert(px.length == 24 && (px(0) & 0xFF) == 100 && (px(23) & 0xFF) == 200)
  }
}
