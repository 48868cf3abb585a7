package graft.operators

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GifDecode

/** GIF LZW decoder: cross-checked against the JDK's independent
  * conformant ImageIO reader on every fixture (the same independence
  * stance as the JPEG spec), plus a golden hand-compressed stream,
  * interlace, and the refusal guards.
  */
class GifSpec extends SparkSpec {

  /** 5×4, 4-color table, REAL LZW (dictionary hits + a same-code run
    * exercising the KwKwK case + width growth 3→4→5 bits), a GCE
    * extension before the image — hand-compressed per the spec,
    * independent of encodeGif. */
  private val Golden =
    "4749463839610500040081000000030732537564a3e396f35121f90400000000002c00000000050004000002074464a18a07d60a003b"
  private val GoldenPixels =
    "00030732537564a3e300030732537532537532537532537532537532537564a3e300030732537564a3e300030700030732537564a3e3000307325375"

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def toHex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString

  /** Independent decode via the JDK reader → shared RGB layout. */
  private def imageioRgb(bytes: Array[Byte]): Array[Byte] = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO must read the fixture")
    val out = new Array[Byte](img.getWidth * img.getHeight * 3)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val argb = img.getRGB(x, y)
      val d = (y * img.getWidth + x) * 3
      out(d) = ((argb >> 16) & 0xFF).toByte
      out(d + 1) = ((argb >> 8) & 0xFF).toByte
      out(d + 2) = (argb & 0xFF).toByte
    }
    out
  }

  test("golden hand-compressed stream: exact pixels, and the JDK reader agrees") {
    val d = GifDecode.decode(hex(Golden))
    assert(d != null && d.width == 5 && d.height == 4)
    assert(toHex(d.pixels) == GoldenPixels)
    assert(toHex(imageioRgb(hex(Golden))) == GoldenPixels,
      "independent JDK decode must agree — proves the LZW convention, not just self-consistency")
  }

  test("encodeGif round trip == formula == independent JDK decode") {
    def pal(i: Int) = ((i * 3) % 256, (i * 5 + 1) % 256, (i * 7 + 2) % 256)
    def idx(x: Int, y: Int) = (x * 31 + y * 57) % 256
    val gif = Multimodal.encodeGif(9, 7, pal, idx)
    val want = (for (y <- 0 until 7; x <- 0 until 9; c <- 0 until 3) yield {
      val (r, g, b) = pal(idx(x, y)); Seq(r, g, b)(c).toByte
    }).toArray
    val d = GifDecode.decode(gif)
    assert(d != null && d.width == 9 && d.height == 7)
    assert(d.pixels.sameElements(want))
    assert(imageioRgb(gif).sameElements(want), "JDK reader must accept encodeGif output")
  }

  test("interlaced image: 4-pass row order restored, JDK agrees") {
    def pal(i: Int) = (i, 255 - i, (i * 2) % 256)
    def idx(x: Int, y: Int) = (y * 16 + x) % 256
    val gif = Multimodal.encodeGif(6, 13, pal, idx, interlaced = true)
    val d = GifDecode.decode(gif)
    assert(d != null && d.height == 13)
    assert(d.pixels.sameElements(imageioRgb(gif)),
      "de-interlaced rows must match the independent decode")
    // spot-check a display row directly against the formula
    val (r0, g0, b0) = pal(idx(3, 5))
    val o = (5 * 6 + 3) * 3
    assert((d.pixels(o) & 0xFF) == r0 && (d.pixels(o + 1) & 0xFF) == g0 && (d.pixels(o + 2) & 0xFF) == b0)
  }

  test("dispatch: imagePixels routes GIF payloads to the LZW decoder") {
    import spark.implicits._
    val gif = Multimodal.encodeGif(4, 4, i => (i, i, i), (x, y) => (x + y) % 256)
    val got = Seq(gif).toDF("payload")
      .select(Multimodal.imagePixels(col("payload"))).head().getAs[Array[Byte]](0)
    assert(got.sameElements(GifDecode.decode(gif).pixels))
    val st = Seq(gif).toDF("payload")
      .select(Multimodal.imagePixelStats(col("payload"))).head().getSeq[Double](0)
    assert(st(0) == 4.0 && st(1) == 4.0 && st(2) == 3.0)
  }

  test("malformed streams → NULL: truncated, no color table, trailer-first, bad code") {
    val ok = Multimodal.encodeGif(4, 4, i => (i, i, i), (x, y) => x)
    assert(GifDecode.decode(ok.take(20)) == null, "truncated header/table")
    assert(GifDecode.decode(ok.dropRight(3)) == null, "truncated LZW stream")
    assert(GifDecode.decode("GIF89a but not really".getBytes) == null)
    // no global table + image without local table
    val noTable = ok.clone(); noTable(10) = (noTable(10) & 0x7F).toByte
    assert(GifDecode.decode(noTable) == null)
  }
}
