package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Pure-JVM BMP pixel decoder — with this, every image format whose
  * header this library reads also decodes pixels (PNG inflate+unfilter,
  * JPEG via ImageIO, BMP here; GIF stays header-only — LZW is the one
  * remaining codec, documented, not silently wrong).
  *
  * Wire format per the public BMP spec (all little-endian):
  * BITMAPFILEHEADER ('BM', u32 fileSize, u32 reserved, u32
  * pixelDataOffset) + BITMAPINFOHEADER (u32 size ≥ 40, i32 width,
  * i32 height — negative = top-down, u16 planes, u16 bitCount, u32
  * compression, …). Scope: bitCount 24, compression BI_RGB(0) — the
  * uncompressed truecolor form. Rows are 4-byte padded BGR on the
  * wire (bottom-up by default) and come out TOP-DOWN row-major
  * RGB-interleaved — the same layout as every other decoder here, so
  * [[ImageResizeNN]] and the featurizers compose unchanged.
  *
  * Guards: every declared offset/length checked against the physical
  * buffer; decoded volume capped at [[PngDecode.MaxRawBytes]] (64 MiB)
  * before allocation.
  */
private[graft] object BmpDecode {
  final case class Decoded(width: Int, height: Int, pixels: Array[Byte])

  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def leI32(b: Array[Byte], i: Int): Int = leU32(b, i).toInt
  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  /** Decode or null. Never throws on malformed input. */
  def decode(b: Array[Byte]): Decoded = {
    if (b == null || b.length < 54) return null
    if (b(0) != 'B' || b(1) != 'M') return null
    val dataOff = leU32(b, 10)
    val dibSize = leU32(b, 14)
    if (dibSize < 40) return null // BITMAPCOREHEADER etc. out of scope
    val width = leI32(b, 18)
    val heightRaw = leI32(b, 22)
    val bitCount = leU16(b, 28)
    val compression = leI32(b, 30)
    if (bitCount != 24 || compression != 0) return null
    val topDown = heightRaw < 0
    val h = math.abs(heightRaw)
    if (width <= 0 || h <= 0) return null
    val outLen = width.toLong * h * 3
    if (outLen > PngDecode.MaxRawBytes) return null
    val wireStride = ((width * 3 + 3) / 4) * 4
    if (dataOff < 0 || dataOff + wireStride.toLong * h > b.length) return null
    val out = new Array[Byte](outLen.toInt)
    var y = 0
    while (y < h) {
      val srcRow = dataOff.toInt + (if (topDown) y else h - 1 - y) * wireStride
      var x = 0
      while (x < width) {
        val s = srcRow + x * 3 // wire BGR → out RGB
        val d = (y * width + x) * 3
        out(d) = b(s + 2); out(d + 1) = b(s + 1); out(d + 2) = b(s)
        x += 1
      }
      y += 1
    }
    Decoded(width, h, out)
  }
}

/** Raw decoded BMP pixels as BINARY in the shared decoder layout
  * (top-down, row-major, RGB); NULL outside [[BmpDecode]] scope. */
case class BmpPixels(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary, got $t")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bmp_pixels"
  override protected def nullSafeEval(input: Any): Any = {
    val d = BmpDecode.decode(input.asInstanceOf[Array[Byte]])
    if (d == null) null else d.pixels
  }
  override protected def withNewChildInternal(newChild: Expression): BmpPixels =
    copy(child = newChild)
}

/** Decoded-pixel statistics of a BMP payload, same layout as
  * [[PngPixelStats]]: `[width, height, channels(=3), mean_R, mean_G,
  * mean_B]`. NULL when [[BmpPixels]] would be NULL. */
case class BmpPixelStats(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary, got $t")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bmp_stats"
  override protected def nullSafeEval(input: Any): Any = {
    val d = BmpDecode.decode(input.asInstanceOf[Array[Byte]])
    if (d == null) return null
    val sums = new Array[Long](3)
    var i = 0
    while (i < d.pixels.length) { sums(i % 3) += d.pixels(i) & 0xFF; i += 1 }
    val nPix = d.width.toLong * d.height
    val out = new Array[Double](6)
    out(0) = d.width.toDouble; out(1) = d.height.toDouble; out(2) = 3.0
    var c = 0
    while (c < 3) { out(3 + c) = sums(c).toDouble / nPix; c += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): BmpPixelStats =
    copy(child = newChild)
}
