package graft.functions

import java.util.zip.Inflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Pure-JVM PNG pixel decoder (zlib inflate via `java.util.zip` +
  * scanline unfilter per the public PNG spec §9/§13) — upgrades the
  * multimodal family from header metadata to REAL pixel access with
  * no external codec: the JDK's Inflater is the only dependency.
  *
  * Scope (documented, not silently wrong): 8-bit depth, color types
  * 0/2/4/6 (gray, RGB, gray+alpha, RGBA), non-interlaced — what
  * standard encoders emit for photographic/training images. Palette,
  * 16-bit, and Adam7 payloads return NULL (honest absence), as does
  * anything truncated or corrupt.
  *
  * Safety at scale: a 100 TB media lake WILL contain decompression
  * bombs — a few-KB payload declaring a huge IHDR and a zlib stream
  * that expands to it. The decoder rejects images whose raw size
  * `height·(1+width·channels)` exceeds [[PngDecode.MaxRawBytes]]
  * (64 MiB) BEFORE allocating or inflating anything, and the chunk
  * walk is length-checked so no declared size reads past the buffer.
  *
  * Codegen: [[CodegenFallback]] — a full inflate+unfilter loop in
  * generated Java would buy nothing (the cost is the codec, not the
  * dispatch), unlike the short bounded walks ([[JpegSofDims]]) where
  * staying inside whole-stage codegen matters.
  */
private[graft] object PngDecode {
  /** Raw-size ceiling (64 MiB ≈ a 4096×4096 RGBA) — the decompression
    * bomb guard. */
  val MaxRawBytes: Long = 64L * 1024 * 1024

  final case class Decoded(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  private def beU32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  /** Decode or null. Never throws on malformed input. */
  def decode(b: Array[Byte]): Decoded = {
    if (b == null || b.length < 45) return null // sig+IHDR+IDAT+IEND minimum
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    var i = 0
    while (i < 8) { if ((b(i) & 0xFF) != sig(i)) return null; i += 1 }
    var pos = 8
    var width, height, channels = -1
    var idat = new java.io.ByteArrayOutputStream()
    var chunks = 0
    var sawEnd = false
    while (!sawEnd && pos + 8 <= b.length && chunks < 10000) {
      chunks += 1
      val len = beU32(b, pos)
      if (len > Int.MaxValue - 12 || pos + 12 + len > b.length) return null
      val cType = new String(b, pos + 4, 4, "US-ASCII")
      val dataOff = pos + 8
      cType match {
        case "IHDR" =>
          if (len != 13) return null
          width = beU32(b, dataOff).toInt
          height = beU32(b, dataOff + 4).toInt
          val bitDepth = b(dataOff + 8) & 0xFF
          val colorType = b(dataOff + 9) & 0xFF
          val interlace = b(dataOff + 12) & 0xFF
          if (bitDepth != 8 || interlace != 0) return null
          channels = colorType match {
            case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
            case _ => return null // palette (3) or invalid
          }
          if (width <= 0 || height <= 0) return null
          val raw = height.toLong * (1L + width.toLong * channels)
          if (raw > MaxRawBytes) return null // bomb guard, pre-allocation
        case "IDAT" => idat.write(b, dataOff, len.toInt)
        case "IEND" => sawEnd = true
        case _ => () // PLTE/tEXt/gAMA/... irrelevant to truecolor pixels
      }
      pos += 12 + len.toInt // len + type + data + crc (crc not validated)
    }
    if (width < 0 || !sawEnd || idat.size() == 0) return null
    val stride = width * channels
    val rawLen = height * (1 + stride)
    val raw = new Array[Byte](rawLen)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, got, rawLen - got)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return null
        got += n
      }
      if (got < rawLen) return null // truncated pixel stream
    } catch { case _: java.util.zip.DataFormatException => return null }
    finally inf.end()
    // unfilter scanlines in place into the output (PNG spec §9)
    val out = new Array[Byte](height * stride)
    val bpp = channels
    var y = 0
    while (y < height) {
      val f = raw(y * (1 + stride)) & 0xFF
      if (f > 4) return null
      val rowIn = y * (1 + stride) + 1
      val rowOut = y * stride
      val prevOut = rowOut - stride
      var x = 0
      while (x < stride) {
        val rawV = raw(rowIn + x) & 0xFF
        val left = if (x >= bpp) out(rowOut + x - bpp) & 0xFF else 0
        val up = if (y > 0) out(prevOut + x) & 0xFF else 0
        val ul = if (y > 0 && x >= bpp) out(prevOut + x - bpp) & 0xFF else 0
        val recon = f match {
          case 0 => rawV
          case 1 => rawV + left
          case 2 => rawV + up
          case 3 => rawV + ((left + up) >> 1)
          case 4 => // Paeth predictor
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            rawV + pred
        }
        out(rowOut + x) = (recon & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    Decoded(width, height, channels, out)
  }
}

/** Raw decoded PNG pixels as BINARY: row-major, channel-interleaved,
  * 8 bits per sample — the byte layout an image featurizer or a
  * downstream model-input packer consumes directly. NULL for
  * non-PNG / unsupported / corrupt payloads ([[PngDecode]] scope). */
case class PngPixels(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary, got $t")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_pixels"
  override protected def nullSafeEval(input: Any): Any = {
    val d = PngDecode.decode(input.asInstanceOf[Array[Byte]])
    if (d == null) null else d.pixels
  }
  override protected def withNewChildInternal(newChild: Expression): PngPixels =
    copy(child = newChild)
}

/** Decoded-pixel statistics as `array<double>`:
  * `[width, height, channels, mean_ch1, …, mean_chN]` (means in
  * [0, 255]) — the cheap image-quality / dead-pixel / brightness
  * signal computed in the same pass as the decode, without
  * materializing the pixel buffer into the row. NULL when
  * [[PngPixels]] would be NULL. */
case class PngPixelStats(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary, got $t")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_png_stats"
  override protected def nullSafeEval(input: Any): Any = {
    val d = PngDecode.decode(input.asInstanceOf[Array[Byte]])
    if (d == null) return null
    val sums = new Array[Long](d.channels)
    var i = 0
    while (i < d.pixels.length) {
      sums(i % d.channels) += d.pixels(i) & 0xFF
      i += 1
    }
    val nPix = d.width.toLong * d.height
    val out = new Array[Double](3 + d.channels)
    out(0) = d.width.toDouble; out(1) = d.height.toDouble; out(2) = d.channels.toDouble
    var c = 0
    while (c < d.channels) { out(3 + c) = sums(c).toDouble / nPix; c += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): PngPixelStats =
    copy(child = newChild)
}
