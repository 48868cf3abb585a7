package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** JPEG pixel decode via the JDK's bundled ImageIO JPEG reader
  * (`javax.imageio`, part of `java.desktop` — present in every
  * standard JVM, no external codec): upgrades the JPEG branch of the
  * multimodal family from header metadata ([[JpegSofDims]]) to REAL
  * pixel access, completing the PNG/JPEG pixel story.
  *
  * Contract mirrors [[PngPixels]]: row-major, channel-interleaved,
  * 8 bits per sample; NULL for non-JPEG / corrupt / unsupported
  * payloads (honest absence, never stub arithmetic). Channel count
  * comes from the decoded raster (3 for YCbCr/RGB baseline, 1 for
  * grayscale).
  *
  * Determinism note (why this is SPEC-gated, not oracle-gated, unlike
  * the arithmetic PNG oracle): JPEG decode involves an IDCT whose
  * rounding the spec only bounds (ITU T.81 Annex A commits decoders
  * to accuracy limits, not bit-exact outputs), so two independent
  * decoders may legally differ by ±1 per sample. Within ONE JVM the
  * bundled reader is deterministic — the encode→decode round-trip
  * spec pins the exact bytes against an independent ImageIO read.
  *
  * Safety at scale: same decompression-bomb stance as [[PngDecode]] —
  * the SOF header walk bounds `width·height·channels` against
  * [[JpegDecode.MaxRawBytes]] BEFORE ImageIO allocates anything, and
  * ImageIO's disk cache is disabled (pure in-memory decode on the
  * executor, no /tmp traffic under 32 concurrent tasks).
  *
  * Codegen: [[CodegenFallback]] — the cost is the codec, not the
  * dispatch (same rationale as [[PngPixels]]).
  */
private[graft] object JpegDecode {
  /** Decoded-size ceiling shared with the PNG decoder. */
  val MaxRawBytes: Long = PngDecode.MaxRawBytes

  javax.imageio.ImageIO.setUseCache(false)

  final case class Decoded(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** Pre-decode SOF walk for the bomb guard — the same bounded
    * segment chase [[JpegSofDims]] runs in codegen, in its compact
    * interpreted form. Returns (width, height, channels) or null. */
  private def sofDims(b: Array[Byte]): Array[Long] = {
    val n = b.length
    def u(i: Int): Int = b(i) & 0xFF
    if (n < 4 || u(0) != 0xFF || u(1) != 0xD8 || u(2) != 0xFF) return null
    var off = 2
    var steps = 0
    while (steps < 64 && off + 1 < n) {
      steps += 1
      if (u(off) != 0xFF) return null
      val marker = u(off + 1)
      if (marker == 0xFF) { off += 1 }
      else if (marker == 0xD8 || marker == 0x01 ||
        (marker >= 0xD0 && marker <= 0xD7)) { off += 2 }
      else if (marker == 0xDA || marker == 0xD9) return null
      else if (off + 3 >= n) return null
      else {
        val segLen = (u(off + 2) << 8) | u(off + 3)
        if (segLen < 2) return null
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (off + 9 >= n || segLen < 8) return null
          return Array(
            ((u(off + 7) << 8) | u(off + 8)).toLong,
            ((u(off + 5) << 8) | u(off + 6)).toLong,
            u(off + 9).toLong)
        }
        off += 2 + segLen
      }
    }
    null
  }

  /** Decode or null. Never throws on malformed input. */
  def decode(b: Array[Byte]): Decoded = {
    if (b == null) return null
    val dims = sofDims(b)
    if (dims == null) return null
    val Array(w, h, c) = dims
    if (w <= 0 || h <= 0 || c < 1 || c > 4) return null
    if (w * h * c > MaxRawBytes) return null // bomb guard, pre-allocation
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return null
    val iw = img.getWidth
    val ih = img.getHeight
    val raster = img.getRaster
    val nc = raster.getNumBands
    if (iw <= 0 || ih <= 0 || nc < 1 || nc > 4 ||
      iw.toLong * ih * nc > MaxRawBytes) return null
    val samples = raster.getPixels(0, 0, iw, ih, new Array[Int](iw * ih * nc))
    val out = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) { out(i) = (samples(i) & 0xFF).toByte; i += 1 }
    Decoded(iw, ih, nc, out)
  }
}

/** Raw decoded JPEG pixels as BINARY: row-major, channel-interleaved,
  * 8 bits per sample — same byte layout as [[PngPixels]], so one
  * featurizer consumes either format's output. NULL for non-JPEG /
  * corrupt payloads ([[JpegDecode]] scope). */
case class JpegPixels(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary, got $t")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_pixels"
  override protected def nullSafeEval(input: Any): Any = {
    val d = JpegDecode.decode(input.asInstanceOf[Array[Byte]])
    if (d == null) null else d.pixels
  }
  override protected def withNewChildInternal(newChild: Expression): JpegPixels =
    copy(child = newChild)
}

/** Decoded-JPEG statistics as `array<double>`:
  * `[width, height, channels, mean_ch1, …, mean_chN]` — same layout
  * as [[PngPixelStats]]. NULL when [[JpegPixels]] would be NULL. */
case class JpegPixelStats(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary, got $t")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_stats"
  override protected def nullSafeEval(input: Any): Any = {
    val d = JpegDecode.decode(input.asInstanceOf[Array[Byte]])
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
  override protected def withNewChildInternal(newChild: Expression): JpegPixelStats =
    copy(child = newChild)
}
