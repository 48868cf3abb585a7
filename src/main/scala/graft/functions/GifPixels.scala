package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Pure-JVM GIF pixel decoder (GIF87a/89a per the public spec,
  * including the full variable-width LZW codec and Adam-style
  * 4-pass de-interlacing) — closes the last image-format gap: PNG,
  * JPEG, BMP, and now GIF all decode to the one shared layout
  * (top-down, row-major, RGB-interleaved), so resize/featurize/dedup
  * compose over any still format.
  *
  * Scope: the FIRST image frame of the stream (animation frames
  * after it are ignored — a curation pass fingerprints the poster
  * frame), global or local color table, interlaced or not.
  * Transparency (GCE bit) is ignored — the transparent index still
  * maps through the color table, which is what a brightness/dedup
  * featurizer wants. Malformed streams (bad codes, truncated
  * sub-blocks, missing table) return NULL, never garbage.
  *
  * LZW per spec appendix: initial code width = minCodeSize+1; CLEAR
  * resets the dictionary; codes grow to 12 bits max; the
  * first-code-after-clear must be a literal; the "code == next"
  * case emits prev+prev[0]. Output is capped at width·height indices
  * and the decoded RGB volume at [[PngDecode.MaxRawBytes]] (64 MiB)
  * BEFORE allocation — the bomb stance every decoder here shares.
  */
private[graft] object GifDecode {
  final case class Decoded(width: Int, height: Int, pixels: Array[Byte])

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  /** Decode or null. Never throws on malformed input. */
  def decode(b: Array[Byte]): Decoded = {
    if (b == null || b.length < 14) return null
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return null
    var pos = 6
    // logical screen descriptor
    if (pos + 7 > b.length) return null
    val packed = b(pos + 4) & 0xFF
    val hasGlobal = (packed & 0x80) != 0
    val globalSize = 2 << (packed & 7)
    pos += 7
    var globalTable: Array[Byte] = null
    if (hasGlobal) {
      if (pos + 3 * globalSize > b.length) return null
      globalTable = java.util.Arrays.copyOfRange(b, pos, pos + 3 * globalSize)
      pos += 3 * globalSize
    }
    // block stream: skip extensions until the first image descriptor
    while (pos < b.length) {
      (b(pos) & 0xFF) match {
        case 0x21 => // extension: label byte + sub-blocks
          pos += 2
          var sb = if (pos < b.length) b(pos) & 0xFF else return null
          while (sb != 0) {
            pos += 1 + sb
            if (pos >= b.length) return null
            sb = b(pos) & 0xFF
          }
          pos += 1
        case 0x2C => // image descriptor
          if (pos + 10 > b.length) return null
          val w = leU16(b, pos + 5)
          val h = leU16(b, pos + 7)
          val ipacked = b(pos + 9) & 0xFF
          val interlaced = (ipacked & 0x40) != 0
          val hasLocal = (ipacked & 0x80) != 0
          val localSize = 2 << (ipacked & 7)
          pos += 10
          var table = globalTable
          if (hasLocal) {
            if (pos + 3 * localSize > b.length) return null
            table = java.util.Arrays.copyOfRange(b, pos, pos + 3 * localSize)
            pos += 3 * localSize
          }
          if (table == null || w <= 0 || h <= 0) return null
          if (w.toLong * h * 3 > PngDecode.MaxRawBytes) return null
          val nColors = table.length / 3
          // LZW stream: min code size + length-prefixed sub-blocks
          if (pos >= b.length) return null
          val minCode = b(pos) & 0xFF
          pos += 1
          if (minCode < 1 || minCode > 11) return null
          val data = new java.io.ByteArrayOutputStream()
          var sb = if (pos < b.length) b(pos) & 0xFF else return null
          while (sb != 0) {
            if (pos + 1 + sb > b.length) return null
            data.write(b, pos + 1, sb)
            pos += 1 + sb
            if (pos >= b.length) return null
            sb = b(pos) & 0xFF
          }
          val indices = lzw(data.toByteArray, minCode, w * h)
          if (indices == null) return null
          // indices → RGB through the color table; de-interlace rows
          val out = new Array[Byte](w * h * 3)
          val rowOrder: Array[Int] =
            if (!interlaced) Array.tabulate(h)(identity)
            else {
              val order = new Array[Int](h)
              var r = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); y <- start until h by step) {
                order(r) = y; r += 1
              }
              order
            }
          var srcRow = 0
          while (srcRow < h) {
            val dstRow = rowOrder(srcRow)
            var x = 0
            while (x < w) {
              val idx = indices(srcRow * w + x) & 0xFF
              if (idx >= nColors) return null
              val d = (dstRow * w + x) * 3
              out(d) = table(idx * 3); out(d + 1) = table(idx * 3 + 1); out(d + 2) = table(idx * 3 + 2)
              x += 1
            }
            srcRow += 1
          }
          return Decoded(w, h, out)
        case 0x3B => return null // trailer before any image
        case _ => return null
      }
    }
    null
  }

  /** GIF variable-width LZW: decode exactly `expect` indices or null. */
  private def lzw(data: Array[Byte], minCode: Int, expect: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    // dictionary as (prefix code, appended byte); first byte cached
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    val first = new Array[Byte](4096)
    var next = end + 1
    var width = minCode + 1
    val out = new Array[Byte](expect)
    var outN = 0
    var bitPos = 0
    var prev = -1
    def read(): Int = {
      if (bitPos + width > data.length * 8) return -1
      var v = 0
      var i = 0
      while (i < width) {
        val bit = bitPos + i
        if ((data(bit >> 3) >> (bit & 7) & 1) != 0) v |= 1 << i
        i += 1
      }
      bitPos += width
      v
    }
    def emit(code: Int): Boolean = { // expand a code to output; false on overflow
      var stack = List.empty[Byte]
      var c = code
      while (c >= clear + 2) { stack = append(c) :: stack; c = prefix(c) }
      stack = c.toByte :: stack
      stack.forall { byt =>
        if (outN >= expect) false else { out(outN) = byt; outN += 1; true }
      }
    }
    while (outN < expect) {
      val code = read()
      if (code < 0) return null // truncated bitstream
      if (code == clear) {
        next = end + 1; width = minCode + 1; prev = -1
      } else if (code == end) {
        return if (outN == expect) out else null
      } else if (prev == -1) {
        if (code >= clear) return null // first code after clear must be literal
        if (!emit(code)) return null
        first(code) = code.toByte
        prev = code
      } else {
        val known = code < next && code != clear && code != end
        if (!known && code != next) return null // spec violation
        val firstByte = if (known) firstOf(code, clear, first, prefix, append) else firstOf(prev, clear, first, prefix, append)
        if (next < 4096) {
          prefix(next) = prev; append(next) = firstByte; next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        if (!emit(code)) return null
        prev = code
      }
    }
    out
  }

  private def firstOf(code: Int, clear: Int, first: Array[Byte],
      prefix: Array[Int], append: Array[Byte]): Byte = {
    var c = code
    while (c >= clear + 2) c = prefix(c)
    c.toByte
  }
}

/** Raw decoded GIF pixels (first frame) as BINARY in the shared
  * decoder layout; NULL outside [[GifDecode]] scope. */
case class GifPixels(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary, got $t")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_pixels"
  override protected def nullSafeEval(input: Any): Any = {
    val d = GifDecode.decode(input.asInstanceOf[Array[Byte]])
    if (d == null) null else d.pixels
  }
  override protected def withNewChildInternal(newChild: Expression): GifPixels =
    copy(child = newChild)
}

/** Decoded-pixel statistics of a GIF payload, [[PngPixelStats]]
  * layout: `[width, height, 3, mean_R, mean_G, mean_B]`. */
case class GifPixelStats(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary, got $t")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_stats"
  override protected def nullSafeEval(input: Any): Any = {
    val d = GifDecode.decode(input.asInstanceOf[Array[Byte]])
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
  override protected def withNewChildInternal(newChild: Expression): GifPixelStats =
    copy(child = newChild)
}
