package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

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

  /** One parsed (not yet decoded) animation frame: rect geometry, its
    * color table, LZW payload, and the GCE state that governs how it
    * composites (disposal method, transparent index or −1). */
  private final case class AnimFrame(
      left: Int, top: Int, w: Int, h: Int, interlaced: Boolean,
      table: Array[Byte], minCode: Int, data: Array[Byte],
      disposal: Int, transparent: Int)

  /** Fully composited animation: every frame as a FULL-CANVAS RGB
    * buffer in the shared decoder layout (top-down row-major), so the
    * video family's per-frame hashing consumes GIF animations exactly
    * like AVI frames. */
  final case class AnimDecoded(
      width: Int, height: Int, frames: IndexedSeq[Array[Byte]])

  /** Decode a (possibly animated) GIF with FULL compositing semantics
    * per the GIF89a spec: frames are rects drawn onto the logical-
    * screen canvas at (left, top); a GCE transparent index leaves the
    * underlying canvas visible; disposal 0/1 keep the composited
    * result, 2 restores the frame's rect to the BACKGROUND color
    * (the logical-screen background index through the global table —
    * black when absent/out of range, documented), 3 restores the
    * canvas to its pre-frame state. Local palettes override the
    * global per frame; interlaced frames de-interlace within their
    * rect. The canvas starts as the background color.
    *
    * Compositing is inherently SEQUENTIAL (frame k's canvas depends
    * on 0..k−1), so unlike the AVI walk every frame's LZW stream is
    * decoded even under striding — the honest cost of delta-coded
    * animation, stated here rather than hidden. Total composited
    * volume (nFrames·W·H·3) is capped at [[PngDecode.MaxRawBytes]]
    * BEFORE any canvas is allocated; malformed streams return NULL,
    * never garbage. */
  def decodeAnim(b: Array[Byte]): AnimDecoded = {
    if (b == null || b.length < 14) return null
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return null
    val width = leU16(b, 6)
    val height = leU16(b, 8)
    if (width <= 0 || height <= 0) return null
    val packed = b(10) & 0xFF
    val hasGlobal = (packed & 0x80) != 0
    val globalSize = 2 << (packed & 7)
    val bgIndex = b(11) & 0xFF
    var pos = 13
    var globalTable: Array[Byte] = null
    if (hasGlobal) {
      if (pos + 3 * globalSize > b.length) return null
      globalTable = java.util.Arrays.copyOfRange(b, pos, pos + 3 * globalSize)
      pos += 3 * globalSize
    }
    // ---- pass 1: collect the frame directory (rects + LZW payloads)
    val frames = scala.collection.mutable.ArrayBuffer[AnimFrame]()
    var disposal = 0
    var transparent = -1
    var done = false
    while (!done && pos < b.length) {
      (b(pos) & 0xFF) match {
        case 0x21 => // extension: label + sub-blocks
          if (pos + 2 >= b.length) return null
          val label = b(pos + 1) & 0xFF
          if (label == 0xF9 && pos + 7 < b.length && (b(pos + 2) & 0xFF) >= 4) {
            val gce = b(pos + 3) & 0xFF
            disposal = (gce >> 2) & 7
            transparent = if ((gce & 1) != 0) b(pos + 6) & 0xFF else -1
          }
          pos += 2
          var sb = b(pos) & 0xFF
          while (sb != 0) {
            pos += 1 + sb
            if (pos >= b.length) return null
            sb = b(pos) & 0xFF
          }
          pos += 1
        case 0x2C =>
          if (pos + 10 > b.length) return null
          val left = leU16(b, pos + 1)
          val top = leU16(b, pos + 3)
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
          if (left + w > width || top + h > height) return null // rect escapes canvas
          if ((frames.size + 1).toLong * width * height * 3 > PngDecode.MaxRawBytes)
            return null // composited-volume bomb guard, pre-allocation
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
          pos += 1
          frames += AnimFrame(left, top, w, h, interlaced, table, minCode,
            data.toByteArray, disposal, transparent)
          disposal = 0
          transparent = -1 // GCE governs exactly one frame
        case 0x3B => done = true
        case _ => return null
      }
    }
    if (frames.isEmpty) return null
    // ---- pass 2: composite
    val (bgR, bgG, bgB) =
      if (globalTable != null && bgIndex < globalTable.length / 3)
        (globalTable(bgIndex * 3), globalTable(bgIndex * 3 + 1), globalTable(bgIndex * 3 + 2))
      else (0.toByte, 0.toByte, 0.toByte)
    val canvas = new Array[Byte](width * height * 3)
    var i = 0
    while (i < canvas.length) {
      canvas(i) = bgR; canvas(i + 1) = bgG; canvas(i + 2) = bgB
      i += 3
    }
    val out = new Array[Array[Byte]](frames.size)
    var fi = 0
    while (fi < frames.size) {
      val f = frames(fi)
      val pre = if (f.disposal == 3) canvas.clone() else null
      val indices = lzw(f.data, f.minCode, f.w * f.h)
      if (indices == null) return null
      val nColors = f.table.length / 3
      val rowOrder: Array[Int] =
        if (!f.interlaced) Array.tabulate(f.h)(identity)
        else {
          val order = new Array[Int](f.h)
          var r = 0
          for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
               y <- start until f.h by step) {
            order(r) = y; r += 1
          }
          order
        }
      var srcRow = 0
      while (srcRow < f.h) {
        val dstRow = f.top + rowOrder(srcRow)
        var x = 0
        while (x < f.w) {
          val idx = indices(srcRow * f.w + x) & 0xFF
          if (idx != f.transparent) {
            if (idx >= nColors) return null
            val d = (dstRow * width + f.left + x) * 3
            canvas(d) = f.table(idx * 3)
            canvas(d + 1) = f.table(idx * 3 + 1)
            canvas(d + 2) = f.table(idx * 3 + 2)
          }
          x += 1
        }
        srcRow += 1
      }
      out(fi) = canvas.clone()
      if (f.disposal == 2) {
        var y = f.top
        while (y < f.top + f.h) {
          var x = f.left
          while (x < f.left + f.w) {
            val d = (y * width + x) * 3
            canvas(d) = bgR; canvas(d + 1) = bgG; canvas(d + 2) = bgB
            x += 1
          }
          y += 1
        }
      } else if (f.disposal == 3) {
        System.arraycopy(pre, 0, canvas, 0, canvas.length)
      }
      fi += 1
    }
    AnimDecoded(width, height, out.toIndexedSeq)
  }

  /** Header-and-directory walk only: (width, height, n_frames) with
    * no LZW decode and no canvas allocation, or null. Frame COUNT
    * requires walking the block stream (sub-block skips), but never
    * decoding it. */
  def animMeta(b: Array[Byte]): (Int, Int, Int) = {
    if (b == null || b.length < 14) return null
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return null
    val width = leU16(b, 6)
    val height = leU16(b, 8)
    if (width <= 0 || height <= 0) return null
    val packed = b(10) & 0xFF
    var pos = 13
    if ((packed & 0x80) != 0) {
      pos += 3 * (2 << (packed & 7))
      if (pos > b.length) return null
    }
    var n = 0
    while (pos < b.length) {
      (b(pos) & 0xFF) match {
        case 0x21 =>
          pos += 2
          if (pos >= b.length) return null
          var sb = b(pos) & 0xFF
          while (sb != 0) {
            pos += 1 + sb
            if (pos >= b.length) return null
            sb = b(pos) & 0xFF
          }
          pos += 1
        case 0x2C =>
          if (pos + 10 > b.length) return null
          val ipacked = b(pos + 9) & 0xFF
          pos += 10
          if ((ipacked & 0x80) != 0) {
            pos += 3 * (2 << (ipacked & 7))
            if (pos > b.length) return null
          }
          pos += 1 // LZW min code size
          if (pos >= b.length) return null
          var sb = b(pos) & 0xFF
          while (sb != 0) {
            pos += 1 + sb
            if (pos >= b.length) return null
            sb = b(pos) & 0xFF
          }
          pos += 1
          n += 1
        case 0x3B => return if (n > 0) (width, height, n) else null
        case _ => return null
      }
    }
    if (n > 0) (width, height, n) else null
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

/** Animation container metadata of a GIF payload:
  * `struct<width:int, height:int, n_frames:int>` (canvas dims +
  * frame-chunk count — a directory walk, no LZW decode, no canvas).
  * NULL for non-GIF / malformed payloads. The "is this GIF a video?"
  * dispatch signal (n_frames > 1). */
case class GifAnimMeta(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary, got $t")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_anim_meta"
  override protected def nullSafeEval(input: Any): Any = {
    val m = GifDecode.animMeta(input.asInstanceOf[Array[Byte]])
    if (m == null) null else InternalRow(m._1, m._2, m._3)
  }
  override protected def withNewChildInternal(newChild: Expression): GifAnimMeta =
    copy(child = newChild)
}

/** Per-frame perceptual dHashes of an ANIMATED GIF's composited
  * canvas frames: `array<struct<frame_idx:int, dhash:long>>` for
  * frames 0, stride, 2·stride, … — the [[AviFrameDHashes]] shape for
  * the GIF container, over the SAME 9×8 floor-grid / ⌊(R+G+B)/3⌋
  * luma / horizontal-gradient kernel as [[ImageDHash64]], so a GIF
  * animation and an AVI carrying the same RGB frames hash
  * IDENTICALLY frame for frame (spec-pinned) and the whole video
  * near-dup family composes across containers. Compositing is
  * sequential, so every frame's LZW stream decodes even under
  * striding (only the HASHING is strided) — see
  * [[GifDecode.decodeAnim]]. NULL when out of scope or stride < 1. */
case class GifFrameDHashes(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType | LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, integral), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("dhash", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_frame_dhashes"

  private final val GridW = 9
  private final val GridH = 8

  override protected def nullSafeEval(payload: Any, strideAny: Any): Any = {
    val stride = strideAny match { case l: Long => l; case n: Int => n.toLong }
    if (stride < 1) return null
    val d = GifDecode.decodeAnim(payload.asInstanceOf[Array[Byte]])
    if (d == null) return null
    val w = d.width; val h = d.height
    def luma(px: Array[Byte], gx: Int, gy: Int): Int = {
      val sy = (gy.toLong * h / GridH).toInt
      val sx = (gx.toLong * w / GridW).toInt
      val s = (sy * w + sx) * 3
      ((px(s) & 0xFF) + (px(s + 1) & 0xFF) + (px(s + 2) & 0xFF)) / 3
    }
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0L
    while (i < d.frames.length) {
      val fi = i.toInt
      val px = d.frames(fi)
      var hash = 0L
      var gy = 0
      while (gy < GridH) {
        var prev = luma(px, 0, gy)
        var gx = 0
        while (gx < GridW - 1) {
          val next = luma(px, gx + 1, gy)
          if (next > prev) hash |= 1L << (gy * 8 + gx)
          prev = next
          gx += 1
        }
        gy += 1
      }
      out += InternalRow(fi, hash)
      i += stride
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GifFrameDHashes =
    copy(left = newLeft, right = newRight)
}

/** Per-frame brightness of an animated GIF's composited frames:
  * `array<struct<frame_idx:long, mean:double>>` — the
  * [[AviFrameStats]] shape (mean over all RGB samples of the FULL
  * canvas), exact palette arithmetic, so animation compositing
  * (partial rects, transparency, disposal 0–3, local palettes) is
  * fully oracle-checkable. NULL when out of scope or stride < 1. */
case class GifFrameStats(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType | LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, integral), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("frame_idx", LongType, nullable = false),
    StructField("mean", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gif_frame_stats"
  override protected def nullSafeEval(payload: Any, strideAny: Any): Any = {
    val stride = strideAny match { case l: Long => l; case n: Int => n.toLong }
    if (stride < 1) return null
    val d = GifDecode.decodeAnim(payload.asInstanceOf[Array[Byte]])
    if (d == null) return null
    val nSamples = d.width.toLong * d.height * 3
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0L
    while (i < d.frames.length) {
      val fi = i.toInt
      val px = d.frames(fi)
      var sum = 0L
      var j = 0
      while (j < px.length) { sum += px(j) & 0xFF; j += 1 }
      out += InternalRow(i, sum.toDouble / nSamples)
      i += stride
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GifFrameStats =
    copy(left = newLeft, right = newRight)
}
