package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Pure-JVM AVI (RIFF) video frame decoder — upgrades the multimodal
  * family's last stub (video frame sampling) to REAL frame access for
  * the one video format decodable without a codec library:
  * uncompressed BI_RGB AVI (fourcc 'DIB '/raw, 24-bit), the standard
  * interchange form every transcoder can emit.
  *
  * Wire format per the public Microsoft RIFF/AVI spec (all
  * little-endian, even-padded chunks):
  *   'RIFF' u32size 'AVI ' { 'LIST' u32 'hdrl' [avih, 'LIST' 'strl'
  *   [strh, strf(BITMAPINFOHEADER), …]…], 'LIST' 'movi' ['00db'/'00dc'
  *   frame chunks…], 'idx1'? }
  *
  * Scope (documented, not silently wrong): the FIRST 'vids' stream,
  * biCompression = BI_RGB (0), biBitCount = 24, frame chunks of
  * stream 00 ('00db'/'00dc'). Bottom-up rows (positive biHeight, the
  * AVI default) and top-down (negative) both decode; rows are
  * 4-byte-padded BGR on the wire and come out TOP-DOWN, row-major,
  * RGB-interleaved — the SAME layout as [[PngPixels]]/[[JpegPixels]],
  * so one featurizer consumes stills and frames alike. Compressed
  * streams (MJPG/H.264/…) return NULL — honest absence; the
  * `mapPartitions` JNI bridge documented in
  * [[graft.operators.Multimodal]] is the production swap-in for
  * those, with THIS as the layout contract it must match.
  *
  * Safety at scale: a media lake WILL contain container bombs — a
  * few-KB payload declaring huge dimensions or frame counts. The
  * walker is length-checked against the physical buffer everywhere
  * (a declared size never reads past the payload), and total decoded
  * volume (nFrames·width·height·3) is capped at
  * [[AviDecode.MaxRawBytes]] BEFORE any frame is allocated.
  *
  * Codegen: [[CodegenFallback]] — the cost is the container walk +
  * byte shuffling, not expression dispatch (same call as
  * [[PngPixels]]).
  */
private[graft] object AviDecode {
  /** Decoded-volume ceiling (64 MiB), shared spirit with
    * [[PngDecode.MaxRawBytes]]. */
  val MaxRawBytes: Long = 64L * 1024 * 1024

  final case class Decoded(
      width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      frames: IndexedSeq[Array[Byte]])

  /** Container header + validated frame-chunk directory, with NO
    * pixel materialization — the one walk every AVI expression
    * shares. `frameOffsets(i)` is the wire offset of frame i's data;
    * every chunk is pre-validated to hold a full `wireStride·height`
    * frame, and the total decoded volume is pre-checked against
    * [[MaxRawBytes]], so a consumer that passes the header can read
    * any frame without further bounds logic. Null ⇔ [[decode]] null
    * (same scope, same caps — result-equivalence by construction). */
  final case class Header(
      width: Int, height: Int, topDown: Boolean,
      fpsNum: Int, fpsDen: Int, wireStride: Int,
      frameOffsets: Array[Int])

  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def leI32(b: Array[Byte], i: Int): Int = leU32(b, i).toInt
  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Header walk or null. Never throws on malformed input. */
  def header(b: Array[Byte]): Header = {
    if (b == null || b.length < 24) return null
    if (fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return null
    var width, height = -1
    var fpsNum, fpsDen = 0
    var bitCount, compression = -1
    var sawVids = false // first 'vids' strh seen (its strf is authoritative)
    var strfPending = false // next strf belongs to the vids stream
    val frameChunks = scala.collection.mutable.ArrayBuffer[(Int, Int)]() // (off, len)
    var chunks = 0

    // Iterative chunk walk: `walk(from, until)` scans one chunk run;
    // LIST chunks descend (hdrl/strl/movi all matter). Depth ≤ 3 by
    // grammar, so recursion is safe.
    def walk(from: Int, until: Int): Boolean = { // false = structurally bad
      var pos = from
      while (pos + 8 <= until) {
        chunks += 1
        if (chunks > 100000) return false
        val id = fourcc(b, pos)
        val len = leU32(b, pos + 4)
        val dataOff = pos + 8
        if (len > Int.MaxValue - 16 || dataOff + len > until) return false
        val dataLen = len.toInt
        id match {
          case "LIST" =>
            if (dataLen < 4) return false
            if (!walk(dataOff + 4, dataOff + dataLen)) return false
          case "strh" =>
            if (dataLen >= 32) {
              val isVids = fourcc(b, dataOff) == "vids"
              strfPending = isVids && !sawVids
              if (strfPending) {
                sawVids = true
                fpsDen = leI32(b, dataOff + 20) // dwScale
                fpsNum = leI32(b, dataOff + 24) // dwRate
              }
            }
          case "strf" =>
            if (strfPending) {
              strfPending = false
              if (dataLen < 20) return false
              width = leI32(b, dataOff + 4) // biWidth
              height = leI32(b, dataOff + 8) // biHeight (neg = top-down)
              bitCount = leU16(b, dataOff + 14)
              compression = leI32(b, dataOff + 16)
            }
          case "00db" | "00dc" => frameChunks += ((dataOff, dataLen))
          case _ => () // avih (strf is authoritative), idx1, JUNK, audio …
        }
        pos = dataOff + dataLen + (dataLen & 1) // chunks pad to even
      }
      true
    }
    if (!walk(12, b.length)) return null
    if (!sawVids || compression != 0 || bitCount != 24) return null
    val topDown = height < 0
    val h = math.abs(height)
    if (width <= 0 || h <= 0) return null
    val outFrame = width.toLong * h * 3
    if (outFrame * math.max(frameChunks.size, 1) > MaxRawBytes) return null
    val wireStride = ((width * 3 + 3) / 4) * 4 // rows pad to 4 bytes
    val offsets = new Array[Int](frameChunks.size)
    var i = 0
    while (i < frameChunks.size) {
      val (off, len) = frameChunks(i)
      if (len < wireStride.toLong * h) return null // truncated frame
      offsets(i) = off
      i += 1
    }
    Header(width, h, topDown, fpsNum, fpsDen, wireStride, offsets)
  }

  /** Decode or null. Never throws on malformed input. */
  def decode(b: Array[Byte]): Decoded = {
    val hd = header(b)
    if (hd == null) return null
    val w = hd.width; val h = hd.height
    val outFrame = w * h * 3
    val frames = hd.frameOffsets.map { off =>
      val out = new Array[Byte](outFrame)
      var y = 0
      while (y < h) {
        val srcRow = off + (if (hd.topDown) y else h - 1 - y) * hd.wireStride
        var x = 0
        while (x < w) {
          val s = srcRow + x * 3 // wire BGR → out RGB
          val d = (y * w + x) * 3
          out(d) = b(s + 2); out(d + 1) = b(s + 1); out(d + 2) = b(s)
          x += 1
        }
        y += 1
      }
      out
    }
    Decoded(w, h, hd.fpsNum, hd.fpsDen, frames.toIndexedSeq)
  }
}

/** Container metadata of an uncompressed AVI payload as
  * `struct<width:int, height:int, fps_num:int, fps_den:int,
  * n_frames:int>` (fps = fps_num/fps_den, the strh dwRate/dwScale
  * pair — kept as the exact rational, never a lossy float; n_frames
  * counts the PHYSICAL frame chunks, not the header's claim). NULL
  * for non-AVI / unsupported / corrupt payloads ([[AviDecode]]
  * scope). */
case class AviMeta(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary, got $t")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("fps_num", IntegerType, nullable = false),
    StructField("fps_den", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_meta"
  override protected def nullSafeEval(input: Any): Any = {
    // Header-only walk — metadata never materializes a pixel buffer.
    val hd = AviDecode.header(input.asInstanceOf[Array[Byte]])
    if (hd == null) null
    else InternalRow(hd.width, hd.height, hd.fpsNum, hd.fpsDen,
      hd.frameOffsets.length)
  }
  override protected def withNewChildInternal(newChild: Expression): AviMeta =
    copy(child = newChild)
}

/** One decoded frame of an uncompressed AVI as BINARY — top-down,
  * row-major, RGB-interleaved, the SAME layout as [[PngPixels]], so
  * still-image featurizers consume sampled frames unchanged. NULL
  * when the payload is out of [[AviDecode]] scope or the index is out
  * of range. Frame index is 0-based. */
case class AviFramePixels(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType | LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (binary, integral), got ($l, $r)")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_avi_frame"
  override protected def nullSafeEval(payload: Any, idx: Any): Any = {
    val d = AviDecode.decode(payload.asInstanceOf[Array[Byte]])
    if (d == null) return null
    val i = idx match { case l: Long => l; case n: Int => n.toLong }
    if (i < 0 || i >= d.frames.length) null else d.frames(i.toInt)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AviFramePixels =
    copy(left = newLeft, right = newRight)
}

/** Frame sampling + per-frame dHash in ONE container walk:
  * `array<struct<frame_idx:int, dhash:long>>` for frames 0, stride,
  * 2·stride, … — the video near-dup frontier
  * ([[graft.operators.Multimodal.videoNearDupPairs]]) without the
  * quadratic decode the composed form
  * (`ImageDHash64(AviFramePixels(payload, f), …)` per exploded frame
  * row) pays: that shape re-runs the full container decode once per
  * sampled frame (1 + f/stride passes per video), this one walks the
  * container ONCE and never allocates a frame buffer at all — dHash
  * needs only 72 samples per frame, read straight from the wire
  * (padded bottom-up BGR), exploiting that [[ImageDHash64]]'s luma
  * ⌊(c0+c1+c2)/3⌋ is channel-order-invariant and its NN floor grid
  * maps to wire rows by the same top-down flip [[AviDecode.decode]]
  * applies. Bit-identical to the composed form by construction
  * (pinned by AviSpec's equivalence test). NULL when the payload is
  * out of [[AviDecode]] scope or stride < 1; empty array when the
  * container holds zero frame chunks. */
case class AviFrameDHashes(left: Expression, right: Expression)
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
  override def prettyName: String = "graft_avi_frame_dhashes"

  private final val GridW = 9
  private final val GridH = 8

  override protected def nullSafeEval(payload: Any, strideAny: Any): Any = {
    val stride = strideAny match { case l: Long => l; case n: Int => n.toLong }
    if (stride < 1) return null
    val b = payload.asInstanceOf[Array[Byte]]
    val hd = AviDecode.header(b)
    if (hd == null) return null
    val w = hd.width; val h = hd.height
    // Wire offset of the NN-sampled source pixel for grid cell
    // (gx, gy) of the frame at `off` — the same floor rule as
    // ImageDHash64 (sy = ⌊gy·h/8⌋, sx = ⌊gx·w/9⌋ in the TOP-DOWN
    // frame), flipped to the wire's row order.
    def luma(off: Int, gx: Int, gy: Int): Int = {
      val sy = (gy.toLong * h / GridH).toInt
      val sx = (gx.toLong * w / GridW).toInt
      val s = off + (if (hd.topDown) sy else h - 1 - sy) * hd.wireStride + sx * 3
      // wire BGR; luma = ⌊(R+G+B)/3⌋ — order-free sum
      ((b(s) & 0xFF) + (b(s + 1) & 0xFF) + (b(s + 2) & 0xFF)) / 3
    }
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0L
    while (i < hd.frameOffsets.length) {
      val off = hd.frameOffsets(i.toInt)
      var hash = 0L
      var gy = 0
      while (gy < GridH) {
        var prev = luma(off, 0, gy)
        var gx = 0
        while (gx < GridW - 1) {
          val next = luma(off, gx + 1, gy)
          if (next > prev) hash |= 1L << (gy * 8 + gx)
          prev = next
          gx += 1
        }
        gy += 1
      }
      out += InternalRow(i.toInt, hash)
      i += stride
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AviFrameDHashes =
    copy(left = newLeft, right = newRight)
}

/** Frame sampling + per-frame brightness in one pass:
  * `array<struct<frame_idx:long, mean:double>>` for frames 0, stride,
  * 2·stride, … — the "sample frames, featurize each" shape a video
  * curation pipeline runs, without materializing pixel buffers into
  * the row. Mean is over all RGB samples of the frame (∈ [0, 255]).
  * NULL when the payload is out of scope or stride < 1. */
case class AviFrameStats(left: Expression, right: Expression)
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
  override def prettyName: String = "graft_avi_frame_stats"
  override protected def nullSafeEval(payload: Any, strideAny: Any): Any = {
    val stride = strideAny match { case l: Long => l; case n: Int => n.toLong }
    if (stride < 1) return null
    val b = payload.asInstanceOf[Array[Byte]]
    val hd = AviDecode.header(b)
    if (hd == null) return null
    // Sum wire bytes directly (row padding excluded) — a mean is
    // row-order- and channel-order-free, so no frame buffer is ever
    // allocated and only SAMPLED frames are touched.
    val rowBytes = hd.width * 3
    val nSamples = hd.width.toLong * hd.height * 3
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0L
    while (i < hd.frameOffsets.length) {
      val off = hd.frameOffsets(i.toInt)
      var sum = 0L
      var y = 0
      while (y < hd.height) {
        val row = off + y * hd.wireStride
        var j = 0
        while (j < rowBytes) { sum += b(row + j) & 0xFF; j += 1 }
        y += 1
      }
      out += InternalRow(i, sum.toDouble / nSamples)
      i += stride
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AviFrameStats =
    copy(left = newLeft, right = newRight)
}
