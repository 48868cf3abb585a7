package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** 64-bit perceptual difference hash (dHash) over a RAW PIXEL BUFFER
  * — the image fingerprint that makes pixel-level near-duplicate
  * detection a Hamming problem, feeding the SAME pigeonhole band join
  * the text simhash pipeline uses
  * ([[graft.operators.Dedup.simhashNearDupPairs]]'s extracted core).
  *
  * Pipeline per image, all integer arithmetic (bit-deterministic and
  * oracle-checkable cross-engine — the [[ImageResizeNN]] rationale):
  *  1. nearest-neighbor resample to a 9×8 grid with the library's
  *     floor rule — source pixel (⌊gx·w/9⌋, ⌊gy·h/8⌋); sampling the
  *     buffer directly (no intermediate resized image) because dHash
  *     needs only 72 of the pixels;
  *  2. integer luma per grid cell: channels=1 → the sample; =2 → the
  *     gray channel (alpha must not pollute brightness); ≥3 →
  *     ⌊(c0+c1+c2)/3⌋ over the color channels (RGB in every layout
  *     this library's decoders emit);
  *  3. bit gy·8+gx set ⇔ luma(gx+1, gy) > luma(gx, gy) — the
  *     horizontal brightness GRADIENT sign, which is invariant to
  *     uniform brightness shifts and (via step 1) to rescaling: the
  *     two edits a near-duplicate image most commonly carries.
  *
  * Arguments: (pixels BINARY, width, height, channels) in the shared
  * decoder layout (top-down, row-major, channel-interleaved, 8-bit).
  * NULL when pixels are NULL (undecodable payloads flow through), any
  * dim is non-positive, or the buffer length breaks the w·h·ch
  * contract. Images narrower/shorter than the grid are legal — the
  * floor rule just resamples pixels repeatedly, exactly like any NN
  * upscale. */
case class ImageDHash64(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.length != 4)
      return TypeCheckResult.TypeCheckFailure(s"$prettyName expects 4 arguments")
    children.head.dataType match {
      case BinaryType => ()
      case t => return TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary pixels, got $t")
    }
    val badDim = children.tail.find(c => c.dataType match {
      case ByteType | ShortType | IntegerType | LongType => false
      case _ => true
    })
    badDim match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName dims must be integral, got ${c.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_image_dhash"

  private final val GridW = 9
  private final val GridH = 8

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val pixAny = children.head.eval(input)
    if (pixAny == null) return null
    val dims = children.tail.map { c =>
      val v = c.eval(input)
      if (v == null) return null
      v match { case i: Int => i.toLong; case l: Long => l; case s: Short => s.toLong; case b: Byte => b.toLong }
    }
    val Seq(w, h, ch0) = dims
    if (w <= 0 || h <= 0) return null
    val pix = pixAny.asInstanceOf[Array[Byte]]
    // ch = −1 derives the channel count from the BUFFER: palette
    // formats (GIF, palette PNG) decode their index plane to expanded
    // RGB/RGBA, so the header's channel count is not the buffer's —
    // the buffer itself is the layout authority
    val ch =
      if (ch0 == -1L) {
        if (pix.length.toLong % (w * h) != 0) return null
        pix.length.toLong / (w * h)
      } else ch0
    if (ch <= 0) return null
    if (pix.length.toLong != w * h * ch) return null // layout contract violated
    // luma of the NN-sampled source pixel for grid cell (gx, gy)
    def luma(gx: Int, gy: Int): Int = {
      val base = (((gy * h / GridH) * w + gx.toLong * w / GridW) * ch).toInt
      if (ch >= 3)
        ((pix(base) & 0xFF) + (pix(base + 1) & 0xFF) + (pix(base + 2) & 0xFF)) / 3
      else pix(base) & 0xFF // gray / gray+alpha: channel 0 is the gray
    }
    var hash = 0L
    var gy = 0
    while (gy < GridH) {
      var prev = luma(0, gy)
      var gx = 0
      while (gx < GridW - 1) {
        val next = luma(gx + 1, gy)
        if (next > prev) hash |= 1L << (gy * 8 + gx)
        prev = next
        gx += 1
      }
      gy += 1
    }
    hash
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ImageDHash64 = copy(children = newChildren)
}
