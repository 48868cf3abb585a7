package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Nearest-neighbor image resize over a RAW PIXEL BUFFER — the
  * model-input normalization step (every vision encoder wants a fixed
  * H×W) applied to the byte layout every decoder in this library
  * emits: top-down, row-major, channel-interleaved, 8-bit
  * ([[PngPixels]], [[JpegPixels]], [[AviFramePixels]] all share it —
  * decode any still or sampled frame, resize, pack).
  *
  * Mapping (the standard floor rule): output (x, y) reads source
  * pixel (⌊x·sw/tw⌋, ⌊y·sh/th⌋) — pure integer arithmetic, no
  * filtering kernel, so the result is bit-deterministic and
  * oracle-checkable cross-engine (interpolating resizes are
  * float-kernel-specific; at 100 TB you resize billions of images
  * and want the cheap exact one for dedup/fingerprint paths anyway;
  * a learned pipeline can swap bilinear in at the same call site).
  *
  * Arguments: (pixels BINARY, srcW, srcH, channels, dstW, dstH) —
  * dims as integer expressions. NULL when the buffer length doesn't
  * equal srcW·srcH·channels, any dim is non-positive, or the OUTPUT
  * would exceed the 64 MiB guard shared with the decoders (an
  * upscale bomb is as real as a decompression bomb).
  */
case class ImageResizeNN(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.length != 6)
      return TypeCheckResult.TypeCheckFailure(s"$prettyName expects 6 arguments")
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

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_resize_nn"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val pixAny = children.head.eval(input)
    if (pixAny == null) return null
    val dims = children.tail.map { c =>
      val v = c.eval(input)
      if (v == null) return null
      v match { case i: Int => i.toLong; case l: Long => l; case s: Short => s.toLong; case b: Byte => b.toLong }
    }
    val Seq(sw, sh, ch, tw, th) = dims
    if (sw <= 0 || sh <= 0 || ch <= 0 || tw <= 0 || th <= 0) return null
    val pix = pixAny.asInstanceOf[Array[Byte]]
    if (pix.length.toLong != sw * sh * ch) return null // layout contract violated
    val outLen = tw * th * ch
    if (outLen > PngDecode.MaxRawBytes) return null // upscale bomb guard
    val out = new Array[Byte](outLen.toInt)
    var y = 0
    while (y < th) {
      val syRow = (y * sh / th) * sw // floor rule; all Longs
      var x = 0
      while (x < tw) {
        val src = ((syRow + x * sw / tw) * ch).toInt
        val dst = ((y.toLong * tw + x) * ch).toInt
        var c = 0
        while (c < ch) { out(dst + c) = pix(src + c); c += 1 }
        x += 1
      }
      y += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ImageResizeNN = copy(children = newChildren)
}
