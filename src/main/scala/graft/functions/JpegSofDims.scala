package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native codegen'd JPEG dimension decode: a BOUNDED walk over the
  * segment chain to the first SOF (start-of-frame) marker, which
  * carries the image height/width/component count (ITU T.81 §B.2.2 —
  * the public JPEG interchange format spec).
  *
  * Why a native expression and not `when`/`substr` like the PNG/BMP
  * decoders ([[graft.operators.Multimodal.imageMeta]]): JPEG's SOF
  * sits at a VARIABLE offset behind arbitrarily-sized APPn/DQT/COM
  * segments, so the walk's step-N offset is a function of step-N−1's.
  * A declarative unroll re-references the previous offset several
  * times per step (marker read, length read, bounds check), so the
  * expression tree grows exponentially with walk depth; a 30-line
  * loop inside whole-stage codegen is the same per-row cost as the
  * fixed-offset decoders, with none of the blowup.
  *
  * Walk semantics (bounded at 64 marker steps — real files reach SOF
  * within ~8 segments; Exif/ICC APPn blocks are skipped in one step
  * via their length field):
  *  - FF fill bytes before a marker are legal padding (§B.1.1.2);
  *  - standalone markers (TEM, RST0–7, SOI) have no length field;
  *  - SOF is any of C0–C3, C5–C7, C9–CB, CD–CF (C4/C8/CC are
  *    DHT/JPG/DAC, which also carry lengths but no dimensions);
  *  - SOS (DA) or EOI (D9) before any SOF, a lost FF sync, a
  *    truncated segment, or walk exhaustion → NULL (honest absence,
  *    never stub arithmetic).
  *
  * Returns `array<long>` [width, height, channels] — NULL on any
  * non-JPEG payload, so callers can branch without re-sniffing. */
case class JpegSofDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_sof"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val n = b.length
    def u(i: Int): Int = b(i) & 0xFF
    if (n < 4 || u(0) != 0xFF || u(1) != 0xD8 || u(2) != 0xFF) return null
    var off = 2
    var steps = 0
    while (steps < 64 && off + 1 < n) {
      steps += 1
      if (u(off) != 0xFF) return null // lost marker sync
      val marker = u(off + 1)
      if (marker == 0xFF) { off += 1 } // fill byte padding
      else if (marker == 0xD8 || marker == 0x01 ||
        (marker >= 0xD0 && marker <= 0xD7)) { off += 2 } // standalone
      else if (marker == 0xDA || marker == 0xD9) return null // SOS/EOI first
      else if (off + 3 >= n) return null // truncated length field
      else {
        val segLen = (u(off + 2) << 8) | u(off + 3)
        if (segLen < 2) return null
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (off + 9 >= n || segLen < 8) return null // truncated SOF
          val h = ((u(off + 5) << 8) | u(off + 6)).toLong
          val w = ((u(off + 7) << 8) | u(off + 8)).toLong
          val c = u(off + 9).toLong
          return new GenericArrayData(Array(w, h, c))
        }
        off += 2 + segLen
      }
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val segLen = ctx.freshName("segLen")
      val sof = ctx.freshName("sof")
      val w = ctx.freshName("w")
      val h = ctx.freshName("h")
      val c = ctx.freshName("c")
      s"""
        |final byte[] $b = $a;
        |final int $n = $b.length;
        |${ev.isNull} = true;
        |if ($n >= 4 && ($b[0] & 0xFF) == 0xFF && ($b[1] & 0xFF) == 0xD8
        |    && ($b[2] & 0xFF) == 0xFF) {
        |  int $off = 2;
        |  for (int $s = 0; $s < 64 && $off + 1 < $n; $s++) {
        |    if (($b[$off] & 0xFF) != 0xFF) break;
        |    final int $m = $b[$off + 1] & 0xFF;
        |    if ($m == 0xFF) { $off += 1; continue; }
        |    if ($m == 0xD8 || $m == 0x01 || ($m >= 0xD0 && $m <= 0xD7)) {
        |      $off += 2; continue;
        |    }
        |    if ($m == 0xDA || $m == 0xD9 || $off + 3 >= $n) break;
        |    final int $segLen = (($b[$off + 2] & 0xFF) << 8) | ($b[$off + 3] & 0xFF);
        |    if ($segLen < 2) break;
        |    final boolean $sof = $m >= 0xC0 && $m <= 0xCF
        |      && $m != 0xC4 && $m != 0xC8 && $m != 0xCC;
        |    if ($sof) {
        |      if ($off + 9 < $n && $segLen >= 8) {
        |        final long $h = (($b[$off + 5] & 0xFFL) << 8) | ($b[$off + 6] & 0xFFL);
        |        final long $w = (($b[$off + 7] & 0xFFL) << 8) | ($b[$off + 8] & 0xFFL);
        |        final long $c = $b[$off + 9] & 0xFFL;
        |        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        |          new long[]{$w, $h, $c});
        |        ${ev.isNull} = false;
        |      }
        |      break;
        |    }
        |    $off += 2 + $segLen;
        |  }
        |}
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JpegSofDims =
    copy(child = newChild)
}
