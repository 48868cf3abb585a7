package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 64-bit perceptual audio fingerprint over a PCM WAV payload — the
  * audio member of the dHash family ([[ImageDHash64]] stills,
  * frame-composed video), completing fingerprint-based near-dup
  * across every media column this library decodes.
  *
  * Pipeline, all integer arithmetic (bit-deterministic and
  * oracle-checkable cross-engine):
  *  1. decode PCM frames ([[WavDecode]] — the audited chunk walk,
  *     16-bit/1–8ch scope, 64 MiB bomb guard);
  *  2. partition the frame axis into 65 floor-rule windows
  *     (boundary_w = ⌊w·n/65⌋ — the [[ImageDHash64]] grid rule on
  *     the time axis) and take each window's total absolute
  *     amplitude E_w summed over ALL channels (a mono energy
  *     envelope, no division anywhere);
  *  3. bit w set ⇔ the ENVELOPE RISES across the window boundary:
  *     E_{w+1}·len_w > E_w·len_{w+1} — cross-multiplied by the
  *     window lengths so unequal floor windows compare exactly
  *     (lengths differ by ≤1; no ratio, no rounding).
  *
  * The envelope-gradient sign is invariant to uniform GAIN (both
  * sides of every comparison scale together) — the audio analog of
  * dHash's brightness invariance, and the edit a re-encoded /
  * re-normalized duplicate clip actually carries. Overflow safety:
  * E_w ≤ (n/65+1)·ch·32768 and len ≤ n/65+1 with n·ch ≤ 2²⁵ (the
  * 64 MiB decode cap), so E·len < 2⁵⁴ — Long arithmetic is exact.
  *
  * NULL when the payload is not decodable PCM WAV or has fewer than
  * 65 frames (too short for one sample per window — no meaningful
  * envelope to fingerprint). */
case class AudioDHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary WAV payload, got $t")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_dhash"

  private final val Windows = 65

  override protected def nullSafeEval(payload: Any): Any = {
    val d = WavDecode.decode(payload.asInstanceOf[Array[Byte]])
    if (d == null || d.nFrames < Windows) return null
    val n = d.nFrames
    val ch = d.channels
    val e = new Array[Long](Windows)
    val len = new Array[Long](Windows)
    var w = 0
    while (w < Windows) {
      val from = (w.toLong * n / Windows).toInt
      val to = ((w + 1).toLong * n / Windows).toInt
      len(w) = to - from
      var acc = 0L
      var i = from * ch
      val end = to * ch
      while (i < end) {
        acc += math.abs(d.samples(i).toLong)
        i += 1
      }
      e(w) = acc
      w += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) {
      if (e(b + 1) * len(b) > e(b) * len(b + 1)) hash |= 1L << b
      b += 1
    }
    hash
  }

  override protected def withNewChildInternal(newChild: Expression): AudioDHash64 =
    copy(child = newChild)
}
