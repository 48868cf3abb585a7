package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Pure-JVM WAV PCM sample decoder — upgrades the audio family from
  * header metadata ([[graft.operators.Multimodal.audioMeta]]) to REAL
  * sample access, completing the media triple (PNG/JPEG pixels, AVI
  * frames, WAV samples) with no codec dependency.
  *
  * Wire format per the public RIFF/WAVE spec (little-endian,
  * even-padded chunks): 'RIFF' u32 'WAVE' { 'fmt ' (audioFormat u16,
  * channels u16, sampleRate u32, byteRate u32, blockAlign u16,
  * bitsPerSample u16), 'data' (interleaved frames), … }. A proper
  * chunk WALK, not fixed offsets — real encoders interleave LIST/
  * fact/cue chunks before 'data', where offset-35 header peeks
  * silently misread.
  *
  * Scope: PCM (format 1), 16-bit signed LE, 1–8 channels — the
  * interchange form every transcoder emits. Float/ADPCM/24-bit
  * return NULL (honest absence). Declared sizes are length-checked
  * against the physical buffer and decoded volume is capped at 64 MiB
  * before allocation (same bomb stance as the image/video decoders).
  */
private[graft] object WavDecode {
  val MaxRawBytes: Long = 64L * 1024 * 1024

  final case class Decoded(
      channels: Int, sampleRate: Int, nFrames: Int, samples: Array[Short]) // interleaved

  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Decode or null. Never throws on malformed input. */
  def decode(b: Array[Byte]): Decoded = {
    if (b == null || b.length < 44) return null
    if (fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WAVE") return null
    var channels, sampleRate, bits = -1
    var fmtCode = -1
    var dataOff, dataLen = -1
    var pos = 12
    var chunks = 0
    while (pos + 8 <= b.length && chunks < 10000) {
      chunks += 1
      val id = fourcc(b, pos)
      val len = leU32(b, pos + 4)
      val off = pos + 8
      if (len > Int.MaxValue - 16 || off + len > b.length) return null
      id match {
        case "fmt " =>
          if (len < 16) return null
          fmtCode = leU16(b, off)
          channels = leU16(b, off + 2)
          sampleRate = leU32(b, off + 4).toInt
          bits = leU16(b, off + 14)
        case "data" => dataOff = off; dataLen = len.toInt
        case _ => () // LIST/fact/cue/bext — irrelevant to PCM samples
      }
      pos = off + len.toInt + (len.toInt & 1) // even padding
    }
    if (fmtCode != 1 || bits != 16) return null
    if (channels < 1 || channels > 8 || sampleRate <= 0) return null
    if (dataOff < 0 || dataLen < 0) return null
    if (dataLen > MaxRawBytes) return null
    val nSamples = dataLen / 2
    val nFrames = nSamples / channels
    val out = new Array[Short](nFrames * channels) // trailing partial frame dropped
    var i = 0
    while (i < out.length) {
      out(i) = ((b(dataOff + 2 * i) & 0xFF) | (b(dataOff + 2 * i + 1) << 8)).toShort
      i += 1
    }
    Decoded(channels, sampleRate, nFrames, out)
  }
}

/** Decoded PCM samples of a WAV payload as BINARY: interleaved i16
  * samples in BIG-endian byte order — so `hex()` of the buffer reads
  * as the canonical per-sample `%04x` dump (two's complement), the
  * form content fingerprints and oracles compare. NULL outside
  * [[WavDecode]] scope. */
case class WavSamples(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary, got $t")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_samples"
  override protected def nullSafeEval(input: Any): Any = {
    val d = WavDecode.decode(input.asInstanceOf[Array[Byte]])
    if (d == null) return null
    val out = new Array[Byte](d.samples.length * 2)
    var i = 0
    while (i < d.samples.length) {
      out(2 * i) = (d.samples(i) >> 8).toByte
      out(2 * i + 1) = d.samples(i).toByte
      i += 1
    }
    out
  }
  override protected def withNewChildInternal(newChild: Expression): WavSamples =
    copy(child = newChild)
}

/** PCM sample statistics of a WAV payload as `array<double>`:
  * `[channels, sample_rate, n_frames, mean_ch1…N, rms_ch1…N]` — the
  * silence / clipping / level signal an audio curation pass gates on,
  * computed in one decode pass without materializing samples into the
  * row (the [[PngPixelStats]] shape for audio). Means and RMS divide
  * EXACT integer sums once and (for RMS) take one sqrt, so the
  * doubles are bit-deterministic cross-engine. NULL outside
  * [[WavDecode]] scope. */
case class WavSampleStats(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects binary, got $t")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_stats"
  override protected def nullSafeEval(input: Any): Any = {
    val d = WavDecode.decode(input.asInstanceOf[Array[Byte]])
    if (d == null) return null
    val ch = d.channels
    val sums = new Array[Long](ch)
    val sumSqs = new Array[Long](ch)
    var i = 0
    while (i < d.samples.length) {
      val v = d.samples(i).toLong
      sums(i % ch) += v
      sumSqs(i % ch) += v * v
      i += 1
    }
    val out = new Array[Double](3 + 2 * ch)
    out(0) = ch.toDouble; out(1) = d.sampleRate.toDouble; out(2) = d.nFrames.toDouble
    var c = 0
    while (c < ch) {
      val n = math.max(d.nFrames, 1).toDouble
      out(3 + c) = sums(c).toDouble / n
      out(3 + ch + c) = math.sqrt(sumSqs(c).toDouble / n)
      c += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): WavSampleStats =
    copy(child = newChild)
}
