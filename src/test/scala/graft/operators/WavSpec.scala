package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.WavDecode

/** WAV PCM sample decoder: a GOLDEN container hand-assembled from the
  * public RIFF/WAVE spec (with an odd-length LIST chunk BEFORE 'data'
  * — proves chunk walking + even padding, where fixed-offset peeks
  * misread), encode→decode round trips, and the honesty guards.
  */
class WavSpec extends SparkSpec {

  /** mono / 3 frames / 8 kHz / samples [100, −200, 32767]; LIST('INFOx')
    * precedes 'data'. Hand-assembled, independent of encodeWav. */
  private val Golden =
    "524946463800000057415645666d74201000000001000100401f0000803e0000020010004c49535405000000494e464f78006461746106000000640038ffff7f"

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("golden container: chunk walk past the LIST, exact samples") {
    val d = WavDecode.decode(hex(Golden))
    assert(d != null, "golden WAV must decode")
    assert(d.channels == 1 && d.sampleRate == 8000 && d.nFrames == 3)
    assert(d.samples.toSeq == Seq[Short](100, -200, 32767))
  }

  test("golden container through the stats column: exact mean and RMS") {
    import spark.implicits._
    val st = Seq(hex(Golden)).toDF("payload")
      .select(Multimodal.audioSampleStats(col("payload")))
      .head().getSeq[Double](0)
    assert(st(0) == 1.0 && st(1) == 8000.0 && st(2) == 3.0)
    assert(st(3) == (100.0 - 200.0 + 32767.0) / 3)
    assert(st(4) == math.sqrt((100.0 * 100 + 200.0 * 200 + 32767.0 * 32767) / 3))
  }

  test("wavSamples binary: big-endian %04x dump of the golden samples") {
    import spark.implicits._
    val hx = Seq(hex(Golden)).toDF("payload")
      .select(lower(org.apache.spark.sql.functions.hex(
        graft.functions.GraftFunctions.wavSamples(col("payload")))))
      .head().getString(0)
    // samples 100, −200, 32767 → 0064 ff38 7fff (two's complement)
    assert(hx == "0064ff387fff")
  }

  test("encode→decode round trip: stereo interleave preserved") {
    def s(c: Int, t: Int) = (t * 1000 + c * 7) - 1500
    val d = WavDecode.decode(Multimodal.encodeWav(2, 44100, 4, s))
    assert(d != null && d.channels == 2 && d.sampleRate == 44100 && d.nFrames == 4)
    for (t <- 0 until 4; c <- 0 until 2)
      assert(d.samples(t * 2 + c) == s(c, t).toShort, s"frame $t ch $c")
  }

  test("out-of-scope payloads → NULL: float PCM, 8-bit, truncated, non-WAV") {
    val ok = Multimodal.encodeWav(1, 8000, 5, (_, t) => t)
    assert(WavDecode.decode(ok) != null)
    assert(WavDecode.decode(ok.take(30)) == null, "truncated")
    assert(WavDecode.decode("RIFFxxxxWAVE".getBytes) == null, "no chunks")
    assert(WavDecode.decode("not audio at all".getBytes) == null)
    // flip audioFormat (fmt data offset +0) to 3 = IEEE float
    val fmtAt = ok.indexOfSlice("fmt ".getBytes)
    val flt = ok.clone(); flt(fmtAt + 8) = 3
    assert(WavDecode.decode(flt) == null, "float PCM must refuse, not garble")
    // flip bitsPerSample (fmt data +14) to 8
    val b8 = ok.clone(); b8(fmtAt + 8 + 14) = 8
    assert(WavDecode.decode(b8) == null, "8-bit must refuse")
  }

  test("declared data length beyond the buffer → NULL (bomb stance)") {
    val ok = Multimodal.encodeWav(1, 8000, 5, (_, t) => t)
    val dataAt = ok.indexOfSlice("data".getBytes)
    val bomb = ok.clone()
    // claim 0x7FFFFF0 bytes of samples in a ~60-byte payload
    for ((v, i) <- Seq(0xF0, 0xFF, 0xFF, 0x07).zipWithIndex)
      bomb(dataAt + 4 + i) = v.toByte
    assert(WavDecode.decode(bomb) == null)
  }
}
