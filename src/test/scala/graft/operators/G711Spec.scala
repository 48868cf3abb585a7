package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.WavDecode

/** G.711 µ-law / A-law WAV decode: golden code points pinned straight
  * from the public expansion tables, full-code-space sweeps, the
  * envelope kernel accepting G.711 clips unchanged (hash identity
  * with a PCM clip of the same decoded samples), and the AVI 'auds'
  * path carrying a G.711 soundtrack.
  */
class G711Spec extends SparkSpec {

  test("µ-law golden codes: 0x00→−32124, 0x80→+32124, 0xFF/0x7F→0") {
    assert(WavDecode.ulawToLinear(0x00) == -32124)
    assert(WavDecode.ulawToLinear(0x80) == 32124)
    assert(WavDecode.ulawToLinear(0xFF) == 0)
    assert(WavDecode.ulawToLinear(0x7F) == 0)
  }

  test("A-law golden codes: 0x55→−8, 0xD5→+8, 0x2A→−32256, 0xAA→+32256") {
    assert(WavDecode.alawToLinear(0x55) == -8)
    assert(WavDecode.alawToLinear(0xD5) == 8)
    assert(WavDecode.alawToLinear(0x2A) == -32256)
    assert(WavDecode.alawToLinear(0xAA) == 32256)
  }

  test("both laws: every code decodes to a sign-symmetric i16 table") {
    for (code <- 0 until 256) {
      val u = WavDecode.ulawToLinear(code).toInt
      val a = WavDecode.alawToLinear(code).toInt
      assert(u >= -32124 && u <= 32124, s"ulaw($code)=$u")
      assert(a >= -32256 && a <= 32256, s"alaw($code)=$a")
      // flipping the sign bit flips the sign (µ-law: |code with bit
      // 0x80 toggled| decodes to the negation; A-law likewise)
      assert(WavDecode.ulawToLinear(code ^ 0x80).toInt == -u, s"ulaw sign $code")
      assert(WavDecode.alawToLinear(code ^ 0x80).toInt == -a, s"alaw sign $code")
    }
  }

  test("wav decode: µ-law container yields the per-byte expansion") {
    def byteOf(c: Int, f: Int): Int = (f * 11 + c * 29) % 256
    val d = WavDecode.decode(Multimodal.encodeWavG711(2, 8000, 200, byteOf))
    assert(d != null && d.channels == 2 && d.sampleRate == 8000 && d.nFrames == 200)
    for (f <- 0 until 200; c <- 0 until 2)
      assert(d.samples(f * 2 + c) == WavDecode.ulawToLinear(byteOf(c, f)))
  }

  test("envelope kernel unchanged: G.711 clip hashes as its PCM twin") {
    import spark.implicits._
    def byteOf(c: Int, f: Int): Int = (f * 7 + c * 13) % 256
    val g711 = Multimodal.encodeWavG711(1, 8000, 640, byteOf)
    val alaw = Multimodal.encodeWavG711(1, 8000, 640, byteOf, aLaw = true)
    val pcmU = Multimodal.encodeWav(1, 8000, 640,
      (c, f) => WavDecode.ulawToLinear(byteOf(c, f)).toInt)
    val pcmA = Multimodal.encodeWav(1, 8000, 640,
      (c, f) => WavDecode.alawToLinear(byteOf(c, f)).toInt)
    val rows = Seq(0 -> g711, 1 -> pcmU, 2 -> alaw, 3 -> pcmA)
      .toDF("id", "payload")
      .select(col("id"),
        Multimodal.audioDHash(col("payload")).as("h"),
        Multimodal.audioSegmentDHashes(col("payload"), 128).as("sh"))
      .collect().sortBy(_.getInt(0))
    assert(!rows(0).isNullAt(1), "G.711 µ-law clip must fingerprint")
    assert(rows(0).getLong(1) == rows(1).getLong(1), "µ-law vs PCM whole-clip hash")
    assert(rows(2).getLong(1) == rows(3).getLong(1), "A-law vs PCM whole-clip hash")
    assert(rows(0).getSeq[Any](2) == rows(1).getSeq[Any](2), "µ-law segment hashes")
    assert(rows(2).getSeq[Any](2) == rows(3).getSeq[Any](2), "A-law segment hashes")
  }

  test("AVI 'auds' G.711 track: soundtrack hashes equal the WAV twin") {
    import spark.implicits._
    def byteOf(c: Int, f: Int): Int = (f * 19 + c * 31) % 256
    val avi = Multimodal.encodeAvi(8, 6, 3, (f, x, y, c) => (x + y + f + c) % 200,
      audioChannels = 2, audioRate = 8000, audioFrames = 500,
      audioSample = byteOf, audioG711ALaw = Some(false))
    val wav = Multimodal.encodeWavG711(2, 8000, 500, byteOf)
    val row = Seq((avi, wav)).toDF("avi", "wav")
      .select(
        Multimodal.videoAudioSegmentDHashes(col("avi"), 128).as("va"),
        Multimodal.audioSegmentDHashes(col("wav"), 128).as("wa"))
      .head()
    assert(!row.isNullAt(0), "AVI G.711 soundtrack must fingerprint")
    assert(row.getSeq[Any](0) == row.getSeq[Any](1))
  }
}
