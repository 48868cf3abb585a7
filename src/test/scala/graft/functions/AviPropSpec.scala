package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, IntegerType}

import graft.SparkSpec
import graft.operators.Multimodal

/** Randomized pin of the one-pass video fingerprint frontier: for
  * random container shapes (dims straddling the 9×8 dHash grid, both
  * row orders, random strides and pixel formulas),
  * [[AviFrameDHashes]] must be BIT-IDENTICAL, frame for frame, to the
  * composed form it replaced — `ImageDHash64` over each
  * [[AviDecode.decode]]d frame. Pure expression evals (Literal
  * children), no Spark jobs — the AviSpec equivalence test covers the
  * Column path on fixed fixtures; this covers the shape space. */
class AviPropSpec extends SparkSpec {

  private def onePass(avi: Array[Byte], stride: Int): Seq[(Int, Long)] = {
    val out = AviFrameDHashes(
      Literal(avi, BinaryType), Literal(stride, IntegerType)).eval(null)
    if (out == null) return null
    val arr = out.asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val row = arr.getStruct(i, 2)
      (row.getInt(0), row.getLong(1))
    }
  }

  private def composed(avi: Array[Byte], stride: Int): Seq[(Int, Long)] = {
    val d = AviDecode.decode(avi)
    if (d == null) return null
    (0 until d.frames.length by stride).map { f =>
      val h = ImageDHash64(Seq(
        Literal(d.frames(f), BinaryType),
        Literal(d.width, IntegerType), Literal(d.height, IntegerType),
        Literal(3, IntegerType))).eval(null).asInstanceOf[Long]
      (f, h)
    }
  }

  test("AviFrameDHashes == ImageDHash64 over decoded frames for random shapes") {
    val gen = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 30)
      nf <- Gen.chooseNum(0, 12)
      topDown <- Gen.oneOf(true, false)
      stride <- Gen.chooseNum(1, 5)
      a <- Gen.chooseNum(1, 97)
      b <- Gen.chooseNum(1, 89)
      c <- Gen.chooseNum(0, 50)
    } yield (w, h, nf, topDown, stride, a, b, c)
    val prop = Prop.forAll(gen) { case (w, h, nf, topDown, stride, a, b, cc) =>
      val avi = Multimodal.encodeAvi(w, h, nf,
        (f, x, y, c) => (x * a + y * b + c * 37 + f * 41 + cc) % 211,
        topDown = topDown)
      onePass(avi, stride) == composed(avi, stride)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("segment audio hashes == whole-clip kernel over each segment range (random clips)") {
    val gen = for {
      ch <- Gen.chooseNum(1, 3)
      nf <- Gen.chooseNum(0, 900)
      seg <- Gen.chooseNum(65, 300)
      a <- Gen.chooseNum(1, 197)
      off <- Gen.chooseNum(0, 999)
    } yield (ch, nf, seg, a, off)
    val prop = Prop.forAll(gen) { case (ch, nf, seg, a, off) =>
      val wav = Multimodal.encodeWav(ch, 8000, nf,
        (c, f) => ((f * a + c * 17 + off) % 4001) - 2000)
      val out = AudioSegmentDHashes(
        Literal(wav, BinaryType), Literal(seg, IntegerType)).eval(null)
      val d = WavDecode.decode(wav)
      if (d == null) out == null
      else {
        val arr = out.asInstanceOf[ArrayData]
        val got = (0 until arr.numElements()).map { i =>
          val r = arr.getStruct(i, 2); (r.getInt(0), r.getLong(1))
        }
        // local reference: every full-or-≥65-frame segment range
        // through the SAME extracted kernel the whole-clip hash uses
        val want = Iterator.from(0)
          .map(s => (s, s * seg, math.min(s * seg + seg, d.nFrames)))
          .takeWhile { case (_, from, _) => from + AudioEnvelope.Windows <= d.nFrames }
          .map { case (s, from, to) =>
            (s, AudioEnvelope.hashRange(d.samples, d.channels, from, to))
          }.toSeq
        got == want
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }
}
