package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Randomized reference-equivalence for the round-14 operators:
  * decontamination removal and cluster-balanced sampling, each
  * checked against a straight-line local implementation on
  * tiny-vocabulary / low-dimension inputs that force real
  * collisions. (ScalaCheck driven directly — the scalatestplus
  * bridge is not in the offline artifact cache.) */
class DecontaminatePropSpec extends SparkSpec {

  private val wordGen = Gen.oneOf("a", "b", "c", "d")
  private def docGen(maxLen: Int): Gen[String] =
    Gen.chooseNum(1, maxLen).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))

  // local mirror of Dedup.tokens + wordShinglesFromTokens: split on
  // single spaces, n-token windows joined by a space, distinct
  private def grams(text: String, n: Int): Set[String] = {
    val toks = text.split(" ", -1)
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  test("decontaminate agrees with a local shared-gram reference") {
    import spark.implicits._
    val n = 3
    val corpusGen = for {
      nt <- Gen.chooseNum(1, 6)
      train <- Gen.listOfN(nt, docGen(10))
      nh <- Gen.chooseNum(0, 3)
      held <- Gen.listOfN(nh, docGen(10))
    } yield (train, held)
    val prop = Prop.forAll(corpusGen) { case (trainTexts, heldTexts) =>
      val train = trainTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val held = heldTexts.zipWithIndex.map { case (t, i) => (100L + i, t) }
      val heldGrams = held.flatMap(d => grams(d._2, n)).toSet
      val expect = train.filter(d => grams(d._2, n).forall(!heldGrams(_)))
        .map(_._1).toSet
      val got = Fingerprint.decontaminate(
        train.toDF("doc_id", "text"), held.toDF("doc_id", "text"),
        "doc_id", "text", n)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("cellBalancedSample agrees with a local argmax + md5-rank reference") {
    import spark.implicits._
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    // 2-d unit-ish vectors from a small angle grid: ties in cosine are
    // possible (same angle), exercising the (−cos, cent) tie-break
    val angleGen = Gen.chooseNum(0, 7).map(a => math.Pi * a / 8)
    val corpusGen = for {
      nv <- Gen.chooseNum(1, 12)
      angles <- Gen.listOfN(nv, angleGen)
      k <- Gen.chooseNum(1, 4)
    } yield (angles, k)
    val cents = Seq(
      0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.7071f, 0.7071f), 2L -> Seq(0.0f, 1.0f))
    val prop = Prop.forAll(corpusGen) { case (angles, k) =>
      val vecs = angles.zipWithIndex.map { case (a, i) =>
        (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat))
      }
      // local reference: float-kernel cosine argmax (double accumulation
      // like the fused expression), then md5('s:'+id) rank per cell
      def cos(x: Seq[Float], y: Seq[Float]): Double = {
        val dot = x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
        val nx = math.sqrt(x.map(p => p.toDouble * p.toDouble).sum)
        val ny = math.sqrt(y.map(q => q.toDouble * q.toDouble).sum)
        dot / (nx * ny)
      }
      val assign = vecs.map { case (id, v) =>
        id -> cents.map { case (cid, cv) => (-cos(v, cv), cid) }.min._2
      }.toMap
      val expect = assign.groupBy(_._2).flatMap { case (_, members) =>
        members.keys.toSeq
          .sortBy(id => (md5hex(s"s:$id"), id.toString)).take(k)
      }.toSet
      val got = Similarity.cellBalancedSample(
        vecs.toDF("vec_id", "embedding")
          .withColumn("embedding",
            org.apache.spark.sql.functions.col("embedding").cast("array<float>")),
        "vec_id", "embedding",
        cents.toDF("vec_id", "embedding")
          .withColumn("embedding",
            org.apache.spark.sql.functions.col("embedding").cast("array<float>")),
        "vec_id", "embedding", perCellK = k, salt = "s")
        .select("id").collect().map(_.getLong(0)).toSet
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
