package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized invariants for the round-12 selection operators:
  * weighted sampling (A-ES min-of-draws) and DSIR importance
  * selection. Straight-line local references are the oracle
  * (ScalaCheck driven directly — the scalatestplus bridge is not in
  * the offline artifact cache). */
class SamplingPropSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("weightedSampleK equals the local A-ES reference on random corpora") {
    import spark.implicits._
    val rowsGen = Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-2, 12)).map(ws =>
        ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }))
    val prop = Prop.forAll(rowsGen, Gen.chooseNum(1, 8)) { (rows, k) =>
      val local = rows.map { case (id, w) =>
        val cw = math.min(math.max(w, 1), 8)
        id -> (0 until cw).map(c => md5hex(s"p:$id:$c")).min
      }.sortBy { case (id, d) => (d, id) }.take(k)
      val got = Sampling.weightedSampleK(
        rows.toDF("id", "w"), "id", col("w"), k = k, salt = "p")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
      got == local
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("weightedSampleK: raising one unit's weight never evicts it (monotone)") {
    import spark.implicits._
    // extra draws can only LOWER a unit's min draw, and other units'
    // draws are untouched (hash inputs don't involve w) — so a
    // sampled unit stays sampled when only its own weight rises
    val rows = (1L to 20L).map(i => (i, 2))
    val base = Sampling.weightedSampleK(
      rows.toDF("id", "w"), "id", col("w"), k = 5, salt = "m")
      .select("id").as[Long].collect().toSet
    val bumped = rows.map { case (id, w) => (id, if (base(id)) 8 else w) }
    val after = Sampling.weightedSampleK(
      bumped.toDF("id", "w"), "id", col("w"), k = 5, salt = "m")
      .select("id").as[Long].collect().toSet
    assert(base.subsetOf(after))
    assert(after === base) // k unchanged ⇒ same set, possibly reordered
  }

  test("DSIR affinity matches a local reference and resample is a subset") {
    import spark.implicits._
    val dim = 32
    def bucketOf(g: String): Long =
      java.lang.Long.parseLong(md5hex(s"dsir:$g").take(8), 16) % dim
    val wordGen = Gen.oneOf("a", "b", "c", "d", "e")
    val docGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, docGen))
    val prop = Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      def grams(t: String): Seq[String] = {
        val tk = t.split(" ", -1)
        if (tk.length < 2) Seq.empty
        else tk.sliding(2).map(_.mkString(" ")).toSeq
      }
      // local counts: target = even ids
      val occ = docs.flatMap { case (id, t) =>
        grams(t).map(g => (bucketOf(g), id % 2 == 0))
      }
      val counts = occ.groupBy(_._1).map { case (b, os) =>
        b -> (os.count(_._2).toLong, os.size.toLong)
      }
      val expect = docs.map { case (id, t) =>
        val bs = grams(t).map(bucketOf)
        val st = bs.map(b => counts(b)._1).sum
        val sr = bs.map(b => counts(b)._2).sum
        id -> ((st, sr, (st + 1).toDouble / (sr + 1)))
      }.toMap
      val df = docs.toDF("doc_id", "text")
      val trained = Importance.targetAffinityCounts(
        df, "doc_id", "text", isTarget = col("doc_id") % 2 === 0,
        n = 2, dim = dim, salt = "dsir")
      val scored = Importance.scoreAffinity(
        df, "doc_id", "text", trained, n = 2, dim = dim, salt = "dsir")
      val got = scored.select("doc_id", "sum_tgt", "sum_raw", "affinity")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val kept = Importance.resampleByAffinity(scored, "doc_id")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      got == expect && kept.subsetOf(docs.map(_._1).toSet)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
