package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Randomized reference-equivalence for the round-8 curation
  * operators: tiny-vocabulary corpora force real span/gram collisions,
  * and a straight-line local implementation is the oracle. (ScalaCheck
  * driven directly — the scalatestplus bridge is not in the offline
  * artifact cache.) */
class CurationPropSpec extends SparkSpec {

  private val wordGen = Gen.oneOf("a", "b", "c", "d")
  private def docGen(maxLen: Int): Gen[String] =
    Gen.chooseNum(1, maxLen).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))

  test("spanDupStats agrees with a local first-occurrence reference") {
    import spark.implicits._
    val corpusGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, docGen(12)))
    val size = 2
    val prop = Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // local reference: non-overlapping spans in (doc, idx) order,
      // first occurrence of each span text is canonical
      val occ = docs.flatMap { case (id, t) =>
        t.split(" ", -1).grouped(size).zipWithIndex
          .map { case (w, idx) => (id, idx.toLong, w.mkString(" ")) }
      }
      val firstOf = occ.groupBy(_._3).map { case (sp, os) =>
        sp -> os.map(o => (o._1, o._2)).min
      }
      val expect = occ.groupBy(_._1).map { case (id, os) =>
        val nDup = os.count(o => firstOf(o._3) != ((o._1, o._2)))
        id -> (os.size.toLong, nDup.toLong)
      }
      val got = Dedup.spanDupStats(
        docs.toDF("doc_id", "text"), "doc_id", "text", size, maxDupFrac = 0.5)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("dupSpans agrees with a local sliding-window + island-merge reference") {
    import spark.implicits._
    val k = 3
    val corpusGen = Gen.chooseNum(2, 6).flatMap(n => Gen.listOfN(n, docGen(14)))
    val prop = Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // local reference: stride-1 windows, corpus-wide (id, start)
      // first occurrence unmarked, merge overlapping/touching starts
      val wins = docs.flatMap { case (id, t) =>
        val toks = t.split(" ", -1)
        (0 to toks.length - k).map(i =>
          (id, i.toLong, toks.slice(i, i + k).mkString(" ")))
      }
      val byText = wins.groupBy(_._3)
      val marked = wins.filter { w =>
        val os = byText(w._3)
        os.size > 1 && os.map(o => (o._1, o._2)).min != ((w._1, w._2))
      }
      val expect = marked.groupBy(_._1).toSeq.flatMap { case (id, ms) =>
        val sorted = ms.map(_._2).sorted
        val islands = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        sorted.foreach { s =>
          val e = s + k - 1
          if (islands.nonEmpty && s <= islands.last._2 + 1)
            islands(islands.size - 1) = (islands.last._1, math.max(islands.last._2, e))
          else islands += ((s, e))
        }
        islands.map { case (s, e) => (id, s, e, e - s + 1) }
      }.toSet
      val got = Dedup.dupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("boilerplateNgrams agrees with a local counting reference") {
    import spark.implicits._
    val corpusGen = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, docGen(10)))
    val n = 2
    val prop = Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val grams = docs.flatMap { case (id, t) =>
        val w = t.split(" ", -1)
        if (w.length < n) Nil else w.sliding(n).map(g => (id, g.mkString(" "))).toList
      }
      val expect = grams.groupBy(_._2).view
        .mapValues(os => (os.map(_._1).distinct.size.toLong, os.size.toLong))
        .filter(_._2._1 >= 2).toMap
      val got = TextAnalysis.boilerplateNgrams(
        docs.toDF("doc_id", "text"), "doc_id", "text", n, minDocs = 2, k = 1000)
        .collect().map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("bpePairCounts agrees with a local pair-counting reference") {
    import spark.implicits._
    val prop = Prop.forAll(Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, docGen(8)))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val pairs = docs.flatMap(_._2.split(" ", -1).toList)
        .filter(_.length >= 2)
        .flatMap(w => (0 until w.length - 1).map(i => w.substring(i, i + 2)))
      val expect = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = TextAnalysis.bpePairCounts(docs.toDF("doc_id", "text"), "text", k = 1000)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("ngramContamination agrees with a local distinct-gram reference") {
    import spark.implicits._
    val corpusGen = Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, docGen(8)))
    val n = 2
    val prop = Prop.forAll(corpusGen, corpusGen) { (trainTexts, heldTexts) =>
      def grams(t: String): Set[String] = {
        val w = t.split(" ", -1)
        if (w.length < n) Set.empty
        else w.sliding(n).map(_.mkString(" ")).toSet
      }
      val trainSet = trainTexts.flatMap(grams).toSet
      val expect = heldTexts.zipWithIndex.flatMap { case (t, i) =>
        val g = grams(t)
        if (g.isEmpty) None
        else Some((1000L + i) -> (g.size.toLong, g.count(trainSet).toLong))
      }.toMap
      val train = trainTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val held = heldTexts.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      val got = Fingerprint.ngramContamination(train, held, "doc_id", "text", n)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
