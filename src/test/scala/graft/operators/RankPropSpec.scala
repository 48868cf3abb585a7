package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized invariants for the round-16 total-order operators: the
  * local Scala sort is the oracle (ScalaCheck driven directly, the
  * SamplingPropSpec pattern). Generators deliberately produce heavy
  * key ties, negative keys, and key cardinalities both above and
  * below the bucket counts — the regimes the decompositions split
  * on. */
class RankPropSpec extends SparkSpec {
  import spark.implicits._

  private val corpusGen: Gen[List[(Long, Long)]] =
    Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-5L, 8L)).map(ks =>
        ks.zipWithIndex.map { case (k, i) => (i.toLong * 3 + 1, k) }))

  private def localRank(rows: List[(Long, Long)]): Seq[(Long, Long, Long)] =
    rows.sortBy { case (id, k) => (k, id) }.zipWithIndex
      .map { case ((id, k), i) => (id, k, i + 1L) }
      .sortBy(_._1)

  test("globalRank equals the local sort on random tie-heavy corpora") {
    val prop = Prop.forAll(corpusGen, Gen.chooseNum(1, 6)) { (rows, subs) =>
      val got = Rank.globalRank(rows.toDF("id", "k"), "id", "k",
          numSubBuckets = subs)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      got == localRank(rows)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("globalRankRange equals the local sort on random corpora") {
    val prop = Prop.forAll(corpusGen, Gen.chooseNum(1, 9)) { (rows, b) =>
      val got = Rank.globalRankRange(rows.toDF("id", "k"), "id", "k",
          numBuckets = b)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      got == localRank(rows)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("assignBalanced: exactly-once, in-range, and the per-bucket serpentine bound") {
    val docsGen = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 12)).map(ls =>
        ls.zipWithIndex.map { case (l, i) =>
          (i.toLong, Seq.fill(l)("w").mkString(" ")) }))
    val prop = Prop.forAll(docsGen, Gen.chooseNum(1, 5), Gen.chooseNum(1, 4)) {
      (docs, shards, buckets) =>
        val out = Shards.assignBalanced(docs.toDF("doc_id", "text"),
            "doc_id", "text", nShards = shards, numBuckets = buckets)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        val once = out.map(_._1).distinct.length == docs.length &&
          out.length == docs.length
        val inRange = out.forall(r => r._3 >= 0 && r._3 < shards)
        // serpentine bound: within EVERY bucket (replaying the
        // operator's own md5 bucket locally), any two shards' token
        // totals differ by at most that bucket's largest document
        def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        def bucketOf(id: Long): Long =
          java.lang.Long.parseLong(md5hex(s"shard:$id").take(8), 16) % buckets
        val bound = out.groupBy(r => bucketOf(r._1)).forall { case (_, rs) =>
          val perShard = (0 until shards).map(s =>
            rs.filter(_._3 == s).map(_._2).sum)
          val maxDoc = rs.map(_._2).max
          perShard.max - perShard.min <= maxDoc
        }
        once && inRange && bound
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
