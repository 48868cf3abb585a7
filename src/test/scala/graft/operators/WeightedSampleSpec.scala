package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** A-ES weighted sampling with integer weights: min-of-w md5 draws.
  * Reference-implementation cross-check plus clamp and determinism. */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def refMinDraw(salt: String, id: Long, w: Int): String =
    (0 until w).map(c => md5hex(s"$salt:$id:$c")).min

  test("weightedSampleK: min draw matches the reference computation") {
    val df = Seq((1L, 3), (2L, 1), (3L, 8)).toDF("id", "w")
    val out = Sampling.weightedSampleK(df, "id", col("w"), k = 3, salt = "t1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      1L -> refMinDraw("t1", 1L, 3),
      2L -> refMinDraw("t1", 2L, 1),
      3L -> refMinDraw("t1", 3L, 8)))
  }

  test("weightedSampleK: clamps weights into [1, maxWeight] and cuts at k") {
    val df = Seq((1L, 0), (2L, -5), (3L, 100)).toDF("id", "w")
    val out = Sampling.weightedSampleK(
      df, "id", col("w"), k = 2, salt = "t2", maxWeight = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size === 2)
    // w<=0 clamps to 1 draw; w=100 clamps to maxWeight=4 draws
    val full = Map(
      1L -> refMinDraw("t2", 1L, 1),
      2L -> refMinDraw("t2", 2L, 1),
      3L -> refMinDraw("t2", 3L, 4))
    val expect = full.toSeq.sortBy { case (id, d) => (d, id) }.take(2).toMap
    assert(out === expect)
  }

  test("weightedSampleK: identical draw under the same salt, redrawn under another") {
    val df = (1L to 50L).map(i => (i, (i % 5 + 1).toInt)).toDF("id", "w")
    val a = Sampling.weightedSampleK(df, "id", col("w"), k = 10, salt = "s")
      .select("id").as[Long].collect().toSeq
    val b = Sampling.weightedSampleK(df, "id", col("w"), k = 10, salt = "s")
      .select("id").as[Long].collect().toSeq
    val c = Sampling.weightedSampleK(df, "id", col("w"), k = 10, salt = "other")
      .select("id").as[Long].collect().toSeq
    assert(a === b)
    assert(a !== c) // 50-choose-10 collision under independent salts: negligible
  }
}
