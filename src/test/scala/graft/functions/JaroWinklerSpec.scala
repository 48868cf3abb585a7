package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JaroWinkler vs values PINNED from DuckDB's
  * `jaro_winkler_similarity` (the driver oracle engine) — exact
  * double equality, not tolerance: the expression exists to be
  * oracle-portable, so the last bit matters. Includes the classic
  * record-linkage pairs, the transposition/window/boost paths, and
  * the empty-string convention. */
class JaroWinklerSpec extends SparkSpec {

  // (a, b, DuckDB jaro_winkler_similarity(a, b)) — captured verbatim
  private val Pinned: Seq[(String, String, Double)] = Seq(
    ("martha", "marhta", 0.9611111111111111), // the Winkler paper pair (transpositions)
    ("dwayne", "duane", 0.8400000000000001),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("", "abc", 0.0),
    ("", "", 0.0), // DuckDB convention: any empty operand → 0
    ("same", "same", 1.0),
    ("abc", "xyz", 0.0), // no matches within the window
    ("Customer#000000001", "Customer#000000010", 0.9888888888888889),
    ("a", "ab", 0.8500000000000001), // boost on a 1-char prefix
    ("CRATE", "TRACE", 0.7333333333333334), // jaro > 0.7 but prefix 0 → no boost
    ("jon", "john", 0.9333333333333333))

  test("bit-equal to the pinned DuckDB values (scalar reference)") {
    Pinned.foreach { case (a, b, want) =>
      val got = JaroWinkler.similarity(a, b)
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(want), s"($a, $b): got $got want $want")
    }
  }

  test("expression path and SQL registration agree with the scalar") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Pinned.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val exprVals = df.select(GraftFunctions.jaroWinkler(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    val sqlVals = df.selectExpr("graft_jaro_winkler(a, b)")
      .collect().map(_.getDouble(0))
    Pinned.map(_._3).zip(exprVals).zip(sqlVals).foreach { case ((want, e), s) =>
      assert(e == want && s == want)
    }
  }

  test("symmetry and range over random strings") {
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val ab = JaroWinkler.similarity(a, b)
      val ba = JaroWinkler.similarity(b, a)
      assert(ab == ba, s"asymmetric on ($a, $b)")
      assert(ab >= 0.0 && ab <= 1.0)
      if (a == b && a.nonEmpty) assert(ab == 1.0)
    }
  }
}
