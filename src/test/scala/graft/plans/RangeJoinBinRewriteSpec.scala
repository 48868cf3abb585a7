package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The range-join bin rewrite: plan shape (the nested loop must
  * become an equi-join — the entire point of the rule), exactness
  * against the naive plan on every edge (boundaries, empty ranges,
  * NULLs, duplicates), conservatism (equi-keyed and non-range joins
  * untouched), and the dormant default.
  */
class RangeJoinBinRewriteSpec extends SparkSpec {

  private def withRule[A](binWidth: String)(f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinBinRewrite
    spark.conf.set(RangeJoinBinRewrite.ConfKey, binWidth)
    try f
    finally {
      spark.experimental.extraOptimizations = prev
      spark.conf.unset(RangeJoinBinRewrite.ConfKey)
    }
  }

  import scala.jdk.CollectionConverters._
  private def points: DataFrame = {
    import spark.implicits._
    // includes NULL points and boundary-exact values
    (Seq(0L, 1L, 5L, 10L, 15L, 99L, 100L, 101L, 250L).map(Some(_)) :+ Option.empty[Long])
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("pid", "x")
  }
  private def intervals: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, Some(0L), Some(10L)),   // covers several points, boundary-inclusive
      (2L, Some(10L), Some(10L)),  // degenerate single-value interval
      (3L, Some(90L), Some(120L)), // spans a bin boundary
      (4L, Some(200L), Some(100L)), // inverted: lo > hi, matches nothing
      (5L, Option.empty[Long], Some(50L)), // NULL lo, matches nothing
      (6L, Some(240L), Some(260L)),
      (7L, Some(0L), Some(10L)))   // duplicate interval: multiplicity must survive
      .toDF("iid", "lo", "hi")
  }
  private def rangeJoin: DataFrame =
    points.join(intervals, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid")

  private def sortedRows(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("dormant by default: no conf, no rewrite, nested loop stays") {
    val plan = rangeJoin.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"),
      s"naive range join should nested-loop:\n$plan")
  }

  test("rewrites the nested loop into an equi-join, results identical") {
    val naive = sortedRows(rangeJoin)
    assert(naive.nonEmpty)
    withRule(binWidth = "16") {
      val df = rangeJoin
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rewritten plan must not nested-loop:\n$plan")
      assert(plan.contains("__graft_bin"), s"expected bin key in:\n$plan")
      assert(sortedRows(df) == naive, "rewrite changed the result")
    }
  }

  test("exact across bin widths (boundary cases land identically)") {
    val naive = sortedRows(rangeJoin)
    for (w <- Seq("1", "7", "100", "10000")) withRule(w) {
      assert(sortedRows(rangeJoin) == naive, s"width $w drifted")
    }
  }

  test("point side may be the RIGHT side of the join") {
    val naive = sortedRows(
      intervals.join(points, col("x") >= col("lo") && col("x") <= col("hi"))
        .select("pid", "iid"))
    withRule("16") {
      val df = intervals.join(points, col("x") >= col("lo") && col("x") <= col("hi"))
        .select("pid", "iid")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
      assert(sortedRows(df) == naive)
    }
  }

  test("extra residual conjuncts ride along unchanged") {
    val q = points.join(intervals,
      col("x") >= col("lo") && col("x") <= col("hi") && (col("pid") + col("iid")) % 2 === 0)
      .select("pid", "iid")
    val naive = sortedRows(q)
    withRule("16") {
      val df = points.join(intervals,
        col("x") >= col("lo") && col("x") <= col("hi") && (col("pid") + col("iid")) % 2 === 0)
        .select("pid", "iid")
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(sortedRows(df) == naive)
    }
  }

  test("conservatism: equi-keyed joins and non-range conditions are untouched") {
    withRule("16") {
      // equi key present → planner already hash-joins; rule must not touch
      val equi = points.join(intervals, col("pid") === col("iid") && col("x") >= col("lo"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      // lower bound only (no upper) → not an interval containment
      val halfOpen = points.join(intervals, col("x") >= col("lo"))
      assert(!halfOpen.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      // left outer is out of scope
      val outer = points.join(intervals,
        col("x") >= col("lo") && col("x") <= col("hi"), "left")
      assert(!outer.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    }
  }

  test("agrees with the hand-written interval join operator on real data") {
    // timestamps bin by seconds — the rule's TimestampType path
    val dir = sf("sf0.001")
    val l = graft.Tables(spark, dir).lineitem
      .select(col("l_orderkey"), col("l_shipdate").cast("timestamp").as("x"))
    val iv = graft.Tables(spark, dir).orders.limit(50)
      .select(col("o_orderkey"),
        col("o_orderdate").cast("timestamp").as("lo"),
        (col("o_orderdate").cast("timestamp") + expr("INTERVAL 30 DAYS")).as("hi"))
    def q: DataFrame = l.join(iv, col("x") >= col("lo") && col("x") <= col("hi"))
      .groupBy("o_orderkey").count()
    val naive = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    withRule(binWidth = (86400.0 * 32).toString) {
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == naive && got.nonEmpty)
    }
  }
}
