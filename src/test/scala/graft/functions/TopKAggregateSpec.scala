package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TopKLargest: equivalence with the window-sort reference (the plan
  * it replaces), boundary-tie semantics, NULL/short-group behavior,
  * the map-side-partial ObjectHashAggregate plan shape, and the SQL
  * registration path.
  */
class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("matches the window-sort reference on random data with duplicates and NULLs") {
    val rnd = new Random(42)
    val rows = (0 until 5000).map { i =>
      val key = s"k${rnd.nextInt(20)}"
      val v: java.lang.Long = if (rnd.nextInt(50) == 0) null else rnd.nextInt(300).toLong
      (key, v)
    }
    val df = rows.toDF("key", "v")
    val got = df.groupBy("key").agg(GraftFunctions.topK(col("v"), 7).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val want = rows.filter(_._2 != null).groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2.longValue).sorted(Ordering.Long.reverse).take(7).toSeq
    }
    assert(got.keySet == want.keySet.union(
      rows.filter(_._2 == null).map(_._1).toSet)) // all-NULL groups still appear
    want.foreach { case (k, exp) => assert(got(k) == exp, s"group $k") }
  }

  test("boundary ties keep exactly as many duplicates as fit") {
    val df = Seq(("a", 5L), ("a", 5L), ("a", 5L), ("a", 9L), ("a", 1L))
      .toDF("key", "v")
    val top3 = df.groupBy("key").agg(GraftFunctions.topK(col("v"), 3))
      .head().getSeq[Long](1)
    assert(top3 == Seq(9L, 5L, 5L))
  }

  test("k beyond group size, all-NULL groups, and strings") {
    val df = Seq(("a", "zebra"), ("a", "apple"), ("b", null))
      .toDF("key", "v")
    val out = df.groupBy("key").agg(GraftFunctions.topK(col("v"), 10))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("a") == Seq("zebra", "apple"))
    assert(out("b") == Seq.empty)
  }

  test("plans as ObjectHashAggregate with a map-side partial before the exchange") {
    val df = Tables(spark = this.spark, sf("sf0.001")).orders
      .groupBy("o_orderpriority")
      .agg(GraftFunctions.topK(col("o_totalprice"), 5).as("top"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg:\n$plan")
    assert(plan.contains("partial_graft_top_k"),
      s"partial aggregation must run before the shuffle:\n$plan")
    // partial reduction: the exchange carries <= k values per (partition, group)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getSeq[Double](1).length == 5))
    rows.foreach { r =>
      val vs = r.getSeq[Double](1)
      assert(vs == vs.sorted(Ordering.Double.TotalOrdering.reverse))
    }
  }

  test("callable from SQL as graft_top_k") {
    GraftFunctions.register(spark)
    Seq((1, 10L), (1, 30L), (1, 20L)).toDF("g", "v").createOrReplaceTempView("tk")
    val got = spark.sql("SELECT graft_top_k(v, 2) FROM tk GROUP BY g")
      .head().getSeq[Long](0)
    assert(got == Seq(30L, 20L))
  }

  test("composes with streaming aggregation state (complete mode, cross-batch)") {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val stream = MemoryStream[(String, Long)](spark)(
      Encoders.product[(String, Long)])
    val q = stream.toDF().toDF("key", "v")
      .groupBy("key").agg(GraftFunctions.topK(col("v"), 2).as("top"))
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode("complete").start()
    try {
      stream.addData(("a", 5L), ("a", 1L), ("b", 9L))
      q.processAllAvailable()
      stream.addData(("a", 7L), ("b", 2L)) // state must carry batch-1 values
      q.processAllAvailable()
      val out = spark.table("topk_stream").collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(out("a") == Seq(7L, 5L), "heap state must merge across batches")
      assert(out("b") == Seq(9L, 2L))
    } finally q.stop()
  }

  private def Tables(spark: org.apache.spark.sql.SparkSession, dir: String) =
    graft.Tables(spark, dir)
}
