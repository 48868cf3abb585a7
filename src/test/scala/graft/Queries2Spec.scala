package graft

import org.apache.spark.sql.Row

/** Second relational wave (q6/q7/q8/q10/q14/q15/q16/q19 shapes):
  * value sanity at sf0.01 (the oracle gate re-checks exactly) plus the
  * plan shapes each query exists to demonstrate — scan-side pushdown
  * for q6, broadcast dims (never a cartesian) for the join shapes.
  */
class Queries2Spec extends SparkSpec {
  private val dir = sf("sf0.01")
  private def run(name: String) =
    Queries2.relational2.find(_.name == name).get.run(spark, dir)

  test("q6: single-scan aggregate with every filter pushed to parquet") {
    val df = run("q6_forecast_revenue")
    val plan = df.queryExecution.executedPlan.toString
    // all three predicates must reach the scan (quantity/discount as
    // range filters, shipdate as timestamp bounds); SparkSpec raises
    // maxMetadataStringLength so the scan line isn't truncated
    assert(plan.contains("LessThan(l_quantity"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_discount"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan)
    // no join anywhere — the scan is the query
    assert(!plan.contains("Join"), "q6 must be join-free")
    val Row(n: Long, rev: Double) = df.head()
    assert(n > 0 && rev > 0.0)
  }

  test("q7: bilateral nation-pair volume — dims broadcast, no cartesian") {
    val df = run("q7_volume_shipping")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!plan.contains("CartesianProduct"))
    val rows = df.collect()
    assert(rows.length == 4) // 2 directed pairs × 2 ship years
    assert(rows.forall(_.getDouble(3) > 0.0))
    // both directed pairs present
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).distinct
    assert(pairs.toSet == Set(("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")))
  }

  test("q8: market share is one conditional pass with share in [0,1]") {
    val df = run("q8_market_share")
    val plan = df.queryExecution.executedPlan.toString
    // one aggregate pass over one scan of lineitem — the conditional
    // numerator must NOT induce a second lineitem scan
    assert(plan.sliding("FileScan parquet".length).count(_ == "FileScan parquet") ==
      plan.split("FileScan").length - 1) // sanity on the probe below
    assert("lineitem".r.findAllIn(plan).size <= 2,
      "conditional numerator must not re-scan lineitem")
    df.collect().foreach { r =>
      val (nat, tot, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(tot > 0.0 && nat >= 0.0 && share >= 0.0 && share <= 1.0)
      assert(math.abs(share - nat / tot) < 1e-12)
    }
  }

  test("q10: returned-item revenue pre-aggregates before the dim join") {
    val df = run("q10_returned_items")
    val rows = df.collect()
    assert(rows.length == 20)
    val revs = rows.map(_.getDouble(2))
    assert(revs.sameElements(revs.sortBy(-(_: Double))), "revenue DESC order")
    // aggregation happens below the customer join: the HashAggregate
    // keys on the orders custkey, not on customer attributes
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q14: promo share consistent with its own components") {
    val Row(promo: Double, tot: Double, pct: Double) = run("q14_promo_revenue").head()
    assert(promo > 0.0 && tot >= promo)
    assert(math.abs(pct - 100.0 * (promo / tot)) < 1e-9)
  }

  test("q15: argmax supplier via broadcast single-row max") {
    val rows = run("q15_top_supplier").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(2) > 0.0))
  }

  test("q16: distinct supplier counts bounded by the supplier dim") {
    val rows = run("q16_supplier_part_cnt").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 100))
    assert(rows.forall(_.getString(0) != "Brand#2"))
    val cnts = rows.map(_.getLong(3))
    assert(cnts.sameElements(cnts.sortBy(-(_: Long))) ||
      cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "count DESC order")
  }

  test("q19: disjunctive predicate — broadcast join, no cartesian") {
    val df = run("q19_disjunctive_revenue")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
    val Row(n: Long, rev: Double) = df.head()
    assert(n > 0 && rev > 0.0)
  }

  test("q4: EXISTS rides the semi join as a residual — one keyed join, no cartesian") {
    val df = run("q4_late_orders")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.linesIterator.take(20).mkString("\n"))
    // the date comparison is the join's residual condition, not a
    // separate filter stage after a wider join
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("curation pipeline: one Catalyst plan, cap + gate semantics hold end to end") {
    val q = PipelineQueries.all.find(_.name == "p_curation_pipeline").get
    val df = q.run(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every rollup is over surviving docs only: counts positive and
    // token/char sums consistent with a non-empty doc set
    rows.foreach { r =>
      assert(r.getLong(1) > 0L && r.getLong(2) > 0L && r.getLong(3) > 0L)
    }
    // the per-source cap bounds total survivors by 15 × |sources|
    val totalDocs = rows.map(_.getLong(1)).sum
    val nSources = spark.read.parquet(s"$dir/documents.parquet")
      .select("source").distinct().count()
    assert(totalDocs <= 15L * nSources)
  }

  test("lsh recall audit: bounds hold, and multi-probe strictly dominates single-probe") {
    import org.apache.spark.sql.functions._
    val q = PipelineQueries.all.find(_.name == "p_lsh_recall_audit").get
    val rows = q.run(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (nBrute, nHit, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nBrute == 10L)
      assert(nHit >= 0L && nHit <= nBrute)
      assert(recall == nHit.toDouble / nBrute)
    }
    // This audit EXPOSES single-probe sign-LSH's recall ceiling (one
    // 256-bucket band keeps ~1/256 of the corpus per probe) — the
    // measurement that motivates multi-probe and IVF. The invariant
    // worth pinning is the dominance ordering: probing the 9
    // neighboring buckets can only add candidates, so multi-probe
    // recall >= single-probe recall on every aggregate.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 20)
    def avgRecall(topk: org.apache.spark.sql.DataFrame): Double = {
      val brute = graft.operators.Similarity.bruteForceTopK(
        probes, "vec_id", emb, "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"))
      brute.join(topk.select(col("query_id"), col("neighbor_id"), lit(1L).as("h")),
          Seq("query_id", "neighbor_id"), "left")
        .agg(avg(coalesce(col("h"), lit(0L)))).head().getDouble(0)
    }
    val single = avgRecall(graft.operators.Similarity.lshTopK(
      probes, "vec_id", emb, "vec_id", "embedding", k = 10, signBits = 8))
    val multi = avgRecall(graft.operators.Similarity.lshTopKMultiProbe(
      probes, "vec_id", emb, "vec_id", "embedding", k = 10, signBits = 8))
    assert(multi >= single, s"multi=$multi single=$single")
    assert(multi > 0.0)
  }

  test("q21: sole-supplier anti self-join keys on the order, residual on the supplier") {
    val df = run("q21_sole_supplier")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan.linesIterator.take(20).mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    val rows = df.collect()
    assert(rows.length == 10)
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, "count DESC order")
    assert(counts.forall(_ > 0))
  }
}
