package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardsSpec extends SparkSpec {
  import spark.implicits._

  test("serpentine deal: hand-checked within one bucket") {
    // one bucket (numBuckets=1), 2 shards, sizes force the order
    // ranks by tokens desc, id: d1(5) d2(4) d3(3) d4(2) d5(1)
    val docs = Seq(
      (1L, "a a a a a"),
      (2L, "b b b b"),
      (3L, "c c c"),
      (4L, "d d"),
      (5L, "e")).toDF("doc_id", "text")
    val m = Shards.assignBalanced(docs, "doc_id", "text",
      nShards = 2, numBuckets = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // round 0 (even): r=0→shard0, r=1→shard1; round 1 (odd,
    // reversed): r=2→shard1, r=3→shard0; round 2: r=4→shard0
    assert(m == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 0))
    // balance: shard0 = 5+2+1 = 8 tokens, shard1 = 4+3 = 7
  }

  test("every doc assigned exactly once, shard in [0, nShards)") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    val out = Shards.assignBalanced(docs, "doc_id", "text",
      nShards = 8, numBuckets = 32)
    assert(out.count() == docs.count())
    assert(out.select(countDistinct("doc_id")).head.getLong(0) == docs.count())
    assert(out.filter(col("shard") < 0 || col("shard") >= 8).isEmpty)
  }

  test("balance: shard token totals stay within a few max-docs of each other") {
    // buckets sized to the corpus per the scaladoc contract: each
    // bucket's deal must run long enough to balance (≈600 docs at
    // sf0.001 → 4 buckets ≈ 19 rounds per deal; 32 buckets would
    // leave ~2 docs per (bucket, shard) — deals too short to even
    // out, measured 8.7% realized imbalance)
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    val out = Shards.assignBalanced(docs, "doc_id", "text",
      nShards = 8, numBuckets = 4)
    val totals = Shards.manifest(out, "doc_id")
      .select("total_tokens").collect().map(_.getLong(0))
    assert(totals.length == 8)
    val maxDoc = out.agg(max("n_tokens")).head.getLong(0)
    // within one bucket any two shards differ ≤ that bucket's max
    // doc; totals are sums of 4 independent deals, and the bound
    // below (4 · maxDoc) is the worst case — typically far tighter
    assert(totals.max - totals.min <= 4 * maxDoc,
      s"imbalance ${totals.max - totals.min} vs bound ${4 * maxDoc}")
    // and the REALIZED balance should be tight: within 5% of mean
    val mean = totals.sum.toDouble / totals.length
    assert((totals.max - totals.min) / mean < 0.05,
      s"realized imbalance ${(totals.max - totals.min) / mean} >= 5%")
  }

  test("deterministic: two runs agree row for row") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    def run() = Shards.assignBalanced(docs, "doc_id", "text",
      nShards = 4, numBuckets = 16).orderBy("doc_id").collect().toSeq
    assert(run() == run())
  }

  test("plan: bucket-partitioned window, never Exchange SinglePartition") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
    val plan = Shards.assignBalanced(docs, "doc_id", "text",
      nShards = 8, numBuckets = 32).queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan.linesIterator.take(30).mkString("\n"))
    // and the rank shuffle carries only narrow columns, not text
    val windowLine = plan.linesIterator.find(_.contains("Window")).getOrElse("")
    assert(!windowLine.contains("text"))
  }
}
