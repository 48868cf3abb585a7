package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankSpec extends SparkSpec {
  import spark.implicits._

  private def windowRank(df: org.apache.spark.sql.DataFrame,
      idCol: String, keyCol: String) =
    df.withColumn("rank", row_number().over(
        Window.orderBy(col(keyCol), col(idCol))).cast("long"))
      .select(idCol, keyCol, "rank")

  test("globalRank ≡ the single-partition window rank on real data") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("k"))
    val got = Rank.globalRank(docs, "doc_id", "k")
      .orderBy("doc_id").collect().toSeq
    val want = windowRank(docs, "doc_id", "k")
      .orderBy("doc_id").collect().toSeq
    assert(got == want)
  }

  test("hot key: ties split over sub-buckets, ranks still exact") {
    // one key value carries 90% of the rows — the distribution that
    // floods a per-key window; sub-buckets split it, arithmetic exact
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("k", when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(100L)))
    val got = Rank.globalRank(df, "id", "k", numSubBuckets = 8)
      .orderBy("id").collect().toSeq
    val want = windowRank(df, "id", "k").orderBy("id").collect().toSeq
    assert(got == want)
  }

  test("numSubBuckets = 1 degenerates to per-key windows, same ranks") {
    val df = spark.range(0, 200).toDF("id").withColumn("k", col("id") % 5)
    val got = Rank.globalRank(df, "id", "k", numSubBuckets = 1)
      .orderBy("id").collect().toSeq
    assert(got == windowRank(df, "id", "k").orderBy("id").collect().toSeq)
  }

  test("deterministic across runs") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("k"))
    def run() = Rank.globalRank(docs, "doc_id", "k").orderBy("doc_id").collect().toSeq
    assert(run() == run())
  }

  test("globalRankRange ≡ the window rank on a continuous key") {
    val cust = graft.Tables(spark, sf("sf0.001")).customer
      .select(col("c_custkey").as("id"), col("c_acctbal").as("k"))
    val got = Rank.globalRankRange(cust, "id", "k", numBuckets = 16)
      .orderBy("id").collect().toSeq
    val want = windowRank(cust, "id", "k").orderBy("id").collect().toSeq
    assert(got == want)
  }

  test("globalRankRange: equal keys at a boundary co-locate (strict compare)") {
    // many duplicates of a handful of values — boundaries land ON
    // values; correctness requires equal keys in one bucket
    val df = spark.range(0, 900).toDF("id").withColumn("k", (col("id") % 3).cast("double"))
    val got = Rank.globalRankRange(df, "id", "k", numBuckets = 8)
      .orderBy("id").collect().toSeq
    assert(got == windowRank(df, "id", "k").orderBy("id").collect().toSeq)
  }

  test("plan: the corpus-row window is (key, sub)-partitioned, never SinglePartition") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("k"))
    val plan = Rank.globalRank(docs, "doc_id", "k")
      .queryExecution.executedPlan.toString
    // the ONLY SinglePartition exchange feeds the distinct-key offset
    // window (an aggregate-sized input); the row_number window over
    // corpus rows must be partitioned by (k, __sub)
    val rnWindow = plan.linesIterator
      .find(l => l.contains("Window") && l.contains("row_number"))
      .getOrElse(sys.error("row_number window not found"))
    assert(rnWindow.contains("__sub"), rnWindow)
  }
}
