package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning — the iterative completion of
  * [[TextAnalysis.bpePairCounts]] (which gates the counting round).
  * Classic word-internal byte-pair encoding (Sennrich et al. 2016):
  * start from characters, repeatedly merge the most frequent adjacent
  * symbol pair, weighted by word frequency.
  *
  * Scale shape: the corpus is touched ONCE to build the word-frequency
  * table (one tokenize + one grouped count — the same shuffle any
  * vocabulary pass pays); every merge iteration then runs on that
  * VOCABULARY-sized table (≪ corpus: Heaps' law), so `nMerges`
  * iterations cost nMerges small jobs, not nMerges corpus scans. Each
  * iteration is one pair-count aggregation + a `limit(1)` argmax
  * (single row to the driver — the merge table IS a driver-side
  * artifact, the tokenizer's merges.txt) + one higher-order-function
  * fold applying the merge. `localCheckpoint` after each round keeps
  * the lineage flat (a 200-merge chain would otherwise nest 200
  * projections).
  *
  * Determinism: the argmax orders by (count desc, left, right) — a
  * total order, so re-runs and retries learn the identical merge
  * sequence. Spec-gated (`BpeTrainerSpec` pins the hand-computed
  * Sennrich-corpus merges); the pair-counting round itself is
  * oracle-gated via `p_bpe_pair_counts`.
  */
object BpeTrainer {

  /** One learned merge: `left`+`right` → `left+right`, with the
    * weighted pair count at the time it was chosen. */
  final case class Merge(rank: Int, left: String, right: String, weight: Long)

  /** Adjacent symbol pairs of `syms` as structs (a, b); empty for
    * arrays shorter than 2. */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(
        sequence(lit(0), size(syms) - 2),
        i => struct(
          element_at(syms, i + 1).as("a"),
          element_at(syms, i + 2).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))

  /** Greedy left-to-right application of merge (a, b) → ab to a
    * symbol array, as one fold. CASE branches are ordered so
    * `element_at(acc, -1)` only evaluates on non-empty accumulators
    * (ANSI mode throws on empty); "aaa" under merge (a,a) yields
    * ["aa","a"] — the standard BPE greedy semantics. */
  private def applyMerge(syms: Column, a: Column, b: Column): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) === 0, array(s))
          .when(element_at(acc, -1) === a && s === b,
            concat(slice(acc, lit(1), size(acc) - 1), array(concat(a, b))))
          .otherwise(concat(acc, array(s))))

  /** Learn `nMerges` merges from the corpus. Returns them in learned
    * order (rank 1 = first merge). Stops early if no adjacent pair
    * remains (every word fully merged). */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    require(nMerges > 0, s"nMerges=$nMerges must be positive")
    var words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .select(
        col("__n"),
        expr("transform(sequence(1, length(__w)), i -> substr(__w, i, 1))").as("__syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var done = false
    while (!done && merges.length < nMerges) {
      val top = words
        .select(col("__n"), explode(adjacentPairs(col("__syms"))).as("__p"))
        .groupBy(col("__p.a").as("__a"), col("__p.b").as("__b"))
        .agg(sum("__n").as("__c"))
        .orderBy(col("__c").desc, col("__a"), col("__b"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(merges.length + 1, a, b, c)
        val prev = words
        words = words
          .withColumn("__syms", applyMerge(col("__syms"), lit(a), lit(b)))
          .localCheckpoint(true)
        prev.unpersist(blocking = false)
      }
    }
    // release the final round's checkpoint too — without this every
    // train() call leaks one vocabulary-sized block set for the
    // session lifetime
    words.unpersist(blocking = false)
    merges.toSeq
  }
}
