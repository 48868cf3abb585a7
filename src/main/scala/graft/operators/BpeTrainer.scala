package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
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
  * VOCABULARY-sized table (≪ corpus: Heaps' law), and merges are
  * learned in order-safe BATCHES (see [[train]]) so a 32k-merge
  * vocabulary costs ~32k/batch-size scans, not 32k. Each scan is one
  * pair-count aggregation + a top-`collectN` argmax (a few hundred
  * rows to the driver — the merge table IS a driver-side artifact,
  * the tokenizer's merges.txt) + one projection applying the whole
  * batch as chained higher-order-function folds. `localCheckpoint`
  * after each scan keeps the lineage flat (a 200-merge chain would
  * otherwise nest 200 projections).
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
    * remains (every word fully merged).
    *
    * Merges are learned in BATCHES of up to `maxPerScan` per
    * pair-count scan, but the learned sequence is PROVABLY identical
    * to one-merge-per-scan sequential greedy (BpeTrainerSpec pins the
    * hand-computed Sennrich sequence either way). The batch rule:
    * walk the scan's pairs in greedy order (count desc, left, right)
    * and accept a pair iff
    *
    *  1. it shares no symbol with any already-accepted pair (nor any
    *     accepted pair's concatenation) — disjoint merges commute:
    *     applying one cannot change the other's count; and
    *  2. its count strictly exceeds the CEILING — the max count of
    *     any pair that shares a symbol with the accepted set. Pairs
    *     an accepted merge can create ((x, ab) / (ab, y)) or modify
    *     are bounded by that max (C(x,ab) ≤ C(x,a)), so a later
    *     sequential argmax can never prefer a created/modified pair
    *     over an accepted one (strictness also rules out a created
    *     pair winning a count TIE by lexicographic order); and
    *  3. its count strictly exceeds the last COLLECTED count (only
    *     the top `collectN` pairs ship to the driver; an uncollected
    *     pair has count ≤ that tail, so condition 2 stays sound).
    *
    * The first failure stops the batch: every later pair has count ≤
    * the failing pair's, so none can pass condition 2. The scan's
    * argmax (first pair) is always accepted, so progress is
    * guaranteed and `maxPerScan = 1` degenerates to the classic
    * sequential algorithm.
    *
    * How much batching buys DEPENDS ON THE PAIR DISTRIBUTION: on
    * corpora with many disjoint hot pairs (large alphabets, e.g.
    * byte-pair over multilingual bytes) it approaches
    * merges/maxPerScan scans; on English-like character text the hot
    * pairs share letters, the ceiling rule trips early, and the
    * measured admission is ~1.7 merges/scan — 23% fewer scheduler
    * jobs than sequential (2312 vs 3002 for 1000 merges at 50×
    * amplification, wall time equal within noise on local[32];
    * `bpe_train` vs `bpe_train_seq` in `scale_stress.json`).
    * BpeTrainerSpec counts jobs via a SparkListener and pins the
    * learned sequence identical either way. The batch rule is
    * deliberately the provably-safe one: it never trades sequence
    * fidelity for scan count. */
  def train(
      docs: DataFrame, textCol: String, nMerges: Int,
      maxPerScan: Int = 64): Seq[Merge] = {
    require(nMerges > 0, s"nMerges=$nMerges must be positive")
    require(maxPerScan > 0, s"maxPerScan=$maxPerScan must be positive")
    var words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .select(
        col("__n"),
        expr("transform(sequence(1, length(__w)), i -> substr(__w, i, 1))").as("__syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    val collectN = math.max(maxPerScan * 8, 256)
    var done = false
    while (!done && merges.length < nMerges) {
      val top = words
        .select(col("__n"), explode(adjacentPairs(col("__syms"))).as("__p"))
        .groupBy(col("__p.a").as("__a"), col("__p.b").as("__b"))
        .agg(sum("__n").as("__c"))
        .orderBy(col("__c").desc, col("__a"), col("__b"))
        .limit(collectN)
        .collect()
      if (top.isEmpty) done = true
      else {
        val pairs = top.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        // fewer rows than asked ⇒ the WHOLE pair table is on the
        // driver and the tail-count guard (condition 3) is vacuous
        val fullTable = pairs.length < collectN
        val tailC = pairs.last._3
        val room = math.min(maxPerScan, nMerges - merges.length)
        val blocked = scala.collection.mutable.Set.empty[String]
        var ceiling = Long.MinValue
        val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var i = 0
        var stop = false
        while (!stop && i < pairs.length && batch.length < room) {
          val (a, b, c) = pairs(i)
          val accept = batch.isEmpty ||
            (!blocked(a) && !blocked(b) && c > ceiling && (fullTable || c > tailC))
          if (accept) {
            batch += ((a, b, c))
            blocked ++= Seq(a, b, a + b)
            val ab = a + b
            for ((qa, qb, qc) <- pairs)
              if (!(qa == a && qb == b) &&
                  (qa == a || qa == b || qa == ab || qb == a || qb == b || qb == ab))
                ceiling = math.max(ceiling, qc)
          } else stop = true
          i += 1
        }
        for ((a, b, c) <- batch) merges += Merge(merges.length + 1, a, b, c)
        val prev = words
        // one projection applies the whole batch: chained greedy
        // folds in learned order — per word this IS the sequential
        // algorithm's composition of per-merge rewrites
        words = words
          .withColumn("__syms",
            batch.foldLeft(col("__syms")) { case (syms, (a, b, _)) =>
              applyMerge(syms, lit(a), lit(b))
            })
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

  /** Tokenize one word with a learned merge table — the classic
    * iterative algorithm (Sennrich et al.): repeatedly find the
    * LOWEST-RANK pair present among adjacent symbols and merge every
    * occurrence greedily left-to-right, until no learnable pair
    * remains. This is deliberately the priority form, not
    * rank-sequential application: a merge can (in exotic same-string
    * cases) create an occurrence of a lower-ranked pair, and the
    * priority loop revisits it exactly as reference tokenizers do.
    * Pure JVM, no Spark — [[encode]] runs it once per DISTINCT word. */
  private[operators] def encodeWord(
      w: String, rank: Map[(String, String), Int]): Seq[String] = {
    if (w.isEmpty) return Seq.empty
    var syms: Array[String] = w.map(_.toString).toArray
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestA = syms(i); bestB = syms(i + 1) }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == bestA && syms(j + 1) == bestB) {
            buf += bestA + bestB; j += 2
          } else { buf += syms(j); j += 1 }
        }
        syms = buf.toArray
        done = syms.length < 2
      }
    }
    syms.toSeq
  }

  /** Apply a learned merge table to the corpus: per-document BPE
    * subword arrays, in token order. Output: (`idCol`, `bpe`
    * array<string>).
    *
    * Scale shape (100 TB): the iterative per-word loop runs once per
    * DISTINCT word (Heaps' law: vocabulary ≪ corpus — the same
    * economy [[train]] exploits), as a `mapPartitions` over the
    * vocabulary with the rank table broadcast (a merges.txt is ≤ a
    * few MB — driver-artifact-sized by construction, see [[train]]).
    * The corpus itself pays one posexplode (map-side), one
    * vocabulary equi-join (AQE broadcasts it when small), and one
    * per-document regrouping keyed on the id — no quadratic step,
    * no driver data path. The `mapPartitions` is the documented
    * last-resort case: a data-dependent fixpoint loop per word that
    * no expression tree can express. */
  def encode(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bc = spark.sparkContext.broadcast(ranks)
    implicit val strEnc: Encoder[String] = Encoders.STRING
    val words = docs.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("__pos", "__w")))
    val vocab = words.select(col("__w")).distinct().as[String]
    val encoded = vocab
      .mapPartitions { it =>
        val r = bc.value
        it.map(w => (w, encodeWord(w, r)))
      }(Encoders.product[(String, Seq[String])])
      .toDF("__w", "__subs")
    words.join(encoded, "__w")
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__pos"), col("__subs")))),
        s => s("__subs"))).as("bpe"))
  }
}
