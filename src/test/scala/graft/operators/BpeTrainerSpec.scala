package graft.operators

import graft.SparkSpec
import BpeTrainer.Merge

/** Pins the trainer to the HAND-COMPUTED merge sequence of the
  * classic Sennrich et al. (2016) example corpus — low×5, lower×2,
  * newest×6, widest×3:
  *
  *   pair counts round 1: es 9 (newest 6 + widest 3), st 9, we 8,
  *   lo 7, ow 7, … → tie es/st breaks lexicographically → (e,s);
  *   round 2: (es,t) 9; round 3: lo/ow tie 7 → (l,o);
  *   round 4: (lo,w) 7.
  *
  * Computed by hand from the algorithm definition, NOT by running the
  * trainer — a systematic bug (wrong tie-break, non-greedy fold,
  * count drift after a merge) cannot certify itself green. */
class BpeTrainerSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .map(w => Tuple1(w)).toDF("text")
  }

  test("learns the hand-computed Sennrich merges in order, with exact weighted counts") {
    val merges = BpeTrainer.train(corpus, "text", nMerges = 4)
    assert(merges == Seq(
      Merge(1, "e", "s", 9L),
      Merge(2, "es", "t", 9L),
      Merge(3, "l", "o", 7L),
      Merge(4, "lo", "w", 7L)))
  }

  test("greedy fold on repeated symbols: 'aaaa' under (a,a) merges pairwise, not cascading") {
    import spark.implicits._
    val df = Seq.fill(3)("aaaa").map(Tuple1(_)).toDF("text")
    // round 1 learns (a,a); applying it greedily left-to-right turns
    // a a a a into aa aa (not aaa a / a aaa) — round 2 must therefore
    // see pair (aa,aa) with weight 3
    val merges = BpeTrainer.train(df, "text", nMerges = 2)
    assert(merges == Seq(Merge(1, "a", "a", 9L), Merge(2, "aa", "aa", 3L)))
  }

  test("stops early when every word is fully merged") {
    import spark.implicits._
    val df = Seq("ab", "ab", "cd").map(Tuple1(_)).toDF("text")
    val merges = BpeTrainer.train(df, "text", nMerges = 10)
    // (a,b) 2 first, then (c,d) 1 — then no adjacent pairs remain
    assert(merges == Seq(Merge(1, "a", "b", 2L), Merge(2, "c", "d", 1L)))
  }
}
