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

  test("batched learning equals sequential (maxPerScan=1) on the Sennrich corpus") {
    // the batch rule's correctness claim, checked directly: the same
    // corpus learned one-merge-per-scan and batched must produce the
    // IDENTICAL merge sequence (ranks, pairs, weights)
    val sequential = BpeTrainer.train(corpus, "text", nMerges = 4, maxPerScan = 1)
    val batched = BpeTrainer.train(corpus, "text", nMerges = 4, maxPerScan = 64)
    assert(batched == sequential)
  }

  test("overlapping hot pairs are NOT batched: (e,s)/(s,t) tie stays sequential") {
    // es and st both count 9 and share 's' — a naive top-k batch
    // would take both, but merging (e,s) changes (s,t)'s count
    // (newest: n e w es t has no s,t pair anymore — it became es,t).
    // The batch rule must stop at the overlap, learning (es,t) only
    // on the NEXT scan from re-counted pairs.
    val merges = BpeTrainer.train(corpus, "text", nMerges = 2)
    assert(merges == Seq(Merge(1, "e", "s", 9L), Merge(2, "es", "t", 9L)))
  }

  test("disjoint-pair corpus: 100 merges in >=4x fewer Spark jobs than sequential") {
    import spark.implicits._
    // 100 two-char words over 200 distinct code points with strictly
    // decreasing frequencies: every pair is disjoint from every
    // other, so the batch rule can accept maxPerScan per scan
    val words = (0 until 100).map { i =>
      val w = "" + (0x100 + 2 * i).toChar + (0x100 + 2 * i + 1).toChar
      (w, 200 - i)
    }
    val df = words.flatMap { case (w, n) => Seq.fill(n)(w) }.map(Tuple1(_)).toDF("text")
    val expected = (0 until 100).map { i =>
      Merge(i + 1, "" + (0x100 + 2 * i).toChar, "" + (0x100 + 2 * i + 1).toChar,
        (200 - i).toLong)
    }

    def countJobs(body: => Unit): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try { body; Thread.sleep(500) } // let listener-bus events drain
      finally spark.sparkContext.removeSparkListener(listener)
      counter.get()
    }

    var batchedMerges: Seq[Merge] = Nil
    var sequentialMerges: Seq[Merge] = Nil
    val batchedJobs = countJobs {
      batchedMerges = BpeTrainer.train(df, "text", nMerges = 100)
    }
    val sequentialJobs = countJobs {
      sequentialMerges = BpeTrainer.train(df, "text", nMerges = 100, maxPerScan = 1)
    }
    assert(batchedMerges == expected)
    assert(sequentialMerges == expected)
    // 100 sequential scans vs ceil(100/64)=2 batched scans: the job
    // reduction must be at least the mandated 4x (it is ~30x here)
    assert(batchedJobs * 4 <= sequentialJobs,
      s"batched=$batchedJobs sequential=$sequentialJobs")
  }

  test("encodeWord: the classic 'lowest' -> low|est with the Sennrich merges") {
    val ranks = Map(("e", "s") -> 1, ("es", "t") -> 2, ("l", "o") -> 3, ("lo", "w") -> 4)
    assert(BpeTrainer.encodeWord("lowest", ranks) == Seq("low", "est"))
    assert(BpeTrainer.encodeWord("newest", ranks) == Seq("n", "e", "w", "est"))
    // unknown material falls through as single characters
    assert(BpeTrainer.encodeWord("xyz", ranks) == Seq("x", "y", "z"))
    assert(BpeTrainer.encodeWord("", ranks) == Seq.empty)
  }

  test("encodeWord: lowest-rank-first with greedy pairwise application") {
    // (a,a) then (aa,aa): 'aaaa' must merge pairwise then combine —
    // a rank-sequential single pass gets the same here, but the
    // priority loop is what reference tokenizers implement
    val ranks = Map(("a", "a") -> 1, ("aa", "aa") -> 2)
    assert(BpeTrainer.encodeWord("aaaa", ranks) == Seq("aaaa"))
    assert(BpeTrainer.encodeWord("aaa", ranks) == Seq("aa", "a"))
    // priority inversion: rank 1 pair only appears AFTER rank 2 runs
    val inv = Map(("b", "c") -> 2, ("a", "bc") -> 1)
    assert(BpeTrainer.encodeWord("abc", inv) == Seq("abc"))
  }

  test("encode: corpus-level subword arrays preserve token order") {
    import spark.implicits._
    val merges = BpeTrainer.train(corpus, "text", nMerges = 4)
    val df = Seq((1L, "newest lowest"), (2L, "low wide")).toDF("doc_id", "text")
    val got = BpeTrainer.encode(df, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(got(1L) == List("n", "e", "w", "est", "low", "est"))
    assert(got(2L) == List("low", "w", "i", "d", "e"))
  }
}
