package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed expectations for the LLM-pipeline operator library. */
class OperatorsSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  // ------------------------------------------------------------ dedup

  test("jaccard: hand-computed token-set overlap") {
    val df = docs(1L -> "a b c").select(
      Dedup.jaccard(split(lit("a b c"), " "), split(lit("b c d"), " ")).as("j"),
      Dedup.jaccard(array().cast("array<string>"), array().cast("array<string>")).as("empty"))
    val r = df.head()
    assert(r.getDouble(0) == 0.5) // |{b,c}| / |{a,b,c,d}|
    assert(r.getDouble(1) == 0.0) // empty union defined as 0
  }

  test("wordShingles: n-grams, and short docs yield empty (no ANSI crash)") {
    val df = docs(1L -> "ignored").select(
      Dedup.wordShingles(lit("a b c d"), 2).as("s2"),
      Dedup.wordShingles(lit("a"), 2).as("short"),
      Dedup.wordShingles(lit("a b"), 3).as("nMinus1"))
    val r = df.head()
    assert(r.getSeq[String](0) == Seq("a b", "b c", "c d"))
    assert(r.getSeq[String](1) == Seq())
    assert(r.getSeq[String](2) == Seq())
  }

  test("exactGroups: normalized duplicates collapse, min id survives") {
    val out = Dedup.exactGroups(
      docs(1L -> "Hello  World", 2L -> "hello world", 3L -> "other"),
      "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val dupRow = out.find(_._2 == 1L).get
    assert(dupRow._3 == 2L) // two copies
    assert(out.size == 2)
  }

  test("nearDupPairs: identical docs are found with jaccard 1.0") {
    val out = Dedup.nearDupPairs(
      docs(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta", 3L -> "unrelated words here now"),
      "doc_id", "text", k = 8, rowsPerBand = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("minhashCandidatePairs rejects non-divisible banding") {
    intercept[IllegalArgumentException] {
      Dedup.minhashCandidatePairs(docs(1L -> "x"), "doc_id", k = 7, rowsPerBand = 2)
    }
  }

  test("ngramJaccardPairs: finds near-dup pair, survives 1-token docs, no cartesian plan") {
    val df = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "q",
      4L -> "completely different text with other words entirely")
    val q = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 2, threshold = 0.5)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    val out = q.collect().map(r => (r.getLong(0), r.getLong(1)))
    // 8 shingles each, 6 shared → jaccard 6/10 = 0.6 >= 0.5
    assert(out.toSeq == Seq((1L, 2L)))
  }

  /** Materializations of the operator's explicit `repartition(id)`
    * exchange (rendered `REPARTITION_BY_COL`) in the FINAL adaptive
    * plan. The dedup operators rely on Exchange/stage reuse instead of
    * persist() for their multi-use shingle subtree — if the consumer
    * branches drift canonically apart (e.g. an inferred join-key
    * IsNotNull pushed below the shared repartition on one branch
    * only), the expensive shingling silently recomputes per branch.
    * A reused occurrence prints as `ReusedExchange ..,
    * Exchange .. REPARTITION_BY_COL ..` on one line, so counting
    * non-Reused REPARTITION_BY_COL lines counts real
    * materializations: 1 = shared; >1 = reuse broken. The
    * AdaptiveSparkPlan string also appends an "Initial Plan" section
    * (pre-reuse) — only the section above it is the executed shape. */
  /** (real, reused) counts of the dedup frontier's explicit
    * `repartition(id)` exchanges (rendered `REPARTITION_BY_COL`) in
    * the FINAL adaptive plan. The frontier has two by design
    * (distribute-then-share, [[Dedup.shingleFrontier]]); the SHARE
    * exchange must materialize once and appear as `ReusedExchange` on
    * every other consumer branch — if branches drift canonically
    * apart (e.g. an inferred join-key IsNotNull pushed below the
    * repartition on one branch only) the expensive shingling silently
    * recomputes per branch and the real count grows. The
    * AdaptiveSparkPlan string appends an "Initial Plan" section
    * (pre-reuse) — only the section above it is the executed shape. */
  private def frontierExchanges(q: DataFrame): (Int, Int) = {
    spark.conf.set("spark.sql.debug.maxToStringFields", "2000")
    q.collect() // run so AQE finalizes the adaptive plan
    val plan = q.queryExecution.executedPlan.toString
    val finalPlan = plan.split("Initial Plan").head
    // the frontier pins counts (REPARTITION_BY_NUM — AQE-coalescing
    // immunity, see Dedup.pinnedParts); match the by-col form too so
    // the spec survives either shuffle origin. Restrict to exchanges
    // keyed on the raw doc id: the candidate/verify stages add their
    // own pinned repartitions on (shingle, chunk) and renamed id
    // keys, which are legitimate separate exchanges, not frontier
    // re-materializations.
    val lines = finalPlan.linesIterator
      .filter(l => (l.contains("REPARTITION_BY_COL") || l.contains("REPARTITION_BY_NUM")) &&
        l.contains("hashpartitioning(doc_id#")).toSeq
    (lines.count(!_.contains("ReusedExchange")), lines.count(_.contains("ReusedExchange")))
  }

  private def assertShared(q: DataFrame): Unit = {
    val (real, reused) = frontierExchanges(q)
    // two real = the frontier's own distribute + share exchanges; a
    // broken-reuse plan re-materializes them per consumer branch (4+).
    // Some branches may reuse a BroadcastExchange BUILT from the
    // frontier instead of the shuffle itself, so >=1 (not 3) reuses.
    assert(real <= 2, s"frontier materialized $real times — Exchange reuse broken")
    assert(reused >= 1, s"expected >=1 ReusedExchange consumer branch, got $reused")
  }

  test("ngramJaccardPairs materializes the shingle frontier exactly once") {
    val df = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "completely different text with other words entirely")
    assertShared(Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 2, threshold = 0.5))
  }

  test("nearDupPairsShingled materializes the shingle frontier exactly once") {
    val df = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta iota",
      3L -> "unrelated words entirely here and now today yes")
    assertShared(Dedup.nearDupPairsShingled(df, "doc_id", "text",
      n = 2, k = 12, rowsPerBand = 3, threshold = 0.5))
  }

  test("minhashCandidatePairs: bucket cap drops flood buckets and overflow audit reports them") {
    // 5 identical docs → every band bucket has all 5 ids
    val df = docs((1L to 5L).map(i => i -> "alpha beta gamma delta"): _*)
    val sig = Dedup.minhashSignature(df, "doc_id", "text", k = 8)
    val capped = Dedup.minhashCandidatePairs(sig, "doc_id", k = 8, rowsPerBand = 2, maxBucket = 4)
    assert(capped.count() == 0) // all buckets have 5 > 4 members
    val overflow = Dedup.minhashBucketOverflow(sig, "doc_id", k = 8, rowsPerBand = 2, maxBucket = 4)
      .collect().map(_.getLong(2))
    assert(overflow.nonEmpty && overflow.forall(_ == 5L))
    val uncapped = Dedup.minhashCandidatePairs(sig, "doc_id", k = 8, rowsPerBand = 2)
    assert(uncapped.count() == 10) // C(5,2), strict i<j, no self-pairs

    // PARTIAL drop — the silent-loss failure mode the observe metrics
    // exist for: a flood bucket dropped while a surviving near-dup
    // pair makes the output look plausible. The listener bus is
    // async, so poll briefly.
    Dedup.resetObservedDrops(spark)
    val mixed = docs(
      (1L to 5L).map(i => i -> "alpha beta gamma delta") ++
        Seq(6L -> "omega psi chi phi", 7L -> "omega psi chi phi"): _*)
    val msig = Dedup.minhashSignature(mixed, "doc_id", "text", k = 8)
    val pairs = Dedup.minhashCandidatePairs(msig, "doc_id", k = 8, rowsPerBand = 2, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((6L, 7L))) // flood pairs lost, survivor kept
    val drops = Iterator.continually {
      Thread.sleep(100); Dedup.lastObservedDrops(spark)
    }.take(50).collectFirst { case Some(d) => d }
    // 4 bands × one 5-member flood bucket over the cap of 4
    assert(drops.contains((4L, 20L, 5L)), s"drops=$drops")
  }

  test("simhash64: deterministic, lowercase 16-hex, order-insensitive over token sets") {
    val out = Dedup.withSimhash64(
      docs(1L -> "alpha beta gamma", 2L -> "gamma alpha beta", 3L -> "different content entirely"),
      "text", "sh")
      .select("doc_id", "sh").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == out(2L)) // same token set
    assert(out(1L) != out(3L))
    assert(out(1L).matches("[0-9a-f]{16}"))
  }

  test("simhash64ByKey equals the column-expression simhash on every doc") {
    val df = docs(
      1L -> "alpha beta gamma", 2L -> "the quick brown fox", 3L -> "", 4L -> "solo",
      5L -> "repeat repeat repeat distinct")
    val a = Dedup.withSimhash64(df, "text", "sh").select("doc_id", "sh")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Dedup.simhash64ByKey(df, "doc_id", "text", "sh")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("simhashNearDupPairs: identical token sets pair at hamming 0, unrelated docs don't pair") {
    val out = Dedup.simhashNearDupPairs(
      docs(
        1L -> "alpha beta gamma delta epsilon",
        2L -> "epsilon delta gamma beta alpha", // same token set → identical simhash
        3L -> "utterly unrelated words compose this document here"),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 0L)))
    // the verify bound holds: recomputed hamming of the pair is what the op reports
    val hams = Dedup.withSimhash64(
      docs(1L -> "alpha beta gamma delta epsilon", 3L -> "utterly unrelated words compose this document here"),
      "text", "sh").select("sh").collect().map(_.getString(0))
    val full = docs(1L -> "x").select(
      Dedup.simhashHamming(lit(hams(0)), lit(hams(1))).as("h")).head().getLong(0)
    assert(full > 3L) // and that's why doc 3 paired with nobody
  }

  test("simhashBlockOverflow: flood blocks are reported, capped pairs drop, default keeps them") {
    // Four identical docs → identical simhash → all 4 blocks are
    // 4-member floods at maxBucket=2.
    val flood = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",
      3L -> "alpha beta gamma delta epsilon",
      4L -> "alpha beta gamma delta epsilon")
    val over = Dedup.simhashBlockOverflow(flood, "doc_id", "text", maxBucket = 2)
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(over.length == 4 && over.forall(_._2 == 4L)) // one flood per band
    assert(Dedup.simhashNearDupPairs(flood, "doc_id", "text", maxBucket = 2).count() == 0)
    assert(Dedup.simhashNearDupPairs(flood, "doc_id", "text").count() == 6) // C(4,2)
    // and the audit is empty at the default cap — nothing silently lost
    assert(Dedup.simhashBlockOverflow(flood, "doc_id", "text").count() == 0)
  }

  test("ngramJaccardPairs: chunked flood-shingle join emits exactly the single-cell pairs") {
    // 9 near-identical docs → their shared shingles' posting lists are
    // 9-member floods; chunkSize=2 forces k=5 (the straggler-splitting
    // path) and the pair set must be EXACTLY the single-cell path's
    val fam = (1L to 9L).map(i => i -> s"alpha beta gamma delta epsilon zeta eta theta extra$i")
    val corpus = docs(fam :+ (100L -> "totally different content with no shared grams at all here"): _*)
    def pairs(cs: Int) =
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.5, chunkSize = cs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val chunked = pairs(2)
    assert(chunked == pairs(Int.MaxValue), "chunked vs single-cell pair sets differ")
    assert(chunked.size == 36, "C(9,2) family pairs expected") // doc 100 pairs with nobody
  }

  test("simhashNearDupPairs: chunked flood-block join emits exactly the single-cell pairs") {
    // 9 docs sharing one token set → every block is a 9-member flood.
    // chunkSize=2 forces k=⌈9/2⌉=5 chunks (the straggler-splitting
    // path); the emitted pair set must be EXACTLY the default
    // single-cell path's — every pair in exactly one chunk cell,
    // none lost, none duplicated.
    val flood = docs((1L to 9L).map(i => i -> "alpha beta gamma delta epsilon"): _*)
    def pairs(cs: Int) =
      Dedup.simhashNearDupPairs(flood, "doc_id", "text", chunkSize = cs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val chunked = pairs(2)
    assert(chunked == pairs(Int.MaxValue), "chunked vs single-cell pair sets differ")
    assert(chunked.size == 36 && chunked.forall(_._3 == 0L)) // C(9,2), all identical
  }

  test("embeddingNearDupPairs: identical vectors pair at cosine 1.0") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(1.0f, 2.0f, 3.0f)),
      (3L, Seq(-1.0f, -2.0f, -3.0f))).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", signBits = 2, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  // ------------------------------------------------------- similarity

  test("cosine: hand-computed values") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
      .select(
        Similarity.cosine(col("a"), col("b")).as("c"),
        Similarity.cosine(col("a"), col("a")).as("self"),
        Similarity.cosine(typedLit(Seq(1.0f, 0.0f)), typedLit(Seq(0.0f, 1.0f))).as("orth"),
        Similarity.cosine(typedLit(Seq(0.0f, 0.0f)), typedLit(Seq(1.0f, 0.0f))).as("zero"))
    val r = df.head()
    assert(math.abs(r.getDouble(0) - 32.0 / math.sqrt(14.0 * 77.0)) < 1e-15)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-15)
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 0.0) // zero-vector convention
  }

  test("signBucket: bit per leading component sign; short vectors don't throw") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, -1.0f))).toDF("v").select(
      Similarity.signBucket(col("v"), 2).as("b2"),
      Similarity.signBucket(col("v"), 4).as("b4"))
    val r = df.head()
    assert(r.getLong(0) == 1L) // bit0 set (1>=0), bit1 clear (-1<0)
    assert(r.getLong(1) == 13L) // missing components count as >= 0
  }

  test("bruteForceTopK: exact neighbors ranked by cosine then id") {
    import spark.implicits._
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f)),
      (11L, Seq(0.9f, 0.1f)),
      (12L, Seq(0.0f, 1.0f)),
      (13L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val queries = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(queries, "vec_id", corpus, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect().map(r => r.getLong(2))
    assert(out.toSeq == Seq(10L, 11L, 12L))
  }

  test("lshTopKMultiProbe recovers a boundary neighbor single-probe LSH misses") {
    import spark.implicits._
    // query sits just below the hyperplane on bit 0; its true nearest
    // neighbor just above — different sign bucket (1 vs 0 on bit 0)
    val corpus = Seq(
      (10L, Seq(0.01f, 1.0f)),   // bucket 3 (both bits >= 0) — near dup of the query
      (11L, Seq(-1.0f, -1.0f))). // bucket 0
      toDF("vec_id", "embedding")
    val queries = Seq((1L, Seq(-0.01f, 1.0f))).toDF("vec_id", "embedding") // bucket 2
    val single = Similarity.lshTopK(queries, "vec_id", corpus, "vec_id", "embedding", 3, 2)
      .collect()
    assert(single.isEmpty) // bucket 2 holds no corpus vector: total miss
    val multi = Similarity.lshTopKMultiProbe(queries, "vec_id", corpus, "vec_id", "embedding", 3, 2)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(multi.head == 10L) // flipping bit 0 probes bucket 3 and finds it
  }

  // ---------------------------------------------------- text analysis

  test("text stats: hand-computed counts and ratios") {
    val df = docs(1L -> "x").select(
      TextAnalysis.tokenCount(lit("the cat and the dog")).as("n"),
      TextAnalysis.stopwordRatio(lit("the cat and the dog")).as("sr"),
      TextAnalysis.avgTokenLen(lit("the cat and the dog")).as("avg"),
      TextAnalysis.punctCount(lit("a, b. c!")).as("punct"),
      TextAnalysis.langGuess(lit("the cat and of dog is here")).as("lang"),
      TextAnalysis.langGuess(lit("el la los zz")).as("es"),
      TextAnalysis.langGuess(lit("zz qq ww")).as("und"))
    val r = df.head()
    assert(r.getLong(0) == 5L)
    assert(r.getDouble(1) == 3.0 / 5.0) // the, and, the
    assert(r.getDouble(2) == 15.0 / 5.0) // 19 chars - 4 spaces
    assert(r.getLong(3) == 3L)
    assert(r.getString(4) == "en")
    assert(r.getString(5) == "es")
    assert(r.getString(6) == "und")
  }

  test("repetitionStats: hand-computed dup-token and top-bigram fractions") {
    val out = TextAnalysis.repetitionStats(
      docs(
        1L -> "a b a b a",   // tokens 5, distinct 2; bigrams: a b, b a, a b, b a → top (b a? a b?) both 2, tie → max struct picks "b a"
        2L -> "x y z",       // no repeats; bigrams x y, y z each 1 → top "y z" (tie, lexicographically last)
        3L -> "solo"),       // 1 token → absent
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    val r1 = out(1L)
    assert(r1.getLong(1) == 5L && r1.getLong(2) == 2L)
    assert(r1.getDouble(3) == 1.0 - 2.0 / 5.0)
    assert(r1.getString(4) == "b a" && r1.getLong(5) == 2L)
    assert(r1.getDouble(6) == 2.0 / 4.0)
    val r2 = out(2L)
    assert(r2.getDouble(3) == 1.0 - 3.0 / 3.0)
    assert(r2.getString(4) == "y z" && r2.getLong(5) == 1L)
    assert(r2.getDouble(6) == 1.0 / 2.0)
  }

  // -------------------------------------------------------- multimodal

  test("imageMeta parses PNG IHDR and BMP headers; other payloads fall back to the stub") {
    import spark.implicits._
    def be32(v: Int): Seq[Byte] =
      Seq((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def le32(v: Int): Seq[Byte] =
      Seq(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // PNG: signature, IHDR length+type, 640x480, bit depth 8, RGBA (6)
    val png = (Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes.toSeq ++ be32(640) ++ be32(480) ++
      Seq(8.toByte, 6.toByte)).toArray
    // BMP: BM, file size, reserved, data offset, BITMAPINFOHEADER with
    // 800x600 at 24bpp
    val bmp = ("BM".getBytes.toSeq ++ le32(0) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(800) ++ le32(600) ++
      Seq(1.toByte, 0.toByte) ++ Seq(24.toByte, 0.toByte)).toArray
    val other = "just text bytes here".getBytes
    val df = Seq((1L, png), (2L, bmp), (3L, other)).toDF("id", "payload")
      .select(col("id"), Multimodal.imageMeta(col("payload")).as("m"))
      .select(col("id"), col("m.width"), col("m.height"), col("m.channels"))
    val rows = df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(1L) == ((640L, 480L, 4L)))
    assert(rows(2L) == ((800L, 600L, 3L)))
    val len = other.length.toLong // stub fallback is the documented arithmetic
    assert(rows(3L) == ((len % 640 + 1, (len * 7) % 480 + 1, len % 3 + 1)))
  }

  test("imageMeta parses GIF headers; audioMeta parses WAV; mediaKind dispatches") {
    import spark.implicits._
    def le16(v: Int): Seq[Byte] = Seq(v.toByte, (v >> 8).toByte)
    def le32(v: Int): Seq[Byte] =
      Seq(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // GIF89a logical screen 320x200 + flags/background/aspect bytes
    val gif = ("GIF89a".getBytes.toSeq ++ le16(320) ++ le16(200) ++
      Seq(0.toByte, 0.toByte, 0.toByte)).toArray
    // canonical 44-byte WAV header: PCM, stereo, 44100 Hz, 16-bit
    val wav = ("RIFF".getBytes.toSeq ++ le32(36) ++ "WAVEfmt ".getBytes.toSeq ++
      le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++ le32(176400) ++
      le16(4) ++ le16(16) ++ "data".getBytes.toSeq ++ le32(0)).toArray
    val other = "plain text".getBytes
    val jpeg = Array(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10).map(_.toByte)
    val df = Seq((1L, gif), (2L, wav), (3L, other), (4L, jpeg)).toDF("id", "payload")
      .select(
        col("id"),
        Multimodal.mediaKind(col("payload")).as("kind"),
        Multimodal.imageMeta(col("payload")).as("im"),
        Multimodal.audioMeta(col("payload")).as("am"))
    val rows = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getString(1) == "gif")
    val gm = rows(1L).getStruct(2)
    assert((gm.getLong(0), gm.getLong(1), gm.getLong(2)) == ((320L, 200L, 1L)))
    assert(rows(1L).isNullAt(3)) // GIF is not audio
    assert(rows(2L).getString(1) == "wav")
    val am = rows(2L).getStruct(3)
    assert((am.getLong(0), am.getLong(1), am.getLong(2)) == ((2L, 44100L, 16L)))
    assert(rows(3L).getString(1) == "other" && rows(3L).isNullAt(3))
    assert(rows(4L).getString(1) == "jpeg")
    val jm = rows(4L).getStruct(2) // truncated mid-APP0: honest NULL dims, no stub
    assert(jm.isNullAt(0) && jm.isNullAt(1) && jm.isNullAt(2))
  }

  test("imageMeta JPEG: bounded SOF walk skips APPn/DQT/fill bytes; SOS-first and truncated yield NULL") {
    import spark.implicits._
    def be16(v: Int): Seq[Byte] = Seq((v >> 8).toByte, v.toByte)
    def seg(marker: Int, payload: Seq[Byte]): Seq[Byte] =
      Seq(0xFF.toByte, marker.toByte) ++ be16(payload.length + 2) ++ payload
    val soi = Seq(0xFF.toByte, 0xD8.toByte)
    val app0 = seg(0xE0, "JFIF".getBytes.toSeq ++ Seq.fill(10)(0.toByte))
    val app1 = seg(0xE1, "Exif".getBytes.toSeq ++ Seq.fill(40)(1.toByte)) // stand-in Exif blob
    val dqt = seg(0xDB, Seq.fill(65)(3.toByte))
    def sof(marker: Int, w: Int, h: Int, nc: Int): Seq[Byte] =
      seg(marker, Seq(8.toByte) ++ be16(h) ++ be16(w) ++ Seq(nc.toByte) ++
        Seq.fill(3 * nc)(0.toByte))
    val fill = Seq(0xFF.toByte) // legal FF padding before a marker
    val baseline = (soi ++ app0 ++ app1 ++ dqt ++ sof(0xC0, 640, 480, 3)).toArray
    val progressive = (soi ++ app0 ++ fill ++ sof(0xC2, 31, 17, 1)).toArray
    val sosFirst = (soi ++ app0 ++ seg(0xDA, Seq.fill(10)(0.toByte))).toArray
    val truncated = (soi ++ app0 ++ app1).toArray.dropRight(20)
    val df = Seq((1L, baseline), (2L, progressive), (3L, sosFirst), (4L, truncated))
      .toDF("id", "payload")
      .select(
        col("id"), Multimodal.mediaKind(col("payload")).as("kind"),
        Multimodal.imageMeta(col("payload")).as("m"))
    val rows = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.values.forall(_.getString(1) == "jpeg"))
    val bm = rows(1L).getStruct(2)
    assert((bm.getLong(0), bm.getLong(1), bm.getLong(2)) == ((640L, 480L, 3L)))
    val pm = rows(2L).getStruct(2)
    assert((pm.getLong(0), pm.getLong(1), pm.getLong(2)) == ((31L, 17L, 1L)))
    Seq(3L, 4L).foreach { id =>
      val m = rows(id).getStruct(2)
      assert(m.isNullAt(0) && m.isNullAt(1) && m.isNullAt(2), s"id=$id dims must be NULL")
    }
    // SQL surface + interpreted path agree with codegen: graft_jpeg_sof
    graft.functions.GraftFunctions.register(spark)
    val viaSql = Seq(Tuple1(baseline)).toDF("p")
    viaSql.createOrReplaceTempView("jpeg_fixture")
    val sqlOut = spark.sql("SELECT graft_jpeg_sof(p) AS d FROM jpeg_fixture")
      .head().getSeq[Long](0)
    assert(sqlOut == Seq(640L, 480L, 3L))
    // interpreted eval (non-codegen contexts) agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    def evalDims(bytes: Array[Byte]): Option[Seq[Long]] =
      Option(graft.functions.JpegSofDims(Literal(bytes)).eval(null))
        .map(_.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq)
    assert(evalDims(baseline).contains(Seq(640L, 480L, 3L)))
    assert(evalDims(progressive).contains(Seq(31L, 17L, 1L)))
    assert(evalDims(sosFirst).isEmpty && evalDims(truncated).isEmpty)
  }

  test("ivfTopK: cells restrict candidates at nProbe=1, widen at nProbe=2") {
    import spark.implicits._
    // centroids along the two axes; corpus split between the cells
    val cents = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Seq(0.9f, 0.1f)),  // cell 0
      (11L, Seq(0.8f, 0.2f)),  // cell 0
      (20L, Seq(0.1f, 0.9f)),  // cell 1
      (21L, Seq(0.2f, 0.8f))   // cell 1
    ).toDF("vec_id", "embedding")
    val q = Seq((10L, Seq(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val one = Similarity.ivfTopK(q, "vec_id", corpus, "vec_id", "embedding",
      cents, "vec_id", "embedding", k = 10, nProbe = 1)
      .collect().map(_.getLong(2)).toSet
    assert(one == Set(11L)) // own cell only, self excluded
    val two = Similarity.ivfTopK(q, "vec_id", corpus, "vec_id", "embedding",
      cents, "vec_id", "embedding", k = 10, nProbe = 2)
      .collect().map(_.getLong(2)).toSet
    assert(two == Set(11L, 20L, 21L)) // both cells probed
  }

  test("trainCentroids: k-means converges onto separated clusters; trained IVF recall vs brute") {
    import spark.implicits._
    // three axis-aligned clusters, 6 points each, slight per-point jitter
    def pts(base: Int, dir: Int): Seq[(Long, Seq[Float])] =
      (0 until 6).map { i =>
        val v = Array(0.05f * (i % 3), 0.05f * ((i + 1) % 3), 0.05f * ((i + 2) % 3))
        v(dir) = 1.0f
        ((base + i).toLong, v.toSeq)
      }
    val corpus = (pts(0, 0) ++ pts(10, 1) ++ pts(20, 2)).toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(corpus, "vec_id", "embedding", nCells = 3, iters = 4)
    val rows = cents.collect()
    assert(rows.length == 3 && rows.map(_.getLong(0)).toSet == Set(0L, 1L, 2L))
    // each trained centroid points into a cluster: its dominant
    // component carries most of the direction
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.max > 0.5f, s"centroid outside every cluster: $v")
    }
    // self-contained ANN: trained quantizer, single-probe, vs exact brute
    val brute = Similarity.bruteForceTopK(corpus, "vec_id", corpus, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(corpus, "vec_id", corpus, "vec_id", "embedding",
      cents, "cent_id", "cent_vec", k = 3, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall=$recall")
    // nCells larger than the cluster count: empty cells keep their
    // init centroid — the quantizer never shrinks or goes null
    val four = Similarity.trainCentroids(corpus, "vec_id", "embedding", nCells = 4, iters = 2)
      .collect()
    assert(four.length == 4 && four.forall(!_.isNullAt(1)))
    // corpus smaller than nCells: quantizer seeds one cell per row
    val tiny = corpus.limit(2)
    val small = Similarity.trainCentroids(tiny, "vec_id", "embedding", nCells = 16, iters = 1)
      .collect()
    assert(small.length == 2 && small.forall(!_.isNullAt(1)))
    // empty corpus: rejected up front, not an empty quantizer
    intercept[IllegalArgumentException] {
      Similarity.trainCentroids(corpus.limit(0), "vec_id", "embedding", nCells = 4, iters = 1)
    }
  }

  // --------------------------------------------- deterministic sampling

  test("hash sampling: stable, salt-sensitive, nested subsets, sane proportions") {
    import spark.implicits._
    val keys = (1L to 1000L).toDF("id")
    val s25 = Sampling.sampled(keys, "id", "s", 25).collect().map(_.getLong(0)).toSet
    // deterministic: a second evaluation is identical
    assert(Sampling.sampled(keys, "id", "s", 25).collect().map(_.getLong(0)).toSet == s25)
    // nested: the 10% sample is contained in the 25% one (same salt)
    val s10 = Sampling.sampled(keys, "id", "s", 10).collect().map(_.getLong(0)).toSet
    assert(s10.subsetOf(s25))
    // different salt re-draws
    assert(Sampling.sampled(keys, "id", "other", 25).collect().map(_.getLong(0)).toSet != s25)
    // proportions within ±5pp at n=1000
    assert(math.abs(s25.size - 250) < 50)
    val splits = Sampling.withSplit(keys, "id", "sp", 80, 10)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(splits("train") - 800L) < 50)
    assert(splits("train") + splits("val") + splits("test") == 1000L)
  }

  // ------------------------------------------- winnowing fingerprints

  test("winnowFingerprints: shared run ⇒ shared fingerprint; short docs yield none; rightmost tie") {
    // Two docs sharing a run of w+k-1 = 6 tokens must share >= 1
    // fingerprint (the winnowing guarantee); a 5-token doc has no
    // full window and yields no rows.
    val shared = "alpha beta gamma delta epsilon zeta"
    val out = Fingerprint.winnowFingerprints(
      docs(
        1L -> s"one two $shared",
        2L -> s"$shared nine ten",
        3L -> "a b c d e"),
      "doc_id", "text", k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(byDoc.contains(1L) && byDoc.contains(2L))
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
    assert(!byDoc.contains(3L))
    // a doc of identical tokens: every k-gram hash is equal, so every
    // window's rightmost-min is its LAST position — selected positions
    // are w-1 .. nKgrams-1 with one fingerprint value
    val rep = Fingerprint.winnowFingerprints(
      docs(9L -> "x x x x x x x x"), "doc_id", "text", k = 3, w = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // 8 tokens → 6 k-grams → windows at kg positions 0..2, rightmost
    // min of window j..j+3 is j+3 → positions 3, 4, 5
    assert(rep.map(_._1).sorted.toSeq == Seq(3L, 4L, 5L))
    assert(rep.map(_._2).toSet.size == 1)
  }

  // ------------------------------------------------------ keyword search

  test("keywordTopK: integer rank (n_terms, total_tf, doc_id), limit, and filter") {
    val corpus = docs(
      1L -> "spark join join vector",   // 3 distinct terms, total tf 4
      2L -> "join join join join",      // 1 distinct term, total tf 4
      3L -> "vector spark",             // 2 distinct terms, total tf 2
      4L -> "nothing relevant here")
    val out = Search.keywordTopK(corpus, "doc_id", "text",
      terms = Seq("spark", "join", "vector"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 matches 3 distinct terms (tf 4), doc 3 matches 2, doc 2 one
    assert(out.toSet == Set((1L, 3L, 4L), (3L, 2L, 2L)))
    // postings: tf counted per (term, doc)
    val p = Search.postings(corpus, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(p(("join", 2L)) == 4L && p(("join", 1L)) == 2L && !p.contains(("spark", 2L)))
  }

  test("tfidfTopTerms: linear-idf ranking, stopwords sink, ties break by term") {
    val corpus = docs(
      1L -> "x x y the",  // ratios: x 2/1=2.0, y 1/2=0.5, the 1/3
      2L -> "y z the",    // z 1.0, y 0.5, the 1/3
      3L -> "the w")      // w 1.0, the 1/3
    val out = Search.tfidfTopTerms(corpus, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out((1L, 1L)) == ("x", 2L, 1L, 2.0))
    assert(out((1L, 2L)) == ("y", 1L, 2L, 0.5))
    assert(out((2L, 1L)) == ("z", 1L, 1L, 1.0))
    assert(out((2L, 2L)) == ("y", 1L, 2L, 0.5))
    assert(out((3L, 1L)) == ("w", 1L, 1L, 1.0))
    // 'the' (df=3) only surfaces where nothing rarer is left
    assert(out((3L, 2L))._1 == "the")
    assert(out.size == 6)
    // plan: equi-joins only
    val plan = Search.tfidfTopTerms(corpus, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  // ----------------------------------------------------- bucketed joins

  test("bucketed tables join with zero exchanges and correct results") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val left = (1L to 500L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (250L to 750L).map(i => (i, i * 2)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bkt_left", s"$dir/left", "k", nBuckets = 4)
    Bucketing.writeBucketed(right, "bkt_right", s"$dir/right", "k", nBuckets = 4)
    // force the fact-fact path: tiny test tables would otherwise
    // broadcast-join, which bypasses bucketing entirely
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "bkt_left", "bkt_right", "k")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: bucketed scans satisfy the join distribution — a
      // sort-merge join with NO shuffle exchange on either side
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"), s"expected shuffle-free join:\n$plan")
      assert(joined.count() == 251)
      val r = joined.filter(col("k") === 300L).select("lv", "rv").head()
      assert(r.getString(0) == "l300" && r.getLong(1) == 600L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  // ------------------------------------------------- salted aggregation

  test("saltedAggregate equals direct groupBy for count/sum/min/max") {
    import spark.implicits._
    val df = (1L to 997L).map(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i, i * 3))
      .toDF("k", "id", "v")
    val salted = Skew.saltedAggregate(df, Seq("k"), spreadCol = "id", buckets = 8,
      aggs = Seq(Skew.Count("n"), Skew.Sum("s", "v"), Skew.Min("lo", "v"), Skew.Max("hi", "v")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), min("v").as("lo"), max("v").as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(salted == direct)
    // the salt actually spreads: phase-1 has more than one partial row
    // for the hot key
    val partials = df.groupBy(col("k"),
        pmod(xxhash64(col("id")), lit(8L)).as("__salt"))
      .count().filter(col("k") === "hot").count()
    assert(partials > 1)
  }

  // ------------------------------------------------------ interval join

  test("pointInIntervalJoin: inclusive bounds, multi-bin intervals, exactly-once matches") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val iv = Seq(
      (1L, ts("2026-01-01 00:00:00"), ts("2026-01-20 00:00:00")), // spans 3 weekly bins
      (2L, ts("2026-01-05 00:00:00"), ts("2026-01-06 00:00:00")), // overlaps iv 1
      (3L, ts("2026-03-01 00:00:00"), ts("2026-02-01 00:00:00"))  // inverted -> dropped
    ).toDF("iv_id", "s", "e")
    val pt = Seq(
      (10L, ts("2026-01-01 00:00:00")),  // on iv1 start (inclusive)
      (11L, ts("2026-01-20 00:00:00")),  // on iv1 end (inclusive)
      (12L, ts("2026-01-05 12:00:00")),  // inside iv1 AND iv2
      (13L, ts("2026-02-15 00:00:00"))   // matches nothing
    ).toDF("pt_id", "p")
    val out = Intervals.pointInIntervalJoin(iv, "s", "e", pt, "p", binSeconds = 7 * 86400)
      .select("iv_id", "pt_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // exactly-once per true match: compare as a multiset
    assert(out.sorted.toSeq == Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 12L)))
    // plan is an equi-join on the bin, not a nested loop / cartesian
    val plan = Intervals.pointInIntervalJoin(iv, "s", "e", pt, "p")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("winnowFingerprints equals a sequential reference implementation on random docs") {
    // pure-Scala reference: md5-hex-first-8 token hash, Rabin-Karp
    // k-grams, rightmost-min winnowing — computed imperatively
    def md5hash(t: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    def reference(text: String, k: Int, w: Int): Set[(Long, Long)] = {
      val th = text.split(" ").map(md5hash)
      if (th.length < k + w - 1) return Set.empty
      val kg = th.sliding(k).map(_.foldLeft(0L)((h, c) => (h * 1000003L % 1000000007L + c) % 1000000007L)).toArray
      (0 to kg.length - w).flatMap { j =>
        val win = kg.slice(j, j + w)
        val m = win.min
        val rel = win.lastIndexWhere(_ == m)
        Some(((j + rel).toLong, m))
      }.toSet
    }
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "fff", "gg", "hhh")
    val corpus = (1L to 30L).map { i =>
      i -> Seq.fill(rnd.nextInt(20) + 1)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val got = Fingerprint.winnowFingerprints(docs(corpus: _*), "doc_id", "text", k = 3, w = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    corpus.foreach { case (id, text) =>
      val exp = reference(text, 3, 4)
      assert(got.getOrElse(id, Set.empty) == exp, s"doc $id: '$text'")
    }
  }

  // --------------------------------------------------------- as-of join

  test("leftAsOf: inclusive equality, tie-break, and no-prior-row null") {
    import spark.implicits._
    val left = Seq(
      ("k1", 10L, "e1"), // equal-timestamp right must match (inclusive)
      ("k1", 5L, "e2"),  // before any right row → nulls
      ("k2", 100L, "e3") // two rights at t=50: larger tie-break wins
    ).toDF("key", "t", "name")
    val right = Seq(
      ("k1", 10L, 1L, "r1"),
      ("k2", 50L, 2L, "r2a"),
      ("k2", 50L, 3L, "r2b")).toDF("key", "rt", "rid", "payload")
    val out = AsOfJoin.leftAsOf(left, right, "key", "t", "rt", Seq("rid", "payload"), "rid")
      .orderBy("name")
      .collect().map(r => (r.getString(2), r.get(3), r.get(4)))
    assert(out.toSeq == Seq(
      ("e1", 1L, "r1"),
      ("e2", null, null),
      ("e3", 3L, "r2b")))
  }

  // ------------------------------------------------- BPE-ish tokens

  test("bpeTokens: GPT-2-shaped boundaries on JSON-like text") {
    val r = docs(1L -> "ignored")
      .select(TextAnalysis.bpeTokens(lit("""{"k": 69} it's ok2""")).as("t"))
      .head().getSeq[String](0)
    assert(r == Seq("{\"", "k", "\":", " 69", "}", " it", "'s", " ok", "2"))
  }

  test("bpeTokens partitions the input: non-contraction apostrophes are kept") {
    val r = docs(1L -> "ignored")
      .select(TextAnalysis.bpeTokens(lit("rock 'n roll")).as("t"))
      .head().getSeq[String](0)
    assert(r == Seq("rock", " '", "n", " roll"))
    assert(r.mkString == "rock 'n roll") // full partition, nothing dropped
  }

  test("bpeTokenCount vs whitespace count on plain words") {
    val r = docs(1L -> "ignored").select(
      TextAnalysis.bpeTokenCount(lit("alpha beta gamma")).as("bpe"),
      TextAnalysis.tokenCount(lit("alpha beta gamma")).as("ws")).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
  }

  // ---------------------------------------------------- vocab top-k

  test("vocabTopK: counts, doc frequency, and (count desc, token) rank order") {
    val out = TextAnalysis.vocabTopK(
      docs(1L -> "b a a", 2L -> "a b", 3L -> "c"), "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, "a", 3L, 2L), (2L, "b", 2L, 2L)))
  }

  // --------------------------------------------------------- BM25

  test("bm25TopK: matches float BM25 ranking on a hand corpus") {
    val corpus = Seq(
      1L -> "x x x y",       // tf(x)=3, dl=4
      2L -> "x y",           // tf(x)=1, dl=2
      3L -> "x x y y y y y", // tf(x)=2, dl=7
      4L -> "y y")           // no x
    val out = Search.bm25TopK(docs(corpus: _*), "doc_id", "text", Seq("x"), k = 10)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    // float reference: score = tf*2.2 / (tf + 1.2*(0.25 + 0.75*dl/avgdl))
    val dls = corpus.map(_._2.split(" ").length.toDouble)
    val avgdl = dls.sum / dls.length
    def score(tf: Double, dl: Double) = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val expect = Seq((1L, 3.0, 4.0), (2L, 1.0, 2.0), (3L, 2.0, 7.0))
      .sortBy { case (id, tf, dl) => (-score(tf, dl), id) }
      .zipWithIndex.map { case ((id, _, _), i) => (i + 1L, id) }
    assert(out.toSeq == expect)
  }

  test("bm25PrefilterOverflow: truncated terms reported with the cut-tf bounds; lossless runs empty") {
    // term "x": 5 postings with tfs 4,3,2,1,1 (doc order breaks the tie)
    val corpus = docs(
      1L -> "x x x x", 2L -> "x x x y", 3L -> "x x y y",
      4L -> "x y y y", 5L -> "x y", 6L -> "y y")
    // C=3 cuts docs 4 and 5 (ranks 4,5); boundary tf = rank-3 tf = 2
    val over = Search.bm25PrefilterOverflow(corpus, "doc_id", "text", Seq("x", "y"), prefilterC = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    // "y" has 5 postings too (docs 2..6, tfs 1,2,3,1,2) → also truncated
    assert(over.sortBy(_._1) == Seq(("x", 5L, 2L, 2L, 1L), ("y", 5L, 2L, 2L, 1L)), over.toString)
    // the recall invariant the audit certifies: every cut doc's tf is
    // bounded by the boundary tf
    over.foreach { case (_, _, _, boundary, maxCut) => assert(maxCut <= boundary) }
    // C >= posting-list length → lossless, audit is empty
    assert(Search.bm25PrefilterOverflow(corpus, "doc_id", "text", Seq("x", "y"), prefilterC = 5)
      .isEmpty)
  }

  // ---------------------------------------------------- PII redaction

  test("redactPii: emails before phones, dotted local part survives intact") {
    val r = docs(1L -> "ignored").select(
      TextAnalysis.redactPii(
        lit("call 25-989-741 or 12.34.56@ex.com, id 1234567")).as("t"))
      .head().getString(0)
    // the dotted-digit email local part must NOT be half-eaten as a phone
    assert(r == "call [PHONE] or [EMAIL], id 1234567")
  }

  test("redactPii: lone digit pair and separator-free runs are kept") {
    val r = docs(1L -> "ignored").select(
      TextAnalysis.redactPii(lit("range 10-20 and 123456789")).as("t"))
      .head().getString(0)
    assert(r == "range 10-20 and 123456789")
  }

  // ---------------------------------------------------- quality gate

  test("qualityFilter: first failing rule names the drop") {
    val stop = "the a an and or of to in is it"
    val out = TextAnalysis.qualityFilter(
      docs(
        1L -> s"good words here with $stop more text padding", // keep (13 tokens, stopwords)
        2L -> "short",                                          // too_short
        3L -> ("a " * 4 + "zzzzzzzzzzzzzzzzzzzzzz " * 8).trim,  // long_words (avg > 10)
        4L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda", // no_stopwords
        5L -> s"$stop $stop $stop"),                             // repetitive (dup frac 2/3)
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getString(3))).toMap
    assert(out(1L) == ((true, null)))
    assert(out(2L) == ((false, "too_short")))
    assert(out(3L) == ((false, "long_words")))
    assert(out(4L) == ((false, "no_stopwords")))
    assert(out(5L) == ((false, "repetitive")))
  }

  // ------------------------------------------------------- chunking

  test("chunkWindows: overlap, trailing partial, empty doc dropped") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val out = TextAnalysis.chunkWindows(
      docs(1L -> text, 2L -> ""), "doc_id", "text", size = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 2 ("" splits to [""], one token "" — a 1-token doc) produces one chunk
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 4L, "t7 t8 t9 t10"),
      (1L, 3L, 1L, "t10")))
  }

  test("chunkWindows rejects stride > size") {
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkWindows(docs(1L -> "x"), "doc_id", "text", size = 2, stride = 3)
    }
  }

  // ---------------------------------------------- edit-distance verify

  test("editDistanceVerify: keeps only candidates within maxDist") {
    import spark.implicits._
    val corpus = docs(1L -> "kitten", 2L -> "sitten", 3L -> "sittings", 4L -> "kitten")
    val cand = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.editDistanceVerify(cand, corpus, "doc_id", "text", maxDist = 1)
      .orderBy("id_b").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // kitten→sitten = 1 kept; kitten→sittings = 3 dropped; exact dup = 0 kept
    assert(out.toSeq == Seq((1L, 2L, 1L), (1L, 4L, 0L)))
  }

  // ---------------------------------------------- stratified sampling

  test("stratifiedSampled: per-stratum thresholds, nested within stratum") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val sampled = Sampling.stratifiedSampled(df, "doc_id", "lang", "s1",
      Map("en" -> 50), defaultPct = 10)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 200 per stratum: en keeps ~half, de ~a tenth (hash spread, wide bounds)
    assert(byLang("en") > 60L && byLang("en") < 140L)
    assert(byLang.getOrElse("de", 0L) < 50L)
    // nesting: the 10%-everywhere sample is a subset of this one for en
    val tight = Sampling.stratifiedSampled(df, "doc_id", "lang", "s1",
      Map("en" -> 10), defaultPct = 10)
    val tightIds = tight.filter($"lang" === "en").select("doc_id").collect().map(_.getLong(0)).toSet
    val wideIds = sampled.filter($"lang" === "en").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tightIds.subsetOf(wideIds))
  }

  test("tokenBudgetMix: two-phase plan equals the naive window cumsum exactly") {
    import spark.implicits._
    val d = graft.Tables(spark, sf("sf0.001")).documents
      .withColumn("tok", size(split(col("text"), " ")).cast("long"))
    val budgets = Map("en" -> 3000L)
    val out = Sampling.tokenBudgetMix(
      d, "doc_id", "lang", col("tok"), "tb1", budgets, defaultBudget = 1000L,
      nBuckets = 16)
    // naive reference: one window cumsum over the contract ordering
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy(col("__b"), col("__h"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naive = d
      .withColumn("__h", md5(concat_ws(":", lit("tb1"), col("doc_id").cast("string"))))
      .withColumn("__b", conv(substring(col("__h"), 1, 8), 16, 10).cast("long") % 16)
      .withColumn("__cum", sum("tok").over(w))
      .filter(col("__cum") <= when(col("lang") === "en", 3000L).otherwise(1000L))
    val got = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val want = naive.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"two-phase diverged: extra=${got -- want} missing=${want -- got}")
    assert(got.nonEmpty && got.size < d.count(), "budget must bite")
    // each kept row appears exactly once (keep ∪ refine is disjoint)
    assert(out.count() == got.size)
    // stratum totals respect the budget
    val totals = out.groupBy("lang").agg(sum("tok").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, t) =>
      assert(t <= (if (lang == "en") 3000L else 1000L), s"$lang over budget: $t") }
  }

  test("tokenBudgetMix: zero budget keeps nothing; inclusive boundary keeps the landing doc") {
    import spark.implicits._
    val d = Seq((1L, "s", 5L), (2L, "s", 5L), (3L, "s", 5L))
      .toDF("doc_id", "lang", "tok")
    assert(Sampling.tokenBudgetMix(d, "doc_id", "lang", col("tok"), "z",
      Map.empty, defaultBudget = 0L).count() == 0)
    // budget exactly two docs: inclusive boundary
    assert(Sampling.tokenBudgetMix(d, "doc_id", "lang", col("tok"), "z",
      Map.empty, defaultBudget = 10L).count() == 2)
    // budget covers all
    assert(Sampling.tokenBudgetMix(d, "doc_id", "lang", col("tok"), "z",
      Map.empty, defaultBudget = 15L).count() == 3)
  }

  test("Snapshot.diff: added/removed/changed/unchanged by content fingerprint") {
    import spark.implicits._
    val old = Seq(
      (1L, "alpha beta"), (2L, "gamma"), (3L, "delta"), (4L, "same  TEXT"))
      .toDF("doc_id", "text")
    val neu = Seq(
      (1L, "alpha beta edited"), // changed
      (3L, "delta"),             // unchanged
      (4L, "SAME text"),         // unchanged after collapse+lowercase
      (5L, "brand new"))         // added; 2 removed
      .toDF("doc_id", "text")
    val out = Snapshot.diff(old, neu, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "changed", 2L -> "removed", 3L -> "unchanged",
      4L -> "unchanged", 5L -> "added"))
    val sums = Snapshot.diffSummary(old, neu, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums == Map("changed" -> 1L, "removed" -> 1L, "unchanged" -> 2L, "added" -> 1L))
    // fp columns: NULL on the absent side only
    val fps = Snapshot.diff(old, neu, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.isNullAt(2), r.isNullAt(3))).toMap
    assert(fps(2L) == (false, true) && fps(5L) == (true, false))
    assert(fps(1L) == (false, false))
  }

  // ------------------------------------------- plan-shape guards
  // The scale property each new operator claims, asserted on the
  // physical plan so a refactor can't silently regress it.

  test("plan shapes: map-side-only ops have no Exchange; vocab top-k is TakeOrdered") {
    val df = docs(1L -> "a b c d e f g h", 2L -> "x y z")
    def planOf(q: org.apache.spark.sql.DataFrame) = q.queryExecution.executedPlan.toString

    // stratified sampling and chunking: pure scan-project-filter, zero shuffles
    import spark.implicits._
    val langs = Seq((1L, "en"), (2L, "de")).toDF("doc_id", "lang")
    val sampled = Sampling.stratifiedSampled(langs, "doc_id", "lang", "s", Map("en" -> 50), 10)
    assert(!planOf(sampled).contains("Exchange"), planOf(sampled))
    val chunks = TextAnalysis.chunkWindows(df, "doc_id", "text", size = 4, stride = 4)
    assert(!planOf(chunks).contains("Exchange"), planOf(chunks))
    val redacted = df.select(TextAnalysis.redactPii(col("text")))
    assert(!planOf(redacted).contains("Exchange"), planOf(redacted))
    val gated = TextAnalysis.qualityFilter(df, "doc_id", "text")
    assert(!planOf(gated).contains("Exchange"), planOf(gated))

    // vocab top-k: per-task heaps + driver merge, never a global sort
    val vocab = TextAnalysis.vocabTopK(df, "doc_id", "text", 5)
    assert(planOf(vocab).contains("TakeOrderedAndProject"), planOf(vocab))

    // bm25: the only nested-loop join is the broadcast of the 1-row
    // corpus stats; candidate pairing must stay an equi-join
    val bm25 = Search.bm25TopK(df, "doc_id", "text", Seq("a"), k = 3)
    assert(!planOf(bm25).contains("CartesianProduct"), planOf(bm25))
  }

  // -------------------------------------------- approximate distinct

  test("approx_count_distinct tracks the exact vocabulary within its rsd") {
    val rnd = new scala.util.Random(13)
    val vocab = (1 to 900).map(i => s"w$i")
    val corpus = (1L to 60L).map(i =>
      i -> Seq.fill(50)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val r = docs(corpus: _*)
      .select(explode(split(col("text"), " ")).as("token"))
      .agg(
        approx_count_distinct(col("token"), 0.02).as("approx"),
        countDistinct(col("token")).as("exact"))
      .head()
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    // 0.02 rsd; allow 5 sigma
    assert(math.abs(approx - exact) / exact < 0.10, s"approx=$approx exact=$exact")
  }

  // ------------------------------------------------- range layout

  test("writeRangeClustered: output files cover disjoint sorted key ranges") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("range_layout").toString + "/t"
    val df = (1L to 4000L).map(i => (i * 2654435761L % 100000L, i)).toDF("k", "payload")
    Layout.writeRangeClustered(df, dir, numFiles = 8, "k")
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 8)
    // per-file (min,max) of the cluster key must be pairwise disjoint —
    // the property parquet footer pruning relies on
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("k"), max("k")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlapping file ranges: $ranges")
      case _ =>
    }
    // nothing lost in the re-layout
    assert(spark.read.parquet(dir).count() == 4000L)
  }

  test("writeShuffleShards: per-shard directories hold rows in shard_pos order, full coverage, reproducible") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shard_layout").toString + "/t"
    val df = (1L to 200L).map(i => (i, s"payload-$i")).toDF("id", "payload")
    Layout.writeShuffleShards(df, "id", nShards = 4, salt = "sh1", path = dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 200L && back.select("id").distinct().count() == 200L)
    // within each shard directory, parquet row order == shard_pos order
    (0 until 4).foreach { sh =>
      val rows = spark.read.parquet(s"$dir/shard=$sh")
        .select("shard_pos", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq,
        s"shard $sh rows not stored in shard_pos order")
      assert(rows.map(_._1).toSeq == (0L until rows.length).toSeq, s"shard $sh positions not dense")
    }
    // reproducible: the permutation is a pure function of (salt, ids)
    val ref = Sampling.shuffleShards(df, "id", 4, "sh1")
      .select("id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val persisted = back.select(col("id"), col("shard").cast("long"), col("shard_pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(persisted == ref)
  }

  // ---------------------------------------------- sequence packing

  test("packSequences: budget respected, complete, deterministic, oversized isolated") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val items = (1L to 200L).map(i => (i, rnd.nextInt(40) + 1L)) :+ (201L, 150L)
    val df = items.toDF("doc_id", "n_tokens")
    def run() = Packing.packSequences(df, "doc_id", "n_tokens", budget = 100L, numBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val out = run()
    // complete and disjoint
    assert(out.map(_._1).toSet == items.map(_._1).toSet && out.length == items.length)
    // budget respected except single-item oversized packs
    val byPack = out.groupBy(_._3).values
    byPack.foreach { members =>
      val total = members.map(_._2).sum
      assert(total <= 100L || members.length == 1, s"over-budget multi-item pack: $members")
    }
    // the oversized doc sits alone
    val overPack = out.find(_._1 == 201L).get._3
    assert(out.count(_._3 == overPack) == 1)
    // packing actually packs (fewer packs than docs)
    assert(byPack.size < items.length / 2)
    // deterministic across runs
    assert(run().sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("bm25TopK: exact integer ranking equals float BM25 on random corpora") {
    val rnd = new scala.util.Random(17)
    // words chosen so tf/dl vary; term "t" appears with varying counts
    (1 to 3).foreach { trial =>
      val corpus = (1L to 20L).map { i =>
        val nT = rnd.nextInt(5) // 0..4 occurrences of the query term
        val nPad = rnd.nextInt(30) + 1
        i -> (Seq.fill(nT)("t") ++ Seq.fill(nPad)("pad")).mkString(" ")
      }
      val out = Search.bm25TopK(docs(corpus: _*), "doc_id", "text", Seq("t"), k = 20)
        .orderBy("rank").collect().map(_.getLong(2))
      val dls = corpus.map(_._2.split(" ").length.toDouble)
      val avgdl = dls.sum / dls.length
      def score(tf: Double, dl: Double) = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      val expect = corpus
        .map { case (id, t) => (id, t.split(" ").count(_ == "t").toDouble, t.split(" ").length.toDouble) }
        .filter(_._2 > 0)
        .sortBy { case (id, tf, dl) => (-score(tf, dl), id) }
        .map(_._1)
      assert(out.toSeq == expect, s"trial $trial")
    }
  }

  test("quantizeInt8 property: codes bounded, dequantization error < scale/127") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vecs = (1L to 50L).map(i => (i, Seq.fill(16)((rnd.nextFloat() - 0.5f) * 10f)))
    val rows = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding"), Similarity.quantizeInt8(col("embedding")).as("q"))
      .collect()
    rows.foreach { r =>
      val emb = r.getSeq[Float](1)
      val s = r.getStruct(2).getDouble(0)
      val codes = r.getStruct(2).getSeq[Int](1)
      assert(s == emb.map(x => math.abs(x.toDouble)).max)
      codes.foreach(c => assert(c >= -127 && c <= 127))
      emb.zip(codes).foreach { case (x, c) =>
        val back = c * s / 127.0
        assert(math.abs(x.toDouble - back) < s / 127.0 + 1e-12,
          s"x=$x code=$c back=$back scale=$s")
      }
    }
  }

  // ------------------------------------------------- int8 quantize

  test("quantizeInt8: scale, truncation toward zero, zero-vector guard") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"), Similarity.quantizeInt8(col("embedding")).as("q"))
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getStruct(1).getDouble(0), r.getStruct(1).getSeq[Int](1)))
    assert(out(0) == ((1L, 1.0d, Seq(127, -63, 31, 0)))) // -63.5/31.75 truncate toward zero
    assert(out(1) == ((2L, 0.0d, Seq(0, 0))))
  }

  // ------------------------------------------- near-dup dedup output

  test("dedupNearDups: keeps one representative per cluster, full schema, unclustered untouched") {
    import spark.implicits._
    val fam1 = "the quick brown fox jumps over the lazy dog again today"
    val fam2 = "entirely different second family text with many shared tokens here also"
    val corpus = Seq(
      (1L, fam1, "a"), (2L, fam1, "b"), (3L, fam1, "c"), // cluster → keep 1
      (4L, fam2, "d"), (5L, fam2, "e"),                  // cluster → keep 4
      (6L, "a lone document that matches nothing else in this tiny corpus", "f"))
      .toDF("doc_id", "text", "extra")
    val out = Dedup.dedupNearDups(corpus, "doc_id", "text",
      n = 3, k = 12, rowsPerBand = 3, threshold = 0.5)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 4L, 6L))
    // full original row survives (payload columns intact)
    assert(out.map(_.getString(2)).toSeq == Seq("a", "d", "f"))
  }

  test("dedupNearDupsBest: fully generic id types — string ids with quality ties") {
    import spark.implicits._
    val fam = "the quick brown fox jumps over the lazy dog again today"
    val corpus = Seq(
      ("doc-b", fam, 5L), ("doc-a", fam, 5L), ("doc-c", fam, 9L), // keep doc-c (max q)
      ("zz-solo", "a lone document that matches nothing else in this tiny corpus", 1L))
      .toDF("doc_id", "text", "quality")
    val out = Dedup.dedupNearDupsBest(corpus, "doc_id", "text",
      n = 3, k = 12, rowsPerBand = 3, threshold = 0.5, qualityCol = col("quality"))
      .orderBy("doc_id").collect().map(_.getString(0)).toSeq
    assert(out == Seq("doc-c", "zz-solo"))
  }

  test("dedupNearDupsBest: survivor is the highest-quality member, ties break to smallest id") {
    import spark.implicits._
    val fam1 = "the quick brown fox jumps over the lazy dog again today"
    val fam2 = "entirely different second family text with many shared tokens here also"
    val corpus = Seq(
      (1L, fam1, 10L), (2L, fam1, 99L), (3L, fam1, 50L), // cluster → keep 2 (max quality)
      (4L, fam2, 7L), (5L, fam2, 7L),                    // quality tie → keep 4 (min id)
      (6L, "a lone document that matches nothing else in this tiny corpus", 1L))
      .toDF("doc_id", "text", "quality")
    val out = Dedup.dedupNearDupsBest(corpus, "doc_id", "text",
      n = 3, k = 12, rowsPerBand = 3, threshold = 0.5, qualityCol = col("quality"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 4L, 6L))
    assert(out.map(_.getLong(2)).toSeq == Seq(99L, 7L, 1L), "full original row survives")
  }

  test("dedupNearDupsBest: null quality never wins; all-null cluster keeps every member") {
    import spark.implicits._
    val fam1 = "the quick brown fox jumps over the lazy dog again today"
    val fam2 = "entirely different second family text with many shared tokens here also"
    val corpus = Seq(
      (1L, fam1, Some(3L)), (2L, fam1, None), (3L, fam1, Some(8L)), // keep 3; null member 2 loses
      (4L, fam2, None), (5L, fam2, None),                           // all-null → keep both
      (6L, "a lone document that matches nothing else in this tiny corpus", Some(1L)))
      .toDF("doc_id", "text", "quality")
    val out = Dedup.dedupNearDupsBest(corpus, "doc_id", "text",
      n = 3, k = 12, rowsPerBand = 3, threshold = 0.5, qualityCol = col("quality"))
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(3L, 4L, 5L, 6L))
  }

  test("groupSafeSplit: near-dup groups never straddle splits; singletons match withSplit") {
    import spark.implicits._
    val fam1 = "the quick brown fox jumps over the lazy dog again today"
    val fam2 = "entirely different second family text with many shared tokens here also"
    val solo = "a lone document that matches nothing else in this tiny corpus"
    val corpus = Seq(
      (1L, fam1), (2L, fam1), (7L, fam1),   // one group, rep = 1
      (4L, fam2), (5L, fam2),               // one group, rep = 4
      (6L, solo))                           // singleton, rep = itself
      .toDF("doc_id", "text")
    val out = Dedup.groupSafeSplit(corpus, "doc_id", "text",
      n = 3, k = 12, rowsPerBand = 3, threshold = 0.5,
      salt = "sp", trainPct = 80, valPct = 10)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 1L), (4L, 4L), (5L, 4L), (6L, 6L), (7L, 1L)))
    // whole group shares one split
    val byGroup = out.groupBy(_.getLong(1)).view.mapValues(_.map(_.getString(2)).distinct)
    assert(byGroup.values.forall(_.size == 1), s"split straddles a group: $byGroup")
    // a singleton's split is exactly what per-doc withSplit assigns (same salt)
    val singletonSplit = out.find(_.getLong(0) == 6L).get.getString(2)
    val perDoc = Sampling.withSplit(Seq(6L).toDF("doc_id"), "doc_id", "sp", 80, 10)
      .collect().head.getString(1)
    assert(singletonSplit == perDoc)
  }

  test("uniformPerKey: exactly k per key, deterministic, salt redraws the sample") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (i, if (i <= 30) "big" else "small", s"p$i"))
      .toDF("id", "src", "payload")
    val s1 = Sampling.uniformPerKey(df, "src", "id", k = 4, salt = "a").collect()
    assert(s1.count(_.getString(1) == "big") == 4 && s1.count(_.getString(1) == "small") == 4)
    val s1again = Sampling.uniformPerKey(df, "src", "id", k = 4, salt = "a")
      .collect().map(_.getLong(0)).toSet
    assert(s1.map(_.getLong(0)).toSet == s1again, "same salt → same sample")
    val s2 = Sampling.uniformPerKey(df, "src", "id", k = 4, salt = "b")
      .collect().map(_.getLong(0)).toSet
    assert(s1.map(_.getLong(0)).toSet != s2, "different salt → different draw")
    // a key smaller than k keeps all members
    assert(Sampling.uniformPerKey(df.filter($"id" > 38), "src", "id", 4, "a").count() == 2)
  }

  test("shuffleShards: valid deterministic permutation — dense per-shard positions, full coverage") {
    import spark.implicits._
    val df = (1L to 100L).toDF("id")
    val out = Sampling.shuffleShards(df, "id", nShards = 4, salt = "s")
      .select("id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 100 && out.map(_._1).distinct.length == 100)
    assert(out.forall(t => t._2 >= 0 && t._2 < 4))
    // positions within each shard are exactly 0..n-1 (dense, no gaps)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // deterministic: identical permutation on re-run
    val again = Sampling.shuffleShards(df, "id", nShards = 4, salt = "s")
      .select("id", "shard", "shard_pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  // ------------------------------------------------- per-key cap

  test("perKeyCap: top-n per key by sort key desc with id tiebreak; payload stays off the rank shuffle") {
    import spark.implicits._
    val df = Seq(
      (1L, "s1", 10L, "p1"), (2L, "s1", 30L, "p2"), (3L, "s1", 30L, "p3"),
      (4L, "s1", 5L, "p4"), (5L, "s2", 1L, "p5"))
      .toDF("id", "src", "score", "payload")
    val out = Sampling.perKeyCap(df, "src", "id", 2, col("score"))
      .orderBy("id").collect()
    // s1: scores 30(id 2), 30(id 3) win over 10/5 — tiebreak keeps lower id first
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 3L, 5L))
    assert(out.map(_.getString(3)).toSeq == Seq("p2", "p3", "p5")) // full rows
    // plan shape: the Window ranks a narrow projection — the payload
    // attribute must not appear anywhere in the window subtree
    val win = Sampling.perKeyCap(df, "src", "id", 2, col("score"))
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(win.nonEmpty)
    win.foreach(w => assert(!w.output.map(_.name).contains("payload")))
  }

  // ------------------------------------------- signed random projection

  test("randomProject: bit-equal to the scalar reference fold; deterministic") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(0.25f, -1.5f, 3.0f, 0.125f, -0.75f)),
      (2L, Seq(1.0f, 1.0f, 1.0f, 1.0f, 1.0f)))
    val out = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.randomProject(col("embedding"), dim = 5, outDim = 3).as("p"))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    // scalar reference: identical sign derivation and left-to-right fold
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, d: Int): Double = {
      md.reset()
      if ((md.digest(s"rp:$j:$d".getBytes("UTF-8"))(0) & 0x80) == 0) 1.0 else -1.0
    }
    vecs.zip(out).foreach { case ((id, v), (oid, proj)) =>
      assert(id == oid)
      (0 until 3).foreach { j =>
        val expect = (0 until 5).foldLeft(0.0)((acc, d) => acc + v(d).toDouble * sign(j, d))
        assert(proj(j) == expect, s"vec $id dim $j") // exact, not approximate
      }
    }
  }

  test("randomProject: large-matrix HOF form is bit-equal to the same scalar fold") {
    import spark.implicits._
    // dim*outDim = 60*70 = 4200 > 4096 → the aggregate-HOF plan form
    val dim = 60; val outDim = 70
    val v = (0 until dim).map(d => ((d * 37 % 19) - 9) * 0.125f)
    val proj = Seq((1L, v)).toDF("vec_id", "embedding")
      .select(Similarity.randomProject(col("embedding"), dim, outDim).as("p"))
      .head().getSeq[Double](0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, d: Int): Double = {
      md.reset()
      if ((md.digest(s"rp:$j:$d".getBytes("UTF-8"))(0) & 0x80) == 0) 1.0 else -1.0
    }
    (0 until outDim).foreach { j =>
      val expect = (0 until dim).foldLeft(0.0)((acc, d) => acc + v(d).toDouble * sign(j, d))
      assert(proj(j) == expect, s"dim $j") // exact — HOF fold preserves add order
    }
  }

  // ------------------------------------------- PNG encoder round trip

  test("encodePng → PngDecode round trip: every color type and filter type, exact bytes") {
    for (ch <- Seq(1, 2, 3, 4)) {
      val (w, h) = (7, 6) // 6 rows cycle through filters 0..4 and wrap
      def pix(x: Int, y: Int, c: Int): Int = (x * 7 + y * 13 + c * 31 + ch * 3) % 256
      val png = Multimodal.encodePng(w, h, ch, pix, y => y % 5)
      val d = graft.functions.PngDecode.decode(png)
      assert(d != null, s"channels=$ch did not decode")
      assert((d.width, d.height, d.channels) == ((w, h, ch)))
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert((d.pixels(y * w * ch + x * ch + c) & 0xFF) == pix(x, y, c),
          s"ch=$ch pixel ($x,$y,$c)")
    }
  }

  // ------------------------------------------- approx quantiles band

  test("approx_percentile tracks the exact percentile within the 2%-of-range band") {
    val li = spark.read.parquet(sf("sf0.001/lineitem.parquet"))
    val rows = li.groupBy("l_returnflag")
      .agg(
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"),
        expr("percentile(l_extendedprice, 0.5)").as("e50"),
        expr("percentile(l_extendedprice, 0.9)").as("e90"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("a50"),
        expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("a90"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val band = 0.02 * (r.getAs[Double]("hi") - r.getAs[Double]("lo"))
      assert(math.abs(r.getAs[Double]("a50") - r.getAs[Double]("e50")) <= band)
      assert(math.abs(r.getAs[Double]("a90") - r.getAs[Double]("e90")) <= band)
    }
  }

  // ------------------------------------------ boilerplate n-grams

  test("boilerplateNgrams: doc-frequency ranking, minDocs prune, top-k heap plan") {
    val d = docs(
      1L -> "copyright acme corp page one",
      2L -> "copyright acme corp page two",
      3L -> "copyright acme corp again copyright acme corp",
      4L -> "unrelated words entirely here")
    val out = TextAnalysis.boilerplateNgrams(d, "doc_id", "text", n = 3, minDocs = 2, k = 10)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // "copyright acme corp" is in docs 1,2,3 with 4 total occurrences;
    // every other gram is single-doc and pruned by minDocs=2
    assert(rows.head == ((1L, "copyright acme corp", 3L, 4L)))
    assert(rows.forall(_._3 >= 2L))
    assert(rows.map(_._2).distinct.length == rows.length)
    // the top-k must plan as a per-task heap, not a global sort
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.linesIterator.take(12).mkString("\n"))
  }

  // ------------------------------------------------ span-level dedup

  test("spanDupStats: first occurrence is canonical, later copies count as dups") {
    // size=2 spans; doc 1 = [a b][c d], doc 2 = [a b][a b], doc 3 = [x y]
    val d = docs(1L -> "a b c d", 2L -> "a b a b", 3L -> "x y")
    val out = Dedup.spanDupStats(d, "doc_id", "text", size = 2, maxDupFrac = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    // doc 1 owns both its spans (first occurrences); doc 2's two "a b"
    // spans are both later copies of doc 1's
    assert(out(0) == ((1L, 2L, 0L, 0.0, true)))
    assert(out(1) == ((2L, 2L, 2L, 1.0, false)))
    assert(out(2) == ((3L, 1L, 0L, 0.0, true)))
  }

  test("spanDupStats: intra-document repeats dedup against their own first span") {
    val out = Dedup.spanDupStats(
      docs(7L -> "p q p q p q"), "doc_id", "text", size = 2, maxDupFrac = 0.9)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(4)))
    assert(out.head == ((3L, 2L, true))) // spans 2,3 duplicate span 1
  }

  // ------------------------------------------- per-source report

  test("sourceReport: corpus-wide dup membership counts for every holding source") {
    import spark.implicits._
    val d = Seq(
      (1L, "same text", "en", "srcA", 9L),
      (2L, "same  TEXT", "en", "srcB", 10L), // normalizes equal to doc 1
      (3L, "unique one", "fr", "srcA", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Report.sourceReport(d, "source", "lang", "n_chars", "text")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // the cross-source copy counts as a dup in BOTH srcA and srcB
    assert(out(0) == (("srcA", 2L, 19L, 2L, 1L)))
    assert(out(1) == (("srcB", 1L, 10L, 1L, 1L)))
  }

  // -------------------------------- cross-split decontamination

  test("ngramContamination: hit counts over distinct grams, absent short docs") {
    val train = docs(1L -> "the quick brown fox jumps", 2L -> "over the lazy dog today")
    val held = docs(
      10L -> "the quick brown fox jumps high", // grams 1-2 of 2 hit
      11L -> "completely novel held out text",
      12L -> "too short")                      // < 5 tokens: absent
    val out = Fingerprint.ngramContamination(train, held, "doc_id", "text", n = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 2)
    assert(out(0) == ((10L, 2L, 1L, true))) // "the quick brown fox jumps" leaked
    assert(out(1) == ((11L, 1L, 0L, false)))
  }

  test("decontaminate: drops train docs sharing a gram with held-out; short docs survive") {
    val train = docs(
      1L -> "the quick brown fox jumps today", // shares "the quick brown fox jumps"
      2L -> "over the lazy dog right now",     // clean
      3L -> "tiny doc")                        // < 5 tokens: always survives
    val held = docs(10L -> "the quick brown fox jumps high")
    val out = Fingerprint.decontaminate(train, held, "doc_id", "text", n = 5)
    // full train schema preserved, contaminated doc 1 gone
    assert(out.columns.toSeq == train.columns.toSeq)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    // consistency with the detector run in the same direction: a doc
    // survives iff reverse-contamination (train as "held-out") finds
    // zero hits for it
    val rev = Fingerprint.ngramContamination(held, train, "doc_id", "text", n = 5)
      .filter(col("contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rev == Set(1L))
  }

  // ------------------------------------- BPE merge-candidate mining

  test("bpePairCounts: occurrence-weighted adjacent pairs, single-char words skipped") {
    // "ab ab abc x" → pairs: ab(×3: two from "ab", one from "abc"),
    // bc(×1); "x" contributes nothing
    val out = TextAnalysis.bpePairCounts(docs(1L -> "ab ab abc x"), "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "ab", 3L), (2L, "bc", 1L)))
  }

  test("bpePairCounts: top-k plans as a per-task heap, not a global sort") {
    val out = TextAnalysis.bpePairCounts(
      docs(1L -> "aa bb cc dd ee"), "text", k = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.linesIterator.take(12).mkString("\n"))
    assert(out.collect().length == 2)
  }

  test("ngramContamination: no broadcast of the train gram set (scale shape)") {
    val train = docs(1L -> "a b c d e f g")
    val held = docs(2L -> "c d e f g h i")
    val out = Fingerprint.ngramContamination(train, held, "doc_id", "text", n = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(out.collect().head.getBoolean(3)) // "c d e f g" leaked
  }

  test("pqTopK: zero distance to own codewords; cluster structure ranks correctly") {
    import spark.implicits._
    // 8-dim vectors, m=2 subspaces of 4. Corpus = 2 tight clusters
    // around the two codebook samples; each cluster's members must
    // rank each other (and their codeword vector) above the far
    // cluster, and a vector IDENTICAL to a sample has approx_d2 = 0
    // to it (both subspaces encode to that sample's codes).
    def v(base: Float, jitter: Float): Seq[Float] =
      Seq.fill(8)(base).zipWithIndex.map { case (x, i) => x + (if (i % 2 == 0) jitter else 0f) }
    val corpus = Seq(
      (0L, v(0f, 0f)), (1L, v(0f, 0.1f)), (2L, v(0f, 0.2f)),
      (10L, v(5f, 0f)), (11L, v(5f, 0.1f)), (12L, v(5f, 0.2f))
    ).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebookFrom(
      corpus.filter(col("vec_id").isin(0L, 10L)), "vec_id", "embedding", m = 2)
    val queries = corpus.filter(col("vec_id").isin(0L, 11L))
    val got = Similarity.pqTopK(queries, "vec_id", corpus, "vec_id", "embedding",
      cb, m = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byQ = got.groupBy(_._1)
    // approx_d2 is the query → NEIGHBOR'S-CODEWORD distance. Query 0
    // IS codeword 0, and vectors 1, 2 encode to it → exactly 0.0;
    // the far cluster's members encode to codeword 10 → huge.
    val q0 = byQ(0L).sortBy(_._2)
    assert(q0.take(2).map(_._3).toSet == Set(1L, 2L))
    assert(q0.take(2).forall(_._4 == 0.0))
    assert(q0.drop(2).forall(r => Set(10L, 11L, 12L)(r._3) && r._4 > 100.0))
    // query 11 sits jitter-near codeword 10: small positive distance
    // to its own cluster (all encoding to codeword 10), far to the
    // other — and cluster members share ONE approx value (same codes)
    val q11 = byQ(11L).sortBy(_._2)
    assert(q11.take(2).map(_._3).toSet == Set(10L, 12L))
    assert(q11.take(2).forall(r => r._4 > 0.0 && r._4 < 1.0))
    assert(q11.take(2).map(_._4).distinct.size == 1)
    assert(q11.drop(2).forall(_._4 > 100.0))
  }

  test("pqTopK: determinism and self-exclusion") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 60L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebookFrom(
      corpus.filter(col("vec_id") < 4), "vec_id", "embedding", m = 2)
    def run() = Similarity.pqTopK(
      corpus.filter(col("vec_id") < 5), "vec_id", corpus, "vec_id", "embedding",
      cb, m = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val a = run(); val b = run()
    assert(a == b, "PQ ranking must be deterministic")
    assert(a.forall(r => r._1 != r._3), "self-pairs excluded")
    assert(a.groupBy(_._1).forall(_._2.size == 10))
  }

  test("dedupAgainstIndex: increment drops near-dups of history, survives parquet round-trip") {
    import spark.implicits._
    val family = "the quick brown fox jumps over the lazy dog and runs far away today again"
    val history = Seq(
      (1L, family),
      (2L, "an unrelated historical document about databases and query optimization at scale"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, family + " tail"),          // near-dup of history doc 1 -> dropped
      (11L, "a brand new document with entirely fresh content never seen before today"),
      (12L, "short"))                   // no shingles -> never matches, kept
      .toDF("doc_id", "text")
    val index = Dedup.minhashIndex(history, "doc_id", "text", n = 3, k = 12)
    def survivors(idx: org.apache.spark.sql.DataFrame): Seq[Long] =
      Dedup.dedupAgainstIndex(batch, "doc_id", "text", idx,
        n = 3, k = 12, rowsPerBand = 3, minAgree = 0.5)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(survivors(index) == Seq(11L, 12L))
    // the index is a persistable artifact: parquet round-trip changes nothing
    val dir = java.nio.file.Files.createTempDirectory("mhidx").toString
    index.write.mode("overwrite").parquet(dir)
    assert(survivors(spark.read.parquet(dir)) == Seq(11L, 12L))
  }

  test("curation report: independent gate verdicts and the composed kept decision") {
    import spark.implicits._
    val family = "the quick brown fox jumps over the lazy dog and runs far away today"
    val df = Seq(
      (1L, family),                       // canonical near-dup survivor
      (2L, family + " extra"),            // near-dup loser
      (3L, "short text"),                 // quality: too_short
      (4L, family),                       // EXACT copy of 1 -> exact loser (and near-dup loser)
      (5L, "a completely different document about the weather in spring and it is long enough to pass the gate")
    ).toDF("doc_id", "text")
    val got = Curation.report(df, "doc_id", "text",
      n = 3, k = 12, rowsPerBand = 3, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))).toMap
    assert(got(1L) == ((true, false, false, true)))    // kept
    assert(got(2L) == ((true, false, true, false)))    // near-dup loser
    assert(got(3L)._1 == false && got(3L)._4 == false) // quality drop
    assert(got(4L)._2 == true && got(4L)._4 == false)  // exact loser
    assert(got(5L) == ((true, false, false, true)))    // kept
    // gate independence: the exact loser still reports its near-dup flag
    assert(got(4L)._3 == true)
  }

  test("pqTrainCodebook: training cuts quantization error vs the seed codebook") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 3 well-separated cluster centers in each half of an 8-dim space
    def sample(): (Seq[Float]) = {
      val c = rnd.nextInt(3) * 10f
      Seq.fill(8)(c + rnd.nextFloat())
    }
    val corpus = (0L until 200L).map(i => (i, sample())).toDF("vec_id", "embedding")
    // per-(vector, subspace) nearest-codeword d2, summed — the PQ
    // objective; computed directly against each codebook
    def err(cb: org.apache.spark.sql.DataFrame): Double = {
      val sv = corpus.select(col("vec_id"),
        posexplode(array(
          slice(col("embedding"), 1, 4), slice(col("embedding"), 5, 4)))
          .as(Seq("subspace", "sv")))
      sv.join(broadcast(cb), "subspace")
        .withColumn("d2", graft.functions.GraftFunctions.l2sq(col("sv"), col("subvec")))
        .groupBy("vec_id", "subspace").agg(min("d2").as("best"))
        .agg(sum("best")).head.getDouble(0)
    }
    val seed = Similarity.pqTrainCodebook(corpus, "vec_id", "embedding",
      m = 2, ks = 4, iters = 0)
    val trained = Similarity.pqTrainCodebook(corpus, "vec_id", "embedding",
      m = 2, ks = 4, iters = 4)
    assert(seed.count() == 8 && trained.count() == 8) // m*ks codewords
    val (e0, e4) = (err(seed), err(trained))
    assert(e4 < e0, s"training must reduce quantization error: $e4 !< $e0")
    // the trained codebook drops into pqTopK unchanged
    val out = Similarity.pqTopK(corpus.filter(col("vec_id") < 3), "vec_id",
      corpus, "vec_id", "embedding", trained, m = 2, k = 5)
    assert(out.groupBy("query_id").count().collect().forall(_.getLong(1) == 5))
  }

  test("bloomPrune: pruned join equals the plain join exactly; probe filter sits map-side") {
    import spark.implicits._
    // spark.range (a real scan) rather than a local Seq: Catalyst
    // folds filters over LocalRelations away at optimization time,
    // which would hide the probe from the plan assertion below
    val large = spark.range(0L, 5000L).toDF("k")
      .withColumn("payload", concat(lit("v"), col("k")))
    val small = Seq(7L, 42L, 4999L, 123L).map(k => (k, s"dim$k")).toDF("k", "dim")
    val pruned = BloomPrune.prunedJoin(large, small, "k",
      expectedItems = 16L, numBits = 256L)
    val plain = large.join(small, Seq("k"))
    assert(pruned.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
    // the might_contain probe must appear as a Filter in the plan
    // (below the join), not as a post-join residual
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(800))
    // semi form: pure membership filter
    val semi = BloomPrune.prunedJoin(large, small.select("k"), "k",
      expectedItems = 16L, numBits = 256L, joinType = "left_semi")
    assert(semi.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(7L, 42L, 123L, 4999L))
  }

  test("bloomPrune: tiny filter stays exact (false positives cost shuffle, never rows)") {
    import spark.implicits._
    // 8 bits for 64 keys: huge false-positive rate, result still exact
    val large = (0L until 2000L).map(i => (i, i % 7)).toDF("k", "x")
    val small = (0L until 64L).map(k => Tuple1(k * 31L)).toDF("k")
    val pruned = BloomPrune.prunedJoin(large, small, "k",
      expectedItems = 64L, numBits = 8L)
    val plain = large.join(small, Seq("k"))
    assert(pruned.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
  }

  test("bloomPrune: empty build side yields an empty join") {
    import spark.implicits._
    val large = (0L until 100L).map(Tuple1(_)).toDF("k")
    val small = Seq.empty[Long].map(Tuple1(_)).toDF("k")
    assert(BloomPrune.prunedJoin(large, small, "k", 4L, 64L).isEmpty)
  }

  test("dupSpans: overlapping windows merge to one maximal region; first occurrence unmarked") {
    import spark.implicits._
    // doc 1 is canonical; doc 2 embeds doc 1's 6-token passage at
    // positions 2..7 — with k=4, starts 2,3,4 all mark, merging into
    // the single maximal region [2, 7]
    val df = Seq(
      (1L, "p q r s t u"),
      (2L, "x y p q r s t u z w")).toDF("doc_id", "text")
    val got = Dedup.dupSpans(df, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((2L, 2L, 7L, 6L)))
  }

  test("dupSpans: touching-but-disjoint regions merge; separated regions stay apart") {
    import spark.implicits._
    // doc 2 repeats two of doc 1's passages with one unique token gap:
    // regions [0,3] and [5,8] must NOT merge (gap at 4)
    val df = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d zz e f g h")).toDF("doc_id", "text")
    val got = Dedup.dupSpans(df, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == Seq((2L, 0L, 3L), (2L, 5L, 8L)))
  }

  test("removeDupSpans: repeated passage removed, first kept, untouched docs pass through") {
    import spark.implicits._
    val df = Seq(
      (1L, "p q r s t u"),
      (2L, "x y p q r s t u z w"),
      (3L, "totally unrelated short")).toDF("doc_id", "text")
    val got = Dedup.removeDupSpans(df, "doc_id", "text", k = 4)
      .select("doc_id", "clean_text", "removed_tokens")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("p q r s t u", 0L)))     // canonical copy intact
    assert(got(2L) == (("x y z w", 6L)))         // the repeat excised
    assert(got(3L) == (("totally unrelated short", 0L)))
  }

  test("temperatureMix: upsamples the small source, downsamples the large, deterministic") {
    import spark.implicits._
    // 900 "big" docs vs 100 "small": α=0.5 weights 30 vs 10, so
    // rates = (1000·w/40)/n → big 750/900≈0.833 (downsample, copy 0
    // only, ~83% kept), small 250/100=2.5 (copies 0,1 always + copy 2
    // at ~50%)
    val df = ((0L until 900L).map(i => (i, "big")) ++
      (1000L until 1100L).map(i => (i, "small"))).toDF("id", "src")
    val out = Sampling.temperatureMix(df, "id", "src", "t1", targetRows = 1000L)
      .select("id", "src", "copy").collect()
    val bySrc = out.groupBy(_.getString(1))
    val big = bySrc("big")
    val small = bySrc("small")
    // downsampled source: only copy 0, roughly rate fraction kept
    assert(big.forall(_.getLong(2) == 0L))
    assert(big.length > 600 && big.length < 900, s"big kept ${big.length}")
    // upsampled source: every doc has copies 0 and 1; copy 2 is the
    // ~50% Bernoulli tail
    val smallCopies = small.groupBy(_.getLong(0)).map(_._2.map(_.getLong(2)).sorted.toSeq)
    assert(smallCopies.forall(cs => cs.startsWith(Seq(0L, 1L))))
    val copy2 = small.count(_.getLong(2) == 2L)
    assert(copy2 > 20 && copy2 < 80, s"copy-2 count $copy2")
    // expected total ≈ targetRows
    assert(out.length > 900 && out.length < 1100, s"total ${out.length}")
    // determinism: identical selection on re-run
    val again = Sampling.temperatureMix(df, "id", "src", "t1", targetRows = 1000L)
      .select("id", "src", "copy").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSet ==
      again.map(r => (r.getLong(0), r.getLong(2))).toSet)
    // a different salt redraws the Bernoulli tail
    val other = Sampling.temperatureMix(df, "id", "src", "t2", targetRows = 1000L)
      .select("id", "copy").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSet !=
      other.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
