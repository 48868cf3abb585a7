package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora.
  *
  * All variants are expressed as declarative DataFrame plans so
  * Catalyst keeps pushdown/pruning, and every hash is derived from
  * `md5` (stable across engines and Spark versions) rather than
  * `hash()` (murmur3, Spark-internal) so results are reproducible and
  * oracle-checkable.
  *
  * Scale notes (100 TB): exact dedup is one hash-shuffle on the
  * fingerprint; minhash/LSH shuffles signatures (tiny: k strings per
  * doc) and joins docs only within LSH bands, never all-pairs. The
  * band self-join is the standard linear-ish LSH candidate generation;
  * pathological vocabularies collapse many docs into one band, which
  * AQE skew-join splitting handles at runtime.
  */
object Dedup {

  /** Whitespace tokenization; single-space-joined corpora keep exact
    * token counts (split on a literal space, like the oracle). */
  def tokens(text: Column): Column = split(text, " ")

  /** Canonical-text fingerprint: collapse whitespace, lowercase, md5.
    * This is the "document fingerprinting (rolling hash)" operator in
    * its batch form — one deterministic 128-bit id per normal form. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Exact dedup groups: one row per distinct normalized text with the
    * surviving (minimum) id and the duplicate count. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(fingerprint(col(textCol)).as("fingerprint"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** One minhash value: the lexicographic minimum of seeded md5 hashes
    * over the document's distinct tokens. Using the min of a keyed md5
    * is the classic minwise-permutation estimator; strings order the
    * same in Spark, DuckDB and Java, so signatures are portable. */
  private def minhash(seed: Int, toks: Column): Column =
    array_min(transform(toks, t => md5(concat(lit(s"$seed:"), t))))

  /** Per-doc minhash signature of `k` hashes over distinct tokens. */
  def minhashSignature(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    minhashSignatureOver(docs, idCol, array_distinct(tokens(col(textCol))), k)

  /** Minhash signature over an arbitrary precomputed shingle/token
    * array expression. Small-vocabulary corpora MUST shingle first:
    * unigram token sets collide massively (measured: 44% of all doc
    * pairs at jaccard >= 0.7 on the driver corpus), while n-gram
    * shingle space keeps only true near-dups together. */
  def minhashSignatureOver(docs: DataFrame, idCol: String, shingles: Column, k: Int): DataFrame =
    docs.select(
      col(idCol) +:
        (0 until k).map(j => minhash(j, shingles).as(s"h$j")): _*)

  /** LSH candidate pairs: docs agreeing on any band (a contiguous run
    * of `rowsPerBand` signature positions) become a candidate. Join is
    * per-band on the band hash — never an all-pairs product. */
  def minhashCandidatePairs(
      sig: DataFrame, idCol: String, k: Int, rowsPerBand: Int): DataFrame = {
    require(k % rowsPerBand == 0,
      s"k=$k must be a multiple of rowsPerBand=$rowsPerBand (trailing positions would be silently dropped)")
    val nBands = k / rowsPerBand
    val banded = sig.select(
      col(idCol),
      posexplode(array((0 until nBands).map { b =>
        md5(concat_ws("|",
          (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"h$j")): _*))
      }: _*)).as(Seq("band", "band_hash")))
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("band_hash"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact token-set Jaccard for a pair of token arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni   = size(array_union(a, b)).cast("double")
    when(uni === 0d, lit(0d)).otherwise(inter / uni)
  }

  /** Near-duplicate pairs: minhash/LSH candidates verified by exact
    * token-set Jaccard >= `threshold`. The verify join only touches
    * candidate ids, so full documents are shipped once per candidate,
    * not per band. */
  def nearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val sig   = minhashSignature(docs, idCol, textCol, k)
    val cand  = minhashCandidatePairs(sig, idCol, k, rowsPerBand)
    val toks  = docs.select(
      col(idCol), array_distinct(tokens(col(textCol))).as("toks"))
    cand
      .join(toks.select(col(idCol).as("id_a"), col("toks").as("toks_a")), "id_a")
      .join(toks.select(col(idCol).as("id_b"), col("toks").as("toks_b")), "id_b")
      .withColumn("jac", jaccard(col("toks_a"), col("toks_b")))
      .filter(col("jac") >= threshold)
      .select("id_a", "id_b", "jac")
  }

  /** Near-duplicate pairs over n-gram SHINGLE sets: minhash/LSH
    * candidates (band equi-join) verified by exact shingle-set
    * Jaccard. The scale path for small-vocab corpora — see
    * [[minhashSignatureOver]]. */
  def nearDupPairsShingled(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val sh = docs.select(
      col(idCol), array_distinct(wordShingles(col(textCol), n)).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = minhashSignatureOver(sh, idCol, col("sh"), k)
    val cand = minhashCandidatePairs(sig, idCol, k, rowsPerBand)
    cand
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= threshold)
      .select("id_a", "id_b", "jac")
  }

  /** Word n-gram (shingle) array: tokens i..i+n-1 joined by a space.
    * Documents shorter than n tokens yield an empty array (guarded:
    * an unguarded `sequence(1, size-(n-1))` would step DOWN through 0
    * and hit `element_at(toks, 0)` — illegal index under ANSI mode). */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** All-pairs n-gram Jaccard above a threshold via a geometric
    * length-bucket EQUI-join (shuffle-partitionable; never a
    * cartesian / nested-loop plan).
    *
    * Jaccard >= t bounds the distinct-shingle-count ratio to
    * [t, 1/t], i.e. |ln len_a − ln len_b| <= ln(1/t). With buckets of
    * width ln(1/t) on the log scale, any qualifying pair is at most
    * one bucket apart, so side A explodes into buckets {b−1, b, b+1}
    * and side B stays at {b}: every qualifying pair meets on exactly
    * one equi-key, Catalyst plans a shuffled hash / sort-merge join on
    * `bucket`, and the length-ratio predicate remains as a cheap
    * post-filter. Cost: 3× row duplication of one side — linear, vs
    * the quadratic BroadcastNestedLoopJoin a pure range predicate
    * forces. (For recall-over-exactness at corpus scale use
    * [[nearDupPairs]]; this variant is the exact verifier.) */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold < 1, s"threshold in (0,1), got $threshold")
    val bucketWidth = math.log(1.0 / threshold)
    val sh = docs
      .select(col(idCol), array_distinct(wordShingles(col(textCol), n)).as("sh"))
      .withColumn("len", size(col("sh")))
      .filter(col("len") > 0) // empty shingle sets can never reach jaccard >= t
      .withColumn("bucket", floor(log(col("len").cast("double")) / bucketWidth).cast("long"))
    val a = sh
      .withColumn("bucket", explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)))
      .select(col(idCol).as("id_a"), col("sh").as("sh_a"), col("len").as("len_a"), col("bucket"))
    val b = sh.select(col(idCol).as("id_b"), col("sh").as("sh_b"), col("len").as("len_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(
        col("id_a") < col("id_b") &&
          col("len_b").cast("double") >= col("len_a") * threshold &&
          col("len_a").cast("double") >= col("len_b") * threshold)
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= threshold)
      .select("id_a", "id_b", "jac")
  }

  /** SimHash vote vector: ONE pass over the distinct tokens, each
    * token contributing ±1 to all 64 bit positions via a single
    * `aggregate` + `zip_with` (vs 64 independent aggregate passes —
    * the round-1 version — whose expression tree was O(64·tokens)
    * traversals). Bit i of a token = bit (i%4) of hex nibble
    * (16 − i/4) of its 16-hex-char md5 prefix. */
  def simhashVotes(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val words = transform(toks, t => substring(md5(t), 1, 16))
    def bitVote(w: Column, i: Int): Column = {
      val nibble = conv(substring(w, 16 - i / 4, 1), 16, 10).cast("int")
      when(shiftright(nibble, i % 4).bitwiseAND(1) === 1, 1).otherwise(-1)
    }
    aggregate(
      words,
      array_repeat(lit(0), 64),
      (acc, w) => zip_with(acc, array((0 until 64).map(i => bitVote(w, i)): _*), (a, b) => a + b))
  }

  /** 16-hex-char (lowercase) SimHash from a 64-int vote vector: bit i
    * set iff votes(i) > 0. Keep votes in a materialized column before
    * calling this (it references the vote array 64 times — cheap on an
    * attribute, pathological on the full aggregate expression). */
  def simhashHexFromVotes(votes: Column): Column = {
    def bit(i: Int): Column = when(element_at(votes, i + 1) > 0, 1).otherwise(0)
    val hexChars = (0 until 16).map { p => // p=0 → most-significant nibble (bits 63..60)
      val base = (15 - p) * 4
      lower(conv((bit(base + 3) * 8 + bit(base + 2) * 4 + bit(base + 1) * 2 + bit(base)).cast("string"), 10, 16))
    }
    concat(hexChars: _*)
  }

  /** 64-bit SimHash over tokens as a lowercase 16-hex-char string
    * (lowercase matches every other fingerprint in this module and
    * common oracle hex conventions). Adds/removes a `__simhash_votes`
    * scratch column so the vote aggregate is evaluated once per row. */
  def withSimhash64(docs: DataFrame, textCol: String, outCol: String): DataFrame =
    docs
      .withColumn("__simhash_votes", simhashVotes(col(textCol)))
      .withColumn(outCol, simhashHexFromVotes(col("__simhash_votes")))
      .drop("__simhash_votes")

  /** Embedding near-duplicate pairs: cosine >= threshold among
    * same-LSH-bucket candidates (see [[Similarity.signBucket]]). */
  def embeddingNearDupPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      signBits: Int, threshold: Double): DataFrame = {
    val withBucket = emb.select(
      col(idCol), col(vecCol),
      Similarity.signBucket(col(vecCol), signBits).as("bucket"))
    val a = withBucket.select(col(idCol).as("id_a"), col(vecCol).as("v_a"), col("bucket"))
    val b = withBucket.select(col(idCol).as("id_b"), col(vecCol).as("v_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
