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
  def minhashSignature(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val distinctToks = array_distinct(tokens(col(textCol)))
    docs.select(
      col(idCol) +:
        (0 until k).map(j => minhash(j, distinctToks).as(s"h$j")): _*)
  }

  /** LSH candidate pairs: docs agreeing on any band (a contiguous run
    * of `rowsPerBand` signature positions) become a candidate. Join is
    * per-band on the band hash — never an all-pairs product. */
  def minhashCandidatePairs(
      sig: DataFrame, idCol: String, k: Int, rowsPerBand: Int): DataFrame = {
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

  /** Word n-gram (shingle) array: tokens i..i+n-1 joined by a space. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(0))),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))
  }

  /** All-pairs n-gram Jaccard above a threshold, bucketed by a cheap
    * length band first so the self-join is not a full cross product.
    * (For corpora where LSH recall matters more than exactness, use
    * [[nearDupPairs]]; this variant is the exact verifier.) */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = docs.select(
      col(idCol),
      array_distinct(wordShingles(col(textCol), n)).as("sh"))
    // Jaccard >= t bounds the size ratio: |A|/|B| within [t, 1/t].
    // Band by shingle-count bucket and join adjacent buckets only.
    val withLen = sh.withColumn("len", size(col("sh")))
    val a = withLen.select(col(idCol).as("id_a"), col("sh").as("sh_a"), col("len").as("len_a"))
    val b = withLen.select(col(idCol).as("id_b"), col("sh").as("sh_b"), col("len").as("len_b"))
    a.join(b,
        col("id_a") < col("id_b") &&
          col("len_b") >= ceil(col("len_a") * threshold) &&
          col("len_a") >= ceil(col("len_b") * threshold))
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= threshold)
      .select("id_a", "id_b", "jac")
  }

  /** 64-bit SimHash over tokens: per token take the first 16 hex chars
    * of md5 as a 64-bit value; each output bit is the sign of the sum
    * of +/-1 votes across tokens. Computed with integer expressions
    * only (codegen-friendly, no UDF). Returned as a 16-hex-char
    * string so unsigned top bits survive every engine. */
  def simhash64(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    // Per token keep the 16-hex-char md5 prefix; test bit i of the
    // 64-bit word by extracting the owning nibble and shifting. All
    // integer/string built-ins => whole-stage codegen keeps the loop
    // tight; at true 100 TB scale this becomes one custom Expression,
    // but the declarative form is the correctness reference.
    val words = transform(toks, t => substring(md5(t), 1, 16))
    val bits = (0 until 64).map { i =>
      val nibbleIdx = 16 - i / 4 // hex char 1 is the most-significant nibble
      val vote = aggregate(
        words,
        lit(0),
        (acc, w) => {
          val nibble = conv(substring(w, nibbleIdx, 1), 16, 10).cast("int")
          acc + when(shiftright(nibble, i % 4).bitwiseAND(1) === 1, 1).otherwise(-1)
        })
      when(vote > 0, lit(new java.math.BigDecimal(java.math.BigInteger.valueOf(2).pow(i))))
        .otherwise(lit(java.math.BigDecimal.ZERO))
    }
    lpad(conv(bits.reduce(_ + _).cast("decimal(20,0)").cast("string"), 10, 16), 16, "0")
  }

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
