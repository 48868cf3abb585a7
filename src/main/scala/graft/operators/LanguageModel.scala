package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus n-gram statistics and per-document familiarity scoring —
  * the "does this document look like the corpus" quality signal a
  * training pipeline uses to rank/filter candidate data (the same
  * role a KenLM perplexity filter plays in CCNet-style curation).
  *
  * Design for oracle exactness: classic LM scoring sums `ln p(w|h)`,
  * but `ln` is NOT IEEE-exactly specified — two engines' libm may
  * differ in the last ulp, so a log-prob column can never be
  * hash-compared across engines. Instead the operator scores
  * FAMILIARITY: the fraction of a document's n-gram POSITIONS whose
  * n-gram occurs at least `minCount` times in the whole corpus. That
  * keeps every intermediate in exact integer arithmetic, with one
  * terminal double division (IEEE division IS correctly rounded, so
  * it is bit-identical across engines) — the same discipline as the
  * BM25 ranker's division-free compare ([[Search]]).
  *
  * Scale shape (100 TB):
  *  - [[ngramCounts]] is explode → partial-aggregated count: the
  *    combiner collapses each partition to its local vocabulary
  *    before the shuffle, so the Exchange moves ~|vocab| rows per
  *    partition, not |tokens|.
  *  - [[familiarity]] joins per-(doc, gram) multiplicities against
  *    the counts table on the gram key — an EQUI-join AQE can
  *    skew-split when head grams ("of the") flood a partition. A
  *    window `sum over (partition by gram)` would reuse one Exchange
  *    but puts every row of a head gram in ONE unsplittable task —
  *    the wrong trade at corpus scale, so the join shape is chosen
  *    deliberately.
  *  - The corpus is scanned twice (once per side). Both scans are
  *    column-pruned to (id, text) and map-side reduced; materializing
  *    the exploded positions to avoid the second scan would cost far
  *    more than the scan at any scale.
  */
object LanguageModel {

  /** Corpus-wide n-gram occurrence counts: (gram STRING, cnt LONG).
    * Counts every POSITION (multiplicity, not per-doc distinct) —
    * the LM-style statistic. Tokens are materialized as an attribute
    * before the shingle lambda slices them (see
    * [[Dedup.wordShinglesFromTokens]]'s O(tokens²) warning). */
  def ngramCounts(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n=$n must be >= 1")
    docs
      .select(split(col(textCol), " ").as("__toks"))
      .select(explode(Dedup.wordShinglesFromTokens(col("__toks"), n)).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-document familiarity vs the corpus' own n-gram counts:
    * (doc_id, n_grams, familiar_grams, familiar_rate) where
    * `familiar_grams` counts the document's n-gram positions whose
    * gram appears >= `minCount` times corpus-wide and
    * `familiar_rate = familiar_grams / n_grams` (0.0 for documents
    * shorter than n tokens, which are preserved as zero rows rather
    * than dropped). Rare-gram-dense documents (boilerplate noise,
    * mangled encodings, non-corpus languages) score low. */
  def familiarity(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 2, minCount: Long = 3): DataFrame = {
    require(n >= 1, s"n=$n must be >= 1")
    require(minCount >= 1, s"minCount=$minCount must be >= 1")
    val counts = ngramCounts(docs, textCol, n)
    val perDoc = docs
      .select(col(idCol).as("__id"), split(col(textCol), " ").as("__toks"))
      .select(col("__id"),
        explode(Dedup.wordShinglesFromTokens(col("__toks"), n)).as("gram"))
      .groupBy("__id", "gram")
      .agg(count(lit(1)).as("__k"))
    val agg = perDoc
      .join(counts, Seq("gram"))
      .groupBy("__id")
      .agg(
        sum(col("__k")).as("__n"),
        sum(when(col("cnt") >= minCount, col("__k")).otherwise(lit(0L))).as("__fam"))
    docs.select(col(idCol).as("doc_id"))
      .join(agg, col("doc_id") === col("__id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("__n"), lit(0L)).as("n_grams"),
        coalesce(col("__fam"), lit(0L)).as("familiar_grams"))
      .withColumn("familiar_rate",
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(col("familiar_grams").cast("double") / col("n_grams")))
  }
}
