package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Importance-based data selection (the DSIR family): score every
  * document by how much its hashed n-gram feature distribution
  * resembles a TARGET slice of the corpus relative to the raw corpus,
  * then resample the corpus toward the target — the published recipe
  * for "select web data that looks like the high-quality reference"
  * (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"; the hashed-n-gram feature space and the
  * log-ratio importance weight are that paper's construction).
  *
  * The reference corpus (`/root/reference/`) has no data-curation
  * surface at all — this operator is part of the §2.9 mandate
  * ("operations a large-scale training-data pipeline would need").
  *
  * Scale shape (100 TB): the feature space is a FIXED `dim`-bucket
  * hash range, so every trained artifact (per-bucket counts, weights)
  * is dim-bounded — kilobytes — and rides a broadcast join. Training
  * is one explode + one aggregation keyed by bucket (map-side partial
  * collapses each task to ≤ dim rows, so the shuffle is
  * tasks × dim regardless of corpus size). Scoring is map-side
  * feature hashing + a broadcast hash join + one aggregation keyed by
  * doc id (again map-side-partial-collapsed to ~1 row per doc). No
  * all-pairs step, no window over the corpus, no driver collect.
  *
  * Exactness discipline (the library-wide oracle rule, see
  * [[Sampling]]): every oracle-gated surface is integer arithmetic
  * plus at most ONE IEEE division, which is exactly rounded and
  * therefore bit-identical across Spark and DuckDB. Per-bucket and
  * per-doc occurrence counts are exact longs; the affinity score is a
  * single division of those longs. The true DSIR score — a SUM of
  * per-gram `ln` terms — is order-dependent in floating point and
  * depends on each engine's libm, so [[scoreLogRatio]] exists for
  * users (it is the paper's estimator) but is gated by unit spec, not
  * by the cross-engine hash oracle.
  */
object Importance {

  /** Stable feature bucket in [0, dim) for one n-gram — the hashed
    * feature space. md5-derived (portable, oracle-checkable), salted
    * so independent feature spaces can coexist. */
  def gramBucket(gram: Column, salt: String, dim: Int): Column =
    Sampling.hashBucket(gram, salt, dim)

  /** (doc, bucket-occurrence) rows for `n`-gram features WITH
    * multiplicity (DSIR counts occurrences; near-dup shingling
    * dedups — different semantics, deliberately). Tokens are
    * projected to an attribute before the shingle lambda (see
    * [[Dedup.wordShinglesFromTokens]]: an inlined split re-evaluates
    * per output element). */
  private def gramRows(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, dim: Int, salt: String, carry: Seq[String] = Nil): DataFrame = {
    val extra = carry.map(col)
    val parts = Dedup.pinnedParts(docs)
    docs
      // repartition BELOW the tokenize/explode/md5 projection: fused
      // into a few-file scan stage, the whole gram frontier (the
      // operator's entire CPU cost) runs at the scan's parallelism —
      // measured at 100× ScaleStress, one 65 s task did all the
      // hashing while 31 cores idled. Same lesson, same fix as
      // Dedup.shingleFrontier. REPARTITION_BY_NUM so AQE cannot
      // re-coalesce it on input bytes (raw text is small; the gram
      // explosion that follows is the real volume).
      .repartition(parts, col(idCol))
      .select((Seq(col(idCol), Dedup.tokens(col(textCol)).as("__tk")) ++ extra): _*)
      .select((Seq(col(idCol),
        explode(Dedup.wordShinglesFromTokens(col("__tk"), n)).as("__g")) ++ extra): _*)
      .withColumn("bucket", gramBucket(col("__g"), salt, dim))
      .drop("__g")
  }

  /** Train per-bucket target/raw occurrence counts: one row per
    * feature bucket that occurs in the corpus, with
    * `tgt_cnt` = occurrences inside the target slice and
    * `raw_cnt` = occurrences corpus-wide (target included — DSIR's q
    * is the full raw distribution). Exact longs. */
  def targetAffinityCounts(
      docs: DataFrame, idCol: String, textCol: String, isTarget: Column,
      n: Int = 2, dim: Int = 1024, salt: String = "dsir"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    gramRows(docs.withColumn("__t", isTarget), idCol, textCol, n, dim, salt,
        carry = Seq("__t"))
      .groupBy("bucket")
      .agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("tgt_cnt"),
        count(lit(1)).as("raw_cnt"))
  }

  /** DSIR log-ratio importance weights from trained counts:
    * w_b = ln((tgt_b+1)/(Σtgt+dim)) − ln((raw_b+1)/(Σraw+dim))
    * (add-one smoothing over the `dim`-bucket space). Totals ride a
    * 1-row broadcast scalar join — the library's standard corpus-
    * statistic pattern (BM25 does the same). Floating output:
    * spec-gated, not oracle-gated (see the object scaladoc). */
  def logRatioWeights(counts: DataFrame, dim: Int): DataFrame = {
    val totals = counts.groupBy().agg(
      sum("tgt_cnt").as("__tt"), sum("raw_cnt").as("__tr"))
    counts.crossJoin(broadcast(totals))
      .withColumn("w",
        log((col("tgt_cnt") + 1).cast("double") / (col("__tt") + dim)) -
          log((col("raw_cnt") + 1).cast("double") / (col("__tr") + dim)))
      .select("bucket", "tgt_cnt", "raw_cnt", "w")
  }

  /** Per-document exact affinity: sum the trained per-bucket counts
    * over the document's own gram occurrences —
    * `sum_tgt` = Σ_grams tgt_cnt(bucket(g)), `sum_raw` likewise —
    * then ONE exact division `affinity = (sum_tgt+1)/(sum_raw+1)`.
    * affinity ∈ (0, 1]: how target-heavy the feature mass of this
    * document is. Counts broadcast (dim-bounded); grams never
    * shuffle — only the map-side-combined per-doc partials do.
    * Documents with no grams (shorter than n tokens) score the
    * smoothed prior (0+1)/(0+1) = 1 via the left join's coalesce —
    * callers filtering for quality should also require `sum_raw > 0`.
    * All other input columns pass through untouched. */
  def scoreAffinity(
      docs: DataFrame, idCol: String, textCol: String, counts: DataFrame,
      n: Int = 2, dim: Int = 1024, salt: String = "dsir"): DataFrame = {
    val scored = gramRows(docs, idCol, textCol, n, dim, salt)
      .join(broadcast(counts), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(coalesce(col("tgt_cnt"), lit(0L))).as("sum_tgt"),
        sum(coalesce(col("raw_cnt"), lit(0L))).as("sum_raw"))
    docs.join(scored, Seq(idCol), "left")
      .withColumn("sum_tgt", coalesce(col("sum_tgt"), lit(0L)))
      .withColumn("sum_raw", coalesce(col("sum_raw"), lit(0L)))
      .withColumn("affinity",
        (col("sum_tgt") + 1).cast("double") / (col("sum_raw") + 1))
  }

  /** The paper's per-document importance score
    * Σ_grams w(bucket(g)) — floating, order-dependent under
    * parallel summation, so NOT oracle-gated (spec-gated:
    * ImportanceSpec hand-computes a corpus). `weights` is
    * [[logRatioWeights]] output. A bucket absent from training
    * contributes the smoothed prior ln((0+1)/(Σtgt+dim)) −
    * ln((0+1)/(Σraw+dim)) only if the caller pre-seeds it; with the
    * default left join it contributes 0 — equivalent to scoring only
    * in-vocabulary features, the common implementation shortcut. */
  def scoreLogRatio(
      docs: DataFrame, idCol: String, textCol: String, weights: DataFrame,
      n: Int = 2, dim: Int = 1024, salt: String = "dsir"): DataFrame = {
    val scored = gramRows(docs, idCol, textCol, n, dim, salt)
      .join(broadcast(weights.select("bucket", "w")), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("w"), lit(0.0))).as("dsir_score"))
    docs.join(scored, Seq(idCol), "left")
      .withColumn("dsir_score", coalesce(col("dsir_score"), lit(0.0)))
  }

  /** The trained counts as a pair of plan-literal maps (bucket →
    * tgt_cnt, bucket → raw_cnt) — the STREAM-SIDE form of the
    * artifact. The counts table is ≤ dim rows by construction, so
    * collecting it is a bounded driver artifact exactly like a PQ
    * codebook or the BPE merge list; as literals the gate needs no
    * join at all — it is a pure per-row expression, legal on a
    * streaming DataFrame with no state store and no watermark. */
  def collectCounts(counts: DataFrame): Map[Long, (Long, Long)] =
    counts.select("bucket", "tgt_cnt", "raw_cnt").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  /** Per-row exact affinity of `toksCol` (a MATERIALIZED token-array
    * attribute — project `Dedup.tokens(text)` into a column first;
    * an inlined split re-evaluates per shingle, the library-wide
    * O(tokens²) trap) against collected counts: the same
    * (Σtgt+1)/(Σraw+1) as [[scoreAffinity]], computed by one
    * fold over the gram array with two literal-map probes per gram.
    * Bit-identical to the batch score: integer sums + one IEEE
    * division, same md5 bucketing. */
  def affinityColumn(
      toksCol: Column, counts: Map[Long, (Long, Long)],
      n: Int = 2, dim: Int = 1024, salt: String = "dsir"): Column = {
    import org.apache.spark.sql.functions.typedLit
    val tgt = typedLit(counts.map { case (b, (t, _)) => b -> t })
    val raw = typedLit(counts.map { case (b, (_, r)) => b -> r })
    val grams = Dedup.wordShinglesFromTokens(toksCol, n)
    val sums = aggregate(
      grams,
      struct(lit(0L).as("t"), lit(0L).as("r")),
      (acc, g) => {
        val b = gramBucket(g, salt, dim)
        struct(
          (acc.getField("t") + coalesce(element_at(tgt, b), lit(0L))).as("t"),
          (acc.getField("r") + coalesce(element_at(raw, b), lit(0L))).as("r"))
      })
    (sums.getField("t") + 1).cast("double") / (sums.getField("r") + 1)
  }

  /** Deterministic importance resampling on the exact affinity score:
    * keep a document iff u < affinity/(affinity + c), where
    * u = hashBucket(id)/1e6 is the library's salted-md5 uniform.
    * Monotone in affinity — higher target resemblance ⇒ higher keep
    * probability — and exactly reproducible from (salt, c) alone:
    * both sides of the comparison are one IEEE division over exact
    * integers. `c` tunes the retention curve (keep probability is
    * 1/(1+c) at affinity 1). Map-side filter: zero shuffles. */
  def keepFlag(
      idCol: Column, affinity: Column,
      salt: String = "dsir-keep", c: Double = 0.5): Column = {
    require(c > 0, s"c must be positive, got $c")
    val u = Sampling.hashBucket(idCol, salt, 1000000).cast("double") / 1000000
    u < affinity / (affinity + c)
  }

  def resampleByAffinity(
      scored: DataFrame, idCol: String,
      salt: String = "dsir-keep", c: Double = 0.5): DataFrame =
    scored.filter(keepFlag(col(idCol), col("affinity"), salt, c))
}
