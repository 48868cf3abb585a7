package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus DRIFT report — the distribution-shift monitor a recurring
  * crawl/curation pipeline runs between snapshot N and N+1: per
  * feature, how did the corpus histogram move? A new crawl that
  * silently doubles the short-document tail or halves the stopword
  * density is a data incident long before it is a model regression,
  * and the report that catches it must be cheap (two narrow
  * aggregation passes) and engine-exact (it gates CI).
  *
  * Features (all map-side integer expressions — no libm anywhere):
  *  - `len_bin`: binary magnitude of the whitespace token count —
  *    `length(bin(n_tokens))` ≡ ⌊log₂ n⌋+1 computed EXACTLY via the
  *    binary string length (a float log2 rounds differently at
  *    powers of two across engines);
  *  - `stop_decile`: (stopword_count·10) div token_count — integer
  *    division, exact in both engines;
  *  - `lang`: the language column as its own categorical feature.
  *
  * Output: one row per (feature, bucket) present in EITHER snapshot:
  * (feature, bucket, old_n, new_n, old_ppm, new_ppm, delta_ppm) with
  * ppm = (n·1,000,000) div N — parts-per-million as exact integers,
  * so the total-variation-style drift signal Σ|delta_ppm| needs no
  * float division anywhere. Empty sides report 0 (a bucket that
  * appeared or vanished is exactly the signal).
  *
  * Scale shape (100 TB): each snapshot pays ONE map-side projection
  * + one (feature, bucket)-keyed partial aggregation — the shuffle
  * moves ≤ |features|·|buckets| rows per task, not documents; the
  * two snapshot aggregates (tiny) full-outer join on the bucket key;
  * the corpus totals ride a 1-row broadcast each. Text never rides
  * any shuffle.
  */
object Drift {

  private[graft] def buckets(
      docs0: DataFrame, textCol: String,
      langCol: Option[String]): DataFrame = {
    // spread the tokenize off the file scan (the frontier checklist:
    // fused into a few-file scan the whole stopword/length pass runs
    // at scan parallelism — measured 12.4 s serial at 100×); one
    // round-robin exchange, shared by every feature branch through
    // Spark's canonical-Exchange reuse
    val docs = docs0
      .select(col(textCol) +: langCol.map(col).toSeq: _*)
      .repartition(Dedup.pinnedParts(docs0))
    val toks = Dedup.tokens(col(textCol))
    val n = size(toks).cast("long")
    val stops = TextAnalysis.stopwordCount(col(textCol))
    val base = docs.select(
      lit("len_bin").as("feature"),
      length(bin(n)).cast("string").as("bucket"))
      .unionByName(docs
        .select(n.as("__n"), stops.as("__s"))
        .select(
          lit("stop_decile").as("feature"),
          when(col("__n") > 0, expr("(__s * 10) div __n"))
            .otherwise(lit(-1L)).cast("string").as("bucket")))
    langCol.fold(base) { lc =>
      base.unionByName(docs.select(
        lit("lang").as("feature"),
        coalesce(col(lc).cast("string"), lit("∅")).as("bucket")))
    }
  }

  /** `idCol` is unused by the counting (histograms are per-feature,
    * not per-document) — kept for signature symmetry with every other
    * two-snapshot operator in the library ([[Snapshot.diff]],
    * [[Curation.lineage]]), so call sites stay drop-in swappable. */
  def report(
      oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String,
      langCol: Option[String] = None): DataFrame = {
    def agg(docs: DataFrame, side: String) = {
      val b = buckets(docs, textCol, langCol)
        .groupBy("feature", "bucket")
        .agg(count(lit(1)).as(s"${side}_n"))
      // per-feature totals, not a global scalar: every feature
      // counts each document once, but keeping the divisor
      // feature-scoped survives adding multi-row features later
      val tot = b.groupBy("feature").agg(sum(s"${side}_n").as(s"__t$side"))
      b.join(broadcast(tot), Seq("feature"))
    }
    agg(oldDocs, "old").join(
        agg(newDocs, "new"), Seq("feature", "bucket"), "full_outer")
      .select(
        col("feature"), col("bucket"),
        coalesce(col("old_n"), lit(0L)).as("old_n"),
        coalesce(col("new_n"), lit(0L)).as("new_n"),
        // ppm in exact integer arithmetic: (n·1e6) div N; a missing
        // side's total is irrelevant because its n is 0
        coalesce(expr("(old_n * 1000000) div __told"), lit(0L)).as("old_ppm"),
        coalesce(expr("(new_n * 1000000) div __tnew"), lit(0L)).as("new_ppm"))
      .withColumn("delta_ppm", col("new_ppm") - col("old_ppm"))
  }
}
