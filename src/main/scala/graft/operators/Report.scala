package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus composition report — the per-source (crawl / domain /
  * provider) health summary a curation pipeline publishes before a
  * training run signs off on a data mix: volume, language spread, and
  * exact-duplicate exposure for every source, in one pass.
  *
  * (The reference repo has no analytics surface at all — its
  * monitoring stops at WAL lag, `check_wal.py:16-22`; this is part of
  * the corpus-pipeline extension mandated by SURVEY §2.9.)
  */
object Report {

  /** Per-source corpus report:
    *
    *  - `n_docs`, `total_chars` — volume;
    *  - `n_langs` — distinct languages seen in the source;
    *  - `n_dup_docs` — docs whose normalized content fingerprint
    *    ([[Dedup.fingerprint]]) occurs MORE THAN ONCE corpus-wide
    *    (cross-source copies count for every source holding one —
    *    that is the number a "which feed is reselling the same
    *    pages?" question needs);
    *  - `dup_frac` — `n_dup_docs / n_docs`, one IEEE long/long
    *    division (oracle-exact).
    *
    * Scale shape: the scan reduces every document to (source, lang,
    * chars, 128-bit fingerprint) map-side — the payload never moves.
    * ONE fingerprint-keyed groupBy (map-side partial agg) sizes each
    * content group; the membership join re-uses the SAME key, and the
    * per-source rollup shuffles |sources| groups of 4-column rows.
    * `countDistinct(lang)` is exact via Spark's standard expand —
    * language cardinality is tiny and bounded. No collect, no window;
    * the two fingerprint exchanges are the same budget
    * [[Dedup.exactGroups]] already pays. */
  def sourceReport(
      docs: DataFrame, sourceCol: String, langCol: String,
      charsCol: String, textCol: String): DataFrame = {
    val fp = docs.select(
      col(sourceCol), col(langCol), col(charsCol),
      Dedup.fingerprint(col(textCol)).as("__fp"))
    val groupSizes = fp.groupBy("__fp").agg(count(lit(1)).as("__c"))
    fp.join(groupSizes, Seq("__fp"))
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(charsCol)).as("total_chars"),
        countDistinct(col(langCol)).as("n_langs"),
        sum(when(col("__c") > 1L, 1L).otherwise(0L)).as("n_dup_docs"))
      .select(
        col(sourceCol),
        col("n_docs"),
        col("total_chars"),
        col("n_langs"),
        col("n_dup_docs"),
        (col("n_dup_docs").cast("double") / col("n_docs")).as("dup_frac"))
  }
}
