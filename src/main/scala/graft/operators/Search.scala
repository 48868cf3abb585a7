package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index keyword search over a text corpus.
  *
  * The retrieval slice of the training-data pipeline: build a posting
  * table (term → document, term frequency) once, then answer keyword
  * queries as relational plans over it — the batch analogue of a
  * search index, and the primitive behind corpus curation queries
  * ("all documents mentioning X", contamination checks against
  * benchmark strings, targeted subset extraction).
  *
  * Ranking is ALL-INTEGER (matched-term count, then summed term
  * frequency, then doc id) so results are deterministic and the
  * DuckDB oracle hash-matches bit-for-bit — no IDF floats in the
  * gate; a caller wanting BM25/IDF can join [[postings]] with a
  * corpus-size scalar and apply any float scoring on top.
  *
  * Scale shape (100 TB): [[postings]] is explode + one hash
  * aggregation on (term, doc) — the classic inverted-index build,
  * partitioned by term hash, no driver state. A keyword query prunes
  * the postings scan with `term IN (...)` (pushed to the parquet
  * reader when postings are materialized), aggregates per doc
  * (map-side partials), and takes a bounded top-k. Persist
  * [[postings]] as a bucketed-by-term table to answer many queries
  * without re-tokenizing the corpus.
  */
object Search {

  /** Posting table: one row per (term, doc) with its in-doc term
    * frequency. Whitespace tokenization, like every text operator
    * here ([[Dedup.tokens]]). */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(Dedup.tokens(col(textCol))).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))

  /** Disjunctive (match-any) keyword top-k: documents containing at
    * least one query term, ranked by (#distinct matched terms desc,
    * summed tf desc, doc_id asc), limited to `k`.
    *
    * Output: (doc_id, n_terms LONG, total_tf LONG). */
  def keywordTopK(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    postings(docs, idCol, textCol)
      .where(col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_terms"),
        sum(col("tf")).as("total_tf"))
      .sort(col("n_terms").desc, col("total_tf").desc, col("doc_id"))
      .limit(k)
  }
}
