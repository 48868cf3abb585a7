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

  /** BM25 top-k per query term with EXACT, division-free ranking.
    *
    * BM25 (k1 = 1.2, b = 0.75) orders documents for one term by
    * `tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`. With avgdl = L/N
    * (L = total corpus tokens, N = docs) and the rational constants
    * multiplied through by 10·L, the denominator becomes the INTEGER
    * `D = 10·L·tf + 3·L + 9·dl·N`, and the per-term ordering is the
    * rational tf/D — so "doc b outranks doc a" is the exact integer
    * comparison `tf_b·D_a > tf_a·D_b`. No floating point anywhere:
    * the ranking is bit-reproducible across engines (the DuckDB
    * oracle recomputes it in HUGEINT) and immune to the libm-log
    * discrepancies that make classic float BM25 un-oracle-able.
    * Products are computed in decimal(38,0) (exact to 1e38; L·tf·10
    * alone would overflow a long near corpus sizes of ~1e13 tokens).
    *
    * Ranking is rank-by-pairwise-count: rank(a) = 1 + #{b : b beats
    * a}, ties broken by doc_id. That is O(C²) per term where C is the
    * candidate count — so candidates MUST be bounded. `prefilterC`
    * is the bounding stage: keep only the top-C docs per term by
    * (tf DESC, doc_id ASC) — deterministic, all-integer, and itself
    * oracle-checkable — before the pairwise rerank. BM25's per-term
    * score is monotone in tf for fixed dl, so high-tf docs dominate
    * the head; C ≫ k makes the approximation tight while the
    * pairwise stage touches O(C²) rows per term, CONSTANT in corpus
    * size. Pass prefilterC = 0 to rank the full posting list (exact
    * BM25; only sane for rare terms).
    *
    * Output: (term, rank LONG, doc_id, tf LONG, dl LONG), rank ≤ k,
    * one row per surviving (term, doc). */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, prefilterC: Int = 0): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    require(prefilterC == 0 || prefilterC >= k,
      s"prefilterC must be 0 (off) or >= k, got $prefilterC < $k")
    val dec38 = "decimal(38,0)"
    val tok = docs.select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("__tk"))
    val dl  = tok.select(col("doc_id"), size(col("__tk")).cast("long").as("dl"))
    val tf = tok
      .select(col("doc_id"), explode(col("__tk")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))
    val stats = dl.agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(col("dl")).as("total_len"))
    val bounded =
      if (prefilterC == 0) tf
      else tf
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("term").orderBy(col("tf").desc, col("doc_id"))))
        .filter(col("__rn") <= prefilterC)
        .drop("__rn")
    val decL = col("total_len").cast(dec38)
    val cand = bounded
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn(
        "d_denom",
        decL * 10 * col("tf") + decL * 3 + col("dl").cast(dec38) * 9 * col("n_docs"))
      .select("term", "doc_id", "tf", "dl", "d_denom")
    val a = cand.select(
      col("term"), col("doc_id").as("doc_a"), col("tf").as("tf_a"),
      col("dl").as("dl_a"), col("d_denom").as("d_a"))
    val b = cand.select(
      col("term"), col("doc_id").as("doc_b"), col("tf").as("tf_b"),
      col("d_denom").as("d_b"))
    val scoreB = col("tf_b").cast(dec38) * col("d_a") // ∝ score(b), common denom
    val scoreA = col("tf_a").cast(dec38) * col("d_b")
    val beats  = scoreB > scoreA || (scoreB === scoreA && col("doc_b") < col("doc_a"))
    a.join(b, "term") // self-pair contributes 0, so every candidate keeps a row
      .groupBy(col("term"), col("doc_a"), col("tf_a"), col("dl_a"))
      .agg((lit(1L) + sum(when(beats, 1L).otherwise(0L))).as("rank"))
      .filter(col("rank") <= k)
      .select(
        col("term"), col("rank"), col("doc_a").as("doc_id"),
        col("tf_a").as("tf"), col("dl_a").as("dl"))
  }

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

  /** Top-k characteristic terms per document by tf·idf with a LINEAR
    * idf (score = tf/df): the per-document keyword extraction used for
    * corpus exploration, topic labeling, and near-dup triage.
    *
    * Why tf/df and not tf·ln(N/df): ln is not IEEE-exactly specified,
    * so a log-idf score can differ between engines in the last ulp
    * and flip a ranking — un-oracle-able (the same reason [[bm25TopK]]
    * ranks division-free and [[LanguageModel]] scores counts, not
    * log-probs). tf/df keeps the defining property (monotone up in
    * tf, down in df — stopwords sink, rare-but-repeated terms rise),
    * and IEEE division IS correctly rounded, so the score and the
    * ranking hash-match across engines bit-for-bit. Equal ratios from
    * different pairs (1/2 vs 2/4) tie exactly and break by term.
    *
    * Scale shape: posting build + df aggregate + an equi-join on term
    * (AQE-skew-splittable for head terms) + one window partitioned by
    * DOC — bounded by a document's distinct-term count, never by
    * corpus size. No cross product, no driver state.
    *
    * Output: (doc_id, rank LONG, term, tf LONG, df LONG, tfdf DOUBLE),
    * rank ≤ k per doc. */
  def tfidfTopTerms(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val post = postings(docs, idCol, textCol)
    val dft = post.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfdf").desc, col("term"))
    post.join(dft, "term")
      .withColumn("tfdf", col("tf").cast("double") / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "df", "tfdf")
  }

  /** Audit companion of [[bm25TopK]]'s tf-top-C prefilter — the
    * analogue of [[Dedup.minhashBucketOverflow]]: one row per query
    * term whose posting list the prefilter truncated. Empty output =
    * the prefilter was lossless for this corpus + term set.
    *
    * The recall trade it quantifies: every cut doc has
    * tf ≤ `boundary_tf` (the tf at rank C), but BM25 is
    * length-normalized, so a cut doc with tf = boundary_tf and a much
    * shorter dl could still outscore kept docs — `cut_docs` > 0 means
    * the top-k is approximate for that term, and `max_cut_tf` close
    * to `boundary_tf` means the approximation is at its loosest.
    * Raise C (or pass 0 for the exact O(df²) rerank) when that
    * matters. Same plan shape as the prefilter itself: one tf
    * aggregate, one per-term window, one bounded-state aggregate —
    * no posting list is ever materialized per row.
    *
    * Output: (term, n_postings, cut_docs, boundary_tf, max_cut_tf),
    * all LONG; rows only for terms with n_postings > prefilterC. */
  def bm25PrefilterOverflow(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], prefilterC: Int): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    require(prefilterC > 0, s"prefilterC=$prefilterC: audit needs the bounded mode")
    val tok = docs.select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("__tk"))
    val tf = tok
      .select(col("doc_id"), explode(col("__tk")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))
    val ranked = tf.withColumn("__rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy("term").orderBy(col("tf").desc, col("doc_id"))))
    ranked
      .groupBy("term")
      .agg(
        count(lit(1)).as("n_postings"),
        sum(when(col("__rn") > prefilterC, 1L).otherwise(0L)).as("cut_docs"),
        // rank C exists whenever n_postings > C, so never null post-filter
        max(when(col("__rn") === prefilterC, col("tf"))).as("boundary_tf"),
        coalesce(max(when(col("__rn") > prefilterC, col("tf"))), lit(0L)).as("max_cut_tf"))
      .filter(col("n_postings") > prefilterC)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009) of two
    * ranked retrieval lists — the standard hybrid-retrieval merge of
    * a lexical (BM25) and a vector (ANN) ranking, used everywhere a
    * RAG corpus is served: rrf(d) = Σ_lists 1/(k0 + rank_list(d)),
    * lists that missed d contribute 0.
    *
    * Both inputs carry (query_id, doc_id, rank); ranks come from
    * bounded top-k lists ([[bm25TopK]], [[Similarity.bruteForceTopK]]
    * or any ANN arm), so the fusion working set is ≤ 2k rows per
    * query no matter the corpus size: one (query, doc)-keyed
    * full-outer join + one per-query window over ≤ 2k rows. Zero
    * corpus-sized shuffles — fusion cost is query-count-bound.
    *
    * Exactness (oracle rule): each term is ONE exactly-rounded IEEE
    * division of exact integers, and their sum is a single fixed-order
    * addition — bit-identical across engines, unlike a variadic
    * floating SUM. Ties in rrf (e.g. rank r in one list only, vs the
    * same r in the other list only) break by doc_id.
    *
    * Output: (query_id, rank, doc_id, rrf, rank_lex, rank_vec) with
    * absent-list ranks null. */
  def rrfFuse(
      lex: DataFrame, vec: DataFrame,
      k0: Int = 60, k: Int = 10): DataFrame = {
    require(k0 >= 0, s"k0 must be non-negative, got $k0")
    require(k > 0, s"k must be positive, got $k")
    val l = lex.select(col("query_id"), col("doc_id"), col("rank").as("rank_lex"))
    val v = vec.select(col("query_id"), col("doc_id"), col("rank").as("rank_vec"))
    val fused = l.join(v, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(k0) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0) + col("rank_vec")), lit(0.0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "rrf", "rank_lex", "rank_vec")
  }
}
