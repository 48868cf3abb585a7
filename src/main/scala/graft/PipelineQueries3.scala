package graft

import org.apache.spark.sql.functions._

import graft.operators.{LanguageModel, Sampling, Shards}

/** Third pipeline-query wave (round 16): the TRUE n-gram LM
  * perplexity gate ([[graft.operators.LanguageModel.perplexity]]) in
  * its production shape — train on a trusted reference slice
  * (hash-bucketed, deterministic), score the remaining corpus.
  * Oracle-gated surfaces are the engine-exact ones (the trained
  * counts; hit/backoff tallies; the single-division `hit_frac`);
  * the `ln`/`exp`-bearing avg_logprob/ppl are spec-gated
  * (LanguageModelSpec), the
  * [[graft.operators.Importance.logRatioWeights]] precedent. */
object PipelineQueries3 {

  // the reference slice: ~40% of documents by salted md5 bucket —
  // the same deterministic device every sampling oracle uses
  private val refPred = Sampling.hashBucket(col("doc_id"), "lmref", 100) < 40
  private val duckRefPred = s"(${PipelineQueries.duckBucketOn("lmref", "doc_id")}) < 40"

  // --------------------------------------- LM training artifact
  // Top-100 reference bigrams by count — the trained model's head,
  // exact longs under a deterministic (cnt DESC, gram) order. The
  // bigram rides as its space-joined string: tokens are space-split
  // so the key is bijective and the oracle stays a plain GROUP BY.
  private val qLmBigramCounts = Queries.Q(
    "p_lm_bigram_counts",
    Some(s"""
      WITH ref AS (SELECT doc_id, text FROM documents WHERE $duckRefPred),
      rtok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM ref),
      rg AS (SELECT unnest(list_transform(
               generate_series(1, greatest(len(tk) - 1, 0)),
               i -> tk[i] || ' ' || tk[i + 1])) AS gram
             FROM rtok),
      bi AS (SELECT gram, COUNT(*) AS cnt FROM rg GROUP BY gram)
      SELECT gram, cnt FROM bi
      ORDER BY cnt DESC, gram
      LIMIT 100"""),
    (s, dir) => {
      val docs = Tables(s, dir).documents
      LanguageModel.ngramCounts(docs.filter(refPred), "text", 2)
        .transform(Queries.sortedSmallBy(_, col("cnt").desc, col("gram")))
        .limit(100)
    })

  // --------------------------------------- LM scoring audit
  // Every NON-reference document scored against the reference model:
  // how many bigram positions it has, how many the order-2 model
  // knows (hit) vs backs off on, and the exact hit fraction — the
  // engine-exact skeleton of the perplexity score (the log-prob
  // itself is spec-gated; same discipline as the DSIR weights).
  private val qLmScoreAudit = Queries.Q(
    "p_lm_score_audit",
    Some(s"""
      WITH ref AS (SELECT doc_id, text FROM documents WHERE $duckRefPred),
      tgt AS (SELECT doc_id, text FROM documents WHERE NOT ($duckRefPred)),
      rtok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM ref),
      ttok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM tgt),
      uni AS (SELECT w, COUNT(*) AS c1
              FROM (SELECT unnest(tk) AS w FROM rtok) GROUP BY w),
      rg AS (SELECT unnest(list_transform(
               generate_series(1, greatest(len(tk) - 1, 0)),
               i -> tk[i] || ' ' || tk[i + 1])) AS gram
             FROM rtok),
      bi AS (SELECT gram, COUNT(*) AS c2 FROM rg GROUP BY gram),
      tg AS (SELECT doc_id, unnest(list_transform(
               generate_series(1, greatest(len(tk) - 1, 0)),
               i -> struct_pack(w1 := tk[i],
                                gram := tk[i] || ' ' || tk[i + 1]))) AS s
             FROM ttok),
      per AS (SELECT t.doc_id,
                CASE WHEN bi.c2 IS NOT NULL AND u1.c1 IS NOT NULL
                     THEN 1 ELSE 0 END AS hit
              FROM (SELECT doc_id, s.w1 AS w1, s.gram AS gram FROM tg) t
              LEFT JOIN bi ON t.gram = bi.gram
              LEFT JOIN uni u1 ON t.w1 = u1.w),
      agg AS (SELECT doc_id,
                COUNT(*) AS n_scored,
                CAST(SUM(hit) AS BIGINT) AS n_hit
              FROM per GROUP BY doc_id)
      SELECT d.doc_id,
             COALESCE(a.n_scored, CAST(0 AS BIGINT)) AS n_scored,
             COALESCE(a.n_hit, CAST(0 AS BIGINT)) AS n_hit,
             COALESCE(a.n_scored, CAST(0 AS BIGINT))
               - COALESCE(a.n_hit, CAST(0 AS BIGINT)) AS n_backoff,
             CASE WHEN a.n_scored > 0
                  THEN CAST(a.n_hit AS DOUBLE) / a.n_scored END AS hit_frac
      FROM tgt d LEFT JOIN agg a USING (doc_id)
      ORDER BY d.doc_id"""),
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val ref = docs.filter(refPred)
      LanguageModel.perplexity(
        docs.filter(!refPred), "doc_id", "text",
        LanguageModel.ngramCounts(ref, "text", 1),
        LanguageModel.ngramCounts(ref, "text", 2))
        .select("doc_id", "n_scored", "n_hit", "n_backoff", "hit_frac")
        .transform(Queries.sortedSmall(_, "doc_id"))
    })

  // --------------------------------------- token-balanced sharding
  // The md5 bucket fold of Sampling.hashBucket at an arbitrary
  // modulus (PipelineQueries.duckBucketOn is the %-100 instance).
  private def duckBucketMod(salt: String, key: String, m: Int) =
    s"""list_reduce(list_prepend(0, list_transform(generate_series(1, 8),
       |  i -> strpos('0123456789abcdef', substr(md5('$salt:' || CAST($key AS VARCHAR)), i, 1)) - 1)),
       |  (h, c) -> h*16 + c) % $m""".stripMargin

  // Export sharding: every document → one of 8 shards, serpentine-
  // dealt by token count within 32 salted hash buckets (never a
  // global sort — see Shards scaladoc). Oracle replays the bucket,
  // the within-bucket rank, and the integer serpentine arithmetic.
  private val qShardAssign = Queries.Q(
    "p_shard_assign",
    Some(s"""
      WITH b AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               (${duckBucketMod("shard", "doc_id", 32)}) AS bucket
        FROM documents),
      r AS (
        SELECT doc_id, n_tokens,
               CAST(row_number() OVER (
                 PARTITION BY bucket ORDER BY n_tokens DESC, doc_id) - 1
                 AS BIGINT) AS rr
        FROM b)
      SELECT doc_id, n_tokens,
             CAST(CASE WHEN (rr // 8) % 2 = 0 THEN rr % 8
                       ELSE 7 - (rr % 8) END AS INT) AS shard
      FROM r
      ORDER BY doc_id"""),
    (s, dir) =>
      Shards.assignBalanced(Tables(s, dir).documents, "doc_id", "text",
        nShards = 8, numBuckets = 32, salt = "shard")
        .transform(Queries.sortedSmall(_, "doc_id")))

  // The export manifest: per-shard doc/token totals (the balance
  // audit) + id span. Exact integer aggregates over the assignment.
  private val qShardManifest = Queries.Q(
    "p_shard_manifest",
    Some(s"""
      WITH b AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               (${duckBucketMod("shard", "doc_id", 32)}) AS bucket
        FROM documents),
      r AS (
        SELECT doc_id, n_tokens,
               CAST(row_number() OVER (
                 PARTITION BY bucket ORDER BY n_tokens DESC, doc_id) - 1
                 AS BIGINT) AS rr
        FROM b),
      a AS (
        SELECT doc_id, n_tokens,
               CAST(CASE WHEN (rr // 8) % 2 = 0 THEN rr % 8
                         ELSE 7 - (rr % 8) END AS INT) AS shard
        FROM r)
      SELECT shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             MIN(doc_id) AS min_id,
             MAX(doc_id) AS max_id
      FROM a
      GROUP BY shard
      ORDER BY shard"""),
    (s, dir) =>
      Shards.manifest(
        Shards.assignBalanced(Tables(s, dir).documents, "doc_id", "text",
          nShards = 8, numBuckets = 32, salt = "shard"), "doc_id")
        .transform(Queries.sortedSmall(_, "shard")))

  val all: Seq[Queries.Q] =
    Seq(qLmBigramCounts, qLmScoreAudit, qShardAssign, qShardManifest)
}
