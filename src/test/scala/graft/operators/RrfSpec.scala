package graft.operators

import graft.SparkSpec

/** Reciprocal-rank fusion: hand-computed fixture covering
  * both-lists, lexical-only, and vector-only documents, tie-breaks,
  * and the k cutoff. */
class RrfSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: fused scores, missing-list zeros, tie-break, cutoff") {
    // query 0: lex ranks d1=1 d2=2; vec ranks d2=1 d3=2
    val lex = Seq((0L, 1L, 1L), (0L, 2L, 2L)).toDF("query_id", "doc_id", "rank")
    val vec = Seq((0L, 2L, 1L), (0L, 3L, 2L)).toDF("query_id", "doc_id", "rank")
    val out = Search.rrfFuse(lex, vec, k0 = 60, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    // d2 in both lists: 1/62 + 1/61; d1 lex only: 1/61; d3 vec only: 1/62
    assert(out.length === 2) // k=2 cutoff drops d3
    assert(out(0) === ((0L, 1L, 2L, 1.0 / 62 + 1.0 / 61)))
    assert(out(1) === ((0L, 2L, 1L, 1.0 / 61)))
  }

  test("rrfFuse: equal-rrf ties break by doc_id") {
    // d5 lex-rank 1 only and d4 vec-rank 1 only: identical rrf 1/61
    val lex = Seq((7L, 5L, 1L)).toDF("query_id", "doc_id", "rank")
    val vec = Seq((7L, 4L, 1L)).toDF("query_id", "doc_id", "rank")
    val out = Search.rrfFuse(lex, vec, k0 = 60, k = 10)
      .select("rank", "doc_id").as[(Long, Long)].collect().sorted
    assert(out.toSeq === Seq((1L, 4L), (2L, 5L)))
  }
}
