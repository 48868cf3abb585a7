package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** IVF-PQ composition: candidates come only from probed cells, ADC
  * distances agree with the pure-PQ path pair-for-pair, and the probe
  * prunes (a cell outside the probe set contributes nothing). */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  // 2-dim embeddings in two tight angular clusters; centroids = one
  // member of each cluster; m=2 → 1-dim subvectors
  private def emb = Seq(
    (0L, Array(1.0f, 0.05f)),  // cluster A (also centroid 0, code 0)
    (1L, Array(0.9f, 0.1f)),   // A
    (2L, Array(0.95f, 0.0f)),  // A
    (10L, Array(0.05f, 1.0f)), // cluster B (also centroid 10, code 10)
    (11L, Array(0.1f, 0.9f)),  // B
    (12L, Array(0.0f, 0.95f))  // B
  ).toDF("vec_id", "embedding")

  private def cents = emb.filter(col("vec_id").isin(0L, 10L))
  private def codebook =
    Similarity.pqCodebookFrom(cents, "vec_id", "embedding", m = 2)

  test("nProbe=1: every neighbor shares the query's own cluster") {
    val out = Similarity.ivfPqTopK(
      emb.filter(col("vec_id") < 3), "vec_id", emb, "vec_id", "embedding",
      cents, "vec_id", "embedding", codebook, m = 2, k = 10, nProbe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (q, n) =>
      assert(q < 3 && n < 3, s"query $q (cluster A, nProbe=1) reached $n")
    }
  }

  test("nProbe=2 ADC distances equal the pure-PQ path pair-for-pair") {
    val ivfpq = Similarity.ivfPqTopK(
      emb.filter(col("vec_id") < 3), "vec_id", emb, "vec_id", "embedding",
      cents, "vec_id", "embedding", codebook, m = 2, k = 10, nProbe = 2)
      .select("query_id", "neighbor_id", "approx_d2")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pq = Similarity.pqTopK(
      emb.filter(col("vec_id") < 3), "vec_id", emb, "vec_id", "embedding",
      codebook, m = 2, k = 10)
      .select("query_id", "neighbor_id", "approx_d2")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // with 2 cells and nProbe=2 nothing is pruned: same pair set,
    // bit-identical ADC values (identical fixed-order arithmetic)
    assert(ivfpq.keySet === pq.keySet)
    ivfpq.foreach { case (pair, d) =>
      assert(java.lang.Double.doubleToLongBits(d) ==
        java.lang.Double.doubleToLongBits(pq(pair)), s"ADC drift at $pair")
    }
  }

  test("refined with exhaustive probes equals exact brute-force L2 top-k") {
    // nProbe=2 probes every cell and refine covers the whole corpus,
    // so the candidate set is complete — the refine stage's exact
    // re-rank must then reproduce bruteForceTopKL2 bit-for-bit
    // (same kernel, same (dist, id) order)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id", "dist")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3))))
      .sorted.toSeq
    val refined = rows(Similarity.ivfPqTopKRefined(
      emb.filter(col("vec_id") < 3), "vec_id", emb, "vec_id", "embedding",
      cents, "vec_id", "embedding", codebook, m = 2, k = 3, nProbe = 2,
      refine = 10))
    val brute = rows(Similarity.bruteForceTopKL2(
      emb.filter(col("vec_id") < 3), "vec_id", emb, "vec_id", "embedding",
      k = 3))
    assert(refined === brute)
  }

  test("refine=k degenerates to the ADC ranking re-scored exactly") {
    // with refine == k the candidate SET is the un-refined top-k; the
    // refine stage may only re-order it — ids per query must match
    def ids(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val raw = ids(Similarity.ivfPqTopK(
      emb.filter(col("vec_id") < 3), "vec_id", emb, "vec_id", "embedding",
      cents, "vec_id", "embedding", codebook, m = 2, k = 3, nProbe = 1))
    val refined = ids(Similarity.ivfPqTopKRefined(
      emb.filter(col("vec_id") < 3), "vec_id", emb, "vec_id", "embedding",
      cents, "vec_id", "embedding", codebook, m = 2, k = 3, nProbe = 1,
      refine = 3))
    assert(refined === raw)
  }

  test("deterministic across invocations") {
    def run() = Similarity.ivfPqTopK(
      emb.filter(col("vec_id") < 3), "vec_id", emb, "vec_id", "embedding",
      cents, "vec_id", "embedding", codebook, m = 2, k = 3, nProbe = 1)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(run() === run())
  }
}
