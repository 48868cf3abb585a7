package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Embedding-space contamination: bucketed candidate generation,
  * threshold verify, and the single-probe miss (documented recall
  * ceiling) on a hand-built fixture. */
class SemanticContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("semanticContamination: same-bucket pairs over threshold; cross-bucket missed") {
    val train = Seq(
      (10L, Array(1.0f, 0.1f)),   // bucket 3 (both >= 0)
      (11L, Array(-1.0f, 0.2f)),  // bucket 2
      (12L, Array(0.9f, 0.05f))   // bucket 3
    ).toDF("id", "vec")
    val test = Seq(
      (20L, Array(0.95f, 0.08f)), // bucket 3: near 10 and 12
      (21L, Array(-0.9f, -0.1f))  // bucket 0: near 11 in angle? no — opposite-ish
    ).toDF("id", "vec")
    val out = Similarity.semanticContamination(
      train, "id", test, "id", "vec", signBits = 2, threshold = 0.9)
      .select("test_id", "train_id").as[(Long, Long)].collect().toSet
    // 20 pairs with both bucket-3 train vectors (cosine ~1); 21 shares
    // no bucket with anything — missed by construction (single probe)
    assert(out === Set((20L, 10L), (20L, 12L)))
  }

  test("semanticContamination: threshold gates the verify") {
    val train = Seq((1L, Array(1.0f, 0.0f))).toDF("id", "vec")
    val test = Seq((2L, Array(1.0f, 1.0f))).toDF("id", "vec") // cos = 1/sqrt(2)
    def run(t: Double) = Similarity.semanticContamination(
      train, "id", test, "id", "vec", signBits = 2, threshold = t).count()
    assert(run(0.7) === 1L)
    assert(run(0.72) === 0L)
  }
}
