package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Prototypicality pruning: per-cell farthest-fraction flagging on a
  * hand-built two-cluster fixture. */
class EmbeddingOutliersSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f)),    // centroid A
    (1L, Array(0.99f, 0.01f)),  // A: close
    (2L, Array(0.9f, 0.1f)),    // A: mid
    (3L, Array(0.7f, 0.3f)),    // A: farthest of cluster A
    (10L, Array(0.0f, 1.0f)),   // centroid B
    (11L, Array(0.05f, 0.98f)), // B: close
    (12L, Array(0.3f, 0.8f))    // B: farthest of cluster B
  ).toDF("vec_id", "embedding")

  private def cents = emb.filter(col("vec_id").isin(0L, 10L))

  test("flags exactly the ceil(fraction*n) farthest members per cell") {
    val out = Similarity.embeddingOutliers(
      emb, "vec_id", "embedding", cents, "vec_id", "embedding", fraction = 0.25)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(4)))).toMap
    // cell A has 4 members -> ceil(1.0)=1 outlier: vec 3
    // cell B has 3 members -> ceil(0.75)=1 outlier: vec 12
    assert(out(3L)._2 && out(12L)._2)
    assert(out.count(_._2._2) === 2)
    // assignment sanity: A-members in cell 0, B-members in cell 10
    assert(Seq(0L, 1L, 2L, 3L).forall(out(_)._1 == 0L))
    assert(Seq(10L, 11L, 12L).forall(out(_)._1 == 10L))
  }

  test("fraction 0 flags nothing; fraction 1 flags everything") {
    def flagged(f: Double) = Similarity.embeddingOutliers(
      emb, "vec_id", "embedding", cents, "vec_id", "embedding", fraction = f)
      .filter(col("outlier")).count()
    assert(flagged(0.0) === 0L)
    assert(flagged(1.0) === 7L)
  }
}
