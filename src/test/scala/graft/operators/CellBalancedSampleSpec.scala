package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cluster-balanced subsampling: cap-per-cell semantics, assignment
  * agreement with [[Similarity.assignCells]], and the deterministic /
  * seedable draw contract inherited from [[Sampling.uniformPerKey]]. */
class CellBalancedSampleSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated clusters with unbalanced populations:
  // cell 0 has 6 members, cell 10 has 2
  private def emb = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.99f, 0.01f)),
    (2L, Array(0.98f, 0.02f)),
    (3L, Array(0.97f, 0.03f)),
    (4L, Array(0.96f, 0.04f)),
    (5L, Array(0.95f, 0.05f)),
    (10L, Array(0.0f, 1.0f)),
    (11L, Array(0.05f, 0.98f))
  ).toDF("vec_id", "embedding")

  private def cents = emb.filter(col("vec_id").isin(0L, 10L))

  private def sample(k: Int, salt: String = "s") =
    Similarity.cellBalancedSample(
      emb, "vec_id", "embedding", cents, "vec_id", "embedding",
      perCellK = k, salt = salt)

  test("caps the dominant cell at k and keeps small cells whole") {
    val bySize = sample(3).groupBy("cell").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bySize(0L) === 3L) // capped from 6
    assert(bySize(10L) === 2L) // kept whole (< k)
  }

  test("selected rows carry the same cell assignCells gives them") {
    val assigned = Similarity.assignCells(
      emb, "vec_id", "embedding", cents, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sample(3).collect().foreach { r =>
      assert(assigned(r.getLong(0)) === r.getLong(1))
    }
  }

  test("same salt redraws identically; a different salt can differ") {
    val a = sample(3).collect().map(_.getLong(0)).sorted
    val b = sample(3).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    // k = cell size keeps everything regardless of salt — use k below
    // size so the draw actually chooses
    val salted = (1 to 8).map(i => sample(2, s"salt$i")
      .filter(col("cell") === 0L).collect().map(_.getLong(0)).toSet)
    assert(salted.distinct.size > 1,
      "8 different salts all drew the same 2-of-6 subset")
  }

  test("k >= every cell size is the identity selection") {
    assert(sample(100).count() === emb.count())
  }
}
