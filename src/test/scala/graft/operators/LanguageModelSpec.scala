package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  // corpus bigram counts: "a b"→5, "b a"→2, "b c"→1, "b x"→1
  private def docs = Seq(
    (1L, "a b a b c"),
    (2L, "a b x"),
    (3L, "z"),
    (4L, "a b a b")).toDF("doc_id", "text")

  test("ngramCounts: positional multiplicities, not per-doc distinct") {
    val m = LanguageModel.ngramCounts(docs, "text", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a b" -> 5L, "b a" -> 2L, "b c" -> 1L, "b x" -> 1L))
  }

  test("familiarity: hand-computed rates at minCount=2") {
    val out = LanguageModel.familiarity(docs, "doc_id", "text", n = 2, minCount = 2)
      .orderBy("doc_id").collect()
    assert(out.toSeq == Seq(
      Row(1L, 4L, 3L, 0.75), // ab,ba,ab,bc → ab(5)+ba(2) familiar = 3
      Row(2L, 2L, 1L, 0.5),  // ab,bx → ab familiar
      Row(3L, 0L, 0L, 0.0),  // sub-bigram doc preserved as a zero row
      Row(4L, 3L, 3L, 1.0))) // ab,ba,ab all familiar
  }

  test("familiarity: minCount=1 makes every position familiar") {
    val out = LanguageModel.familiarity(docs, "doc_id", "text", n = 2, minCount = 1)
      .filter($"n_grams" > 0).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(1) == r.getLong(2) && r.getDouble(3) == 1.0))
  }

  test("familiarity plan: equi-join on the gram key, never a cartesian") {
    val plan = LanguageModel.familiarity(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("familiarity: trigram familiarity on the real documents table") {
    val real = graft.Tables(spark, sf("sf0.001")).documents
    val out = LanguageModel.familiarity(real, "doc_id", "text", n = 3, minCount = 2)
    val rows = out.collect()
    assert(rows.length == real.count())
    assert(rows.forall { r =>
      val (n, fam, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      fam >= 0 && fam <= n && rate >= 0.0 && rate <= 1.0 &&
        (n == 0 && rate == 0.0 || math.abs(rate - fam.toDouble / n) < 1e-15)
    })
  }
}
