package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  // old: two en docs of 4 tokens (stop deciles 2 and 10)
  // new: one kept doc + one new 2-token de doc (stop decile 0)
  private def oldDocs = Seq(
    (1L, "a b c d", "en"),
    (2L, "the the the the", "en")).toDF("doc_id", "text", "lang")
  private def newDocs = Seq(
    (1L, "a b c d", "en"),
    (3L, "x y", "de")).toDF("doc_id", "text", "lang")

  test("drift report: hand-computed buckets, counts, exact ppm") {
    val out = Drift.report(oldDocs, newDocs, "doc_id", "text", Some("lang"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // len_bin: 4 tokens -> bin(4)="100" len 3; 2 tokens -> "10" len 2
    assert(out(("len_bin", "3")) == ((2L, 1L, 1000000L, 500000L, -500000L)))
    assert(out(("len_bin", "2")) == ((0L, 1L, 0L, 500000L, 500000L)))
    // stop_decile: "a b c d" -> (1*10) div 4 = 2; "the the the the"
    // -> 10; "x y" -> 0
    assert(out(("stop_decile", "2")) == ((1L, 1L, 500000L, 500000L, 0L)))
    assert(out(("stop_decile", "10")) == ((1L, 0L, 500000L, 0L, -500000L)))
    assert(out(("stop_decile", "0")) == ((0L, 1L, 0L, 500000L, 500000L)))
    // lang: en 2->1, de 0->1
    assert(out(("lang", "en")) == ((2L, 1L, 1000000L, 500000L, -500000L)))
    assert(out(("lang", "de")) == ((0L, 1L, 0L, 500000L, 500000L)))
    assert(out.size == 7)
  }

  test("identical snapshots drift to zero everywhere") {
    val out = Drift.report(oldDocs, oldDocs, "doc_id", "text", Some("lang"))
    assert(out.filter(col("delta_ppm") =!= 0L || col("old_n") =!= col("new_n")).isEmpty)
  }

  test("langCol omitted: only the two text features") {
    val feats = Drift.report(oldDocs, newDocs, "doc_id", "text")
      .select("feature").distinct().as[String].collect().toSet
    assert(feats == Set("len_bin", "stop_decile"))
  }

  test("plan: keyed aggregations only — no cartesian, no nested loop") {
    val plan = Drift.report(oldDocs, newDocs, "doc_id", "text", Some("lang"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
