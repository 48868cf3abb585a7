package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Fingerprint.contaminationBySuite]] contract: the suite-scoped id
  * sets must reconcile exactly with the single-suite operators — the
  * union of suites' contaminated ids equals [[Fingerprint.decontaminate]]'s
  * drop set over the pooled held-out split, and each suite's id set
  * equals the drop set against that suite alone. */
class ContaminationBySuiteSpec extends SparkSpec {
  import spark.implicits._

  private val n = 5
  private lazy val docs =
    spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select("doc_id", "text", "source")
  private lazy val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
  private lazy val heldOut = docs.filter(pmod(col("doc_id"), lit(10)) === 0)

  test("per-suite attribution reconciles with the single-suite scrubs") {
    val bySuite = Fingerprint.contaminationBySuite(
      train, heldOut, "doc_id", "text", "source", n).cache()
    try {
      val suites = heldOut.select("source").distinct().as[String].collect()
      assert(suites.length > 1, "need several suites for this spec to bite")
      assert(bySuite.select("suite").distinct().count() > 1,
        "leakage must span suites")
      assert(bySuite.filter(col("n_hit") <= 0).count() === 0L)
      def dropSetAgainst(h: org.apache.spark.sql.DataFrame): Set[Long] =
        train.join(
          Fingerprint.decontaminate(train, h, "doc_id", "text", n)
            .select("doc_id"),
          Seq("doc_id"), "left_anti")
          .select("doc_id").as[Long].collect().toSet
      // union over suites == pooled drop set
      val unionIds = bySuite.select("doc_id").distinct()
        .as[Long].collect().toSet
      assert(unionIds === dropSetAgainst(heldOut))
      // each suite's slice == the drop set against that suite alone
      suites.foreach { su =>
        val slice = bySuite.filter(col("suite") === su)
          .select("doc_id").as[Long].collect().toSet
        assert(slice === dropSetAgainst(heldOut.filter(col("source") === su)),
          s"suite $su attribution drifted from its single-suite scrub")
      }
    } finally { bySuite.unpersist(); () }
  }
}
