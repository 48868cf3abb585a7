package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming corpus monitor: prefix counts ≡ the batch histogram at
  * every micro-batch boundary (the bucket expressions ARE the batch
  * operator's), and the result table never exceeds the bucket space. */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def batchCounts(rows: Seq[(Long, String, String)]) =
    StreamingOps.driftCountsStream(
        rows.toDF("doc_id", "text", "lang"),
        "doc_id", "text", Some("lang"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("prefix counts equal the batch histogram at every boundary") {
    val docs = graft.Tables(spark, sf("sf0.001")).documents
      .select("doc_id", "text", "lang").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    val (p1, p2) = docs.splitAt(docs.length / 2)

    val stream = MemoryStream[(Long, String, String)](spark)(
      Encoders.product[(Long, String, String)])
    val counts = StreamingOps.driftCountsStream(
      stream.toDF.toDF("doc_id", "text", "lang"),
      "doc_id", "text", Some("lang"))
    val q = counts.writeStream.format("memory").queryName("drift_counts")
      .outputMode("complete").start()
    try {
      stream.addData(p1)
      q.processAllAvailable()
      val after1 = spark.table("drift_counts").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(after1 === batchCounts(p1), "prefix 1 drifted from batch")

      stream.addData(p2)
      q.processAllAvailable()
      val after2 = spark.table("drift_counts").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(after2 === batchCounts(docs), "full stream drifted from batch")

      // bounded result table: len_bin magnitudes + stop deciles +
      // live languages — never the corpus
      assert(after2.size <= 64 + 12 + docs.map(_._3).distinct.size)
    } finally q.stop()
  }
}
