package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Importance

/** Streaming importance gate ≡ batch scoreAffinity, bit for bit, and
  * statelessness across micro-batch boundaries. */
class ImportanceStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private def corpus = Seq(
    (1L, "a b a b", "en"), (2L, "a b c", "en"),
    (3L, "x y x y", "de"), (4L, "a", "de"),
    (5L, "a b x y", "en"), (6L, "c b a", "de")
  ).toDF("doc_id", "text", "lang")

  test("stream affinity == batch affinity bit-for-bit; threshold gates") {
    val counts = Importance.targetAffinityCounts(
      corpus, "doc_id", "text", isTarget = col("lang") === "en",
      n = 2, dim = dim, salt = "dsir")
    val batch = Importance.scoreAffinity(
      corpus, "doc_id", "text", counts, n = 2, dim = dim, salt = "dsir")
      .select("doc_id", "affinity")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val collected = Importance.collectCounts(counts)

    val stream = MemoryStream[(Long, String)](spark)(
      Encoders.product[(Long, String)])
    val gated = StreamingOps.importanceFilterStream(
      stream.toDF.toDF("doc_id", "text"), "text",
      collected, minAffinity = 0.0, n = 2, dim = dim, salt = "dsir")
    val q = gated.writeStream.format("memory").queryName("imp_gate")
      .outputMode("append").start()
    try {
      // two micro-batches — a stateless gate must score batch 2 rows
      // identically to batch 1 rows (nothing carries over)
      stream.addData(Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x y x y")))
      q.processAllAvailable()
      stream.addData(Seq((4L, "a"), (5L, "a b x y"), (6L, "c b a")))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("imp_gate")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(streamed.keySet === batch.keySet) // minAffinity=0 keeps all
    streamed.foreach { case (id, a) =>
      assert(java.lang.Double.doubleToLongBits(a) ==
        java.lang.Double.doubleToLongBits(batch(id)), s"affinity drift doc $id")
    }
    // the gate actually gates: doc 3 (pure non-target grams) falls
    // below a 0.5 threshold while target-heavy docs pass
    val strict = StreamingOps.importanceFilterStream(
      corpus.select("doc_id", "text"), "text",
      collected, minAffinity = 0.5, n = 2, dim = dim, salt = "dsir")
      .select("doc_id").as[Long].collect().toSet
    assert(!strict(3L) && strict(1L) && strict(2L))
  }
}
