package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Fingerprint

/** Streaming decontamination twins vs the batch operators on real
  * sf0.001 documents: the detection stream's contaminated-id set must
  * equal the batch detector's on any prefix (exact, stateless), and
  * the Bloom removal gate must drop a SUPERSET of the batch drop set
  * (no false negatives ever) that is exactly equal at the spec's
  * 28-bits/gram sizing on this corpus (zero false-positive drops —
  * deterministic: xxhash probes, fixed data). */
class DecontaminateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val n = 5
  private lazy val docs =
    spark.read.parquet(sf("sf0.001/documents.parquet"))
      .select("doc_id", "text")
  private lazy val heldOut = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
  private lazy val train = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)

  test("detection stream ≡ batch contaminated set on every prefix") {
    val heldGrams = Fingerprint.heldOutGrams(heldOut, "doc_id", "text", n)
    val batchContaminated = Fingerprint.ngramContamination(
        train, heldOut, "doc_id", "text", n)
      .filter(col("contaminated")).select("doc_id")
      .as[Long].collect().toSet
    // the detector reports held-out docs hit by train grams; the
    // stream probes TRAIN docs against held grams — derive the
    // train-side batch truth the same way decontaminate does
    val batchDropped = train
      .join(Fingerprint.decontaminate(train, heldOut, "doc_id", "text", n)
        .select("doc_id"), Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(batchContaminated.nonEmpty && batchDropped.nonEmpty,
      "test corpus must actually leak for this spec to bite")

    val rows = train.select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
    val (p1, p2) = rows.splitAt(rows.length / 2)
    val stream = MemoryStream[(Long, String)](spark)(
      Encoders.product[(Long, String)])
    val hits = StreamingOps.contaminationHitsStream(
      stream.toDF.toDF("doc_id", "text"), "doc_id", "text", heldGrams, n)
    val q = hits.writeStream.format("memory").queryName("cont_hits")
      .outputMode("append").start()
    try {
      stream.addData(p1.toSeq)
      q.processAllAvailable()
      val afterP1 = spark.table("cont_hits").select("doc_id")
        .as[Long].collect().toSet
      assert(afterP1 === batchDropped.intersect(p1.map(_._1).toSet),
        "prefix 1 contaminated ids drifted from batch")
      stream.addData(p2.toSeq)
      q.processAllAvailable()
      val afterP2 = spark.table("cont_hits").select("doc_id")
        .as[Long].collect().toSet
      assert(afterP2 === batchDropped, "full-stream ids drifted from batch")
    } finally q.stop()
  }

  test("bloom removal gate: superset of batch drops; exact at 28 bits/gram") {
    val nGrams = Fingerprint.heldOutGrams(heldOut, "doc_id", "text", n).count()
    val filter = Fingerprint.gramBloomFilter(
      heldOut, "doc_id", "text", n,
      expectedItems = nGrams, numBits = 28L * nGrams)
    val batchKept = Fingerprint.decontaminate(
        train, heldOut, "doc_id", "text", n)
      .select("doc_id").as[Long].collect().toSet

    val stream = MemoryStream[(Long, String)](spark)(
      Encoders.product[(Long, String)])
    val gate = StreamingOps.decontaminateStreamBloom(
      stream.toDF.toDF("doc_id", "text"), "text", filter, n)
    val q = gate.writeStream.format("memory").queryName("bloom_gate")
      .outputMode("append").start()
    try {
      val rows = train.select("doc_id", "text").as[(Long, String)]
        .collect().sortBy(_._1)
      rows.grouped(math.max(rows.length / 3, 1)).foreach { b =>
        stream.addData(b.toSeq); q.processAllAvailable()
      }
    } finally q.stop()
    val streamKept = spark.table("bloom_gate").select("doc_id")
      .as[Long].collect().toSet
    // no false negatives: everything batch drops, the gate drops
    assert(streamKept.subsetOf(batchKept),
      "bloom gate leaked a batch-dropped document")
    // at 28 bits/gram on this corpus: zero over-drops (deterministic)
    assert(streamKept === batchKept,
      s"over-dropped ${batchKept.size - streamKept.size} clean docs")
    // null filter (gram-free held-out) keeps everything
    val all = StreamingOps.decontaminateStreamBloom(
      train, "text", null, n).count()
    assert(all === train.count())
  }
}
