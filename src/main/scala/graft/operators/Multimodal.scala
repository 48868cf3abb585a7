package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `BINARY` payloads + typed
  * metadata structs, as a training-data pipeline would carry images /
  * audio / video alongside text (SURVEY §2.9).
  *
  * The Spark-side mechanics are real — schema, partition-friendly
  * column layout, deterministic per-row derivations that whole-stage
  * codegen handles. The actual media DECODE step is stubbed with a
  * deterministic fake (this container ships no image/audio codecs):
  * [[imageMetaStub]] derives plausible metadata purely from payload
  * bytes, so plans, schemas and tests are faithful while the codec
  * call is the single swap-in point for a real decoder (a JNI/py
  * bridge at the `mapPartitions` boundary in production).
  */
object Multimodal {

  /** Synthesize an opaque binary payload from a text column (the
    * driver corpus has no media files; UTF-8 bytes stand in as the
    * payload while keeping every downstream op byte-faithful). */
  def payloadOf(text: Column): Column = text.cast("binary")

  def payloadLen(payload: Column): Column = octet_length(payload).cast("long")

  /** Stable content id of the payload bytes. */
  def payloadMd5(payload: Column): Column = md5(payload)

  /** First `n` payload bytes as lowercase hex (magic-number sniffing
    * in a real pipeline). */
  def headHex(payload: Column, n: Int): Column =
    lower(hex(substring(payload, 1, n)))

  /** STUB decode: deterministic fake image metadata derived from the
    * payload alone (no codec in this container). Real implementation
    * would decode the header; the schema and call sites are final. */
  def imageMetaStub(payload: Column): Column = {
    val len = octet_length(payload).cast("long")
    struct(
      (len % 640 + 1).as("width"),
      ((len * 7) % 480 + 1).as("height"),
      (len % 3 + 1).as("channels"))
  }

  /** STUB frame sampling: every `stride`-th byte as lowercase hex —
    * the plumbing (array column, deterministic order, bounded size)
    * of a video frame sampler with the codec swapped out. */
  def frameSampleStub(payload: Column, stride: Int): Column =
    when(octet_length(payload) > 0,
      transform(
        sequence(lit(1), octet_length(payload), lit(stride)),
        i => lower(hex(payload.substr(i, lit(1))))))
      .otherwise(array().cast("array<string>"))

  /** Attach the standard multimodal columns to a DataFrame. */
  def withPayloadColumns(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", payloadOf(col(textCol)))
      .withColumn("payload_len", payloadLen(col("payload")))
      .withColumn("payload_md5", payloadMd5(col("payload")))
      .withColumn("image_meta", imageMetaStub(col("payload")))
}
