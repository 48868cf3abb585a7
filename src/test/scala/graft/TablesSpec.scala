package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Guards the schema-adaptive `Tables.events` loader: the driver's
  * testdata has shipped `events.ts` both as parquet TIMESTAMP(NANOS)
  * and as `timestamp[us]` (no tz → TIMESTAMP_NTZ in Spark). A feed
  * change must fail HERE, in `sbt test`, not at the driver gate
  * (round 10 lost 9 queries to exactly this). */
class TablesSpec extends SparkSpec {

  test("events exposes ts: TimestampType and ts_ns: LongType under the current feed") {
    val ev = Tables(spark, sf("sf0.001")).events
    assert(ev.schema("ts").dataType == TimestampType,
      s"ts must normalize to TimestampType, got ${ev.schema("ts").dataType}")
    assert(ev.schema("ts_ns").dataType == LongType,
      s"ts_ns must be ns-since-epoch long, got ${ev.schema("ts_ns").dataType}")
  }

  test("events ts and ts_ns agree (ts_ns is exactly the µs instant in ns)") {
    val bad = Tables(spark, sf("sf0.001")).events
      .where(expr("unix_micros(ts) * 1000L") =!= col("ts_ns"))
      .count()
    assert(bad == 0L, s"$bad rows where ts_ns != unix_micros(ts)*1000")
  }

  test("events smoke aggregation returns rows") {
    val n = Tables(spark, sf("sf0.001")).events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .count()
    assert(n > 0, "daily aggregation over events returned no rows")
  }

  // VERDICT r11 #8: the documents/embeddings feeds get the same
  // vigilance as events — a silent driver-side schema change to the
  // columns the dedup/ANN/text pipelines key on must fail here first.
  test("documents feed: pipeline-critical columns keep their types") {
    import org.apache.spark.sql.types.StringType
    val d = Tables(spark, sf("sf0.001")).documents
    val types = d.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types.get("doc_id").contains(LongType), s"doc_id must be long, got ${types.get("doc_id")}")
    assert(types.get("text").contains(StringType), s"text must be string, got ${types.get("text")}")
    assert(types.get("lang").contains(StringType), s"lang must be string, got ${types.get("lang")}")
    assert(types.get("source").contains(StringType), s"source must be string, got ${types.get("source")}")
    assert(types.get("n_chars").contains(LongType), s"n_chars must be long, got ${types.get("n_chars")}")
  }

  test("embeddings feed: vec_id long, embedding array<float>, consistent dims") {
    import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType}
    val e = Tables(spark, sf("sf0.001")).embeddings
    val types = e.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types.get("vec_id").contains(LongType), s"vec_id must be long, got ${types.get("vec_id")}")
    assert(types.get("embedding").exists {
      case ArrayType(FloatType, _) => true
      case _ => false
    }, s"embedding must be array<float>, got ${types.get("embedding")}")
    assert(types.get("label").contains(IntegerType), s"label must be int, got ${types.get("label")}")
    val dims = e.select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
    assert(dims.length == 1 && dims.head > 0,
      s"embedding dims must be constant and positive, got ${dims.mkString(",")}")
  }
}
