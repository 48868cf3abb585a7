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
}
