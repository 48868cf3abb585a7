package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated analytic tables (see TESTDATA.md /
  * FIXTURES.md §B). One parquet file per table under `dir`.
  *
  * Reads are plain `spark.read.parquet` so Catalyst gets full column
  * pruning + predicate pushdown into the scan; never cache here — the
  * caller decides lifetime.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp ([PARQUET_TYPE_ILLEGAL]). Read it as a raw
    * ns-since-epoch long (legacy conf) and truncate to microseconds
    * ourselves — `ts div 1000` stays in integer arithmetic (a double
    * division would lose precision above 2^53 ns ≈ 1970+104 days). */
  private def eventsRaw: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events")
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `ts` truncated to µs (Spark timestamp); `ts_ns` keeps the raw
    * ns-since-epoch long for exact ordering/tiebreaks against the
    * ns-precision oracle. */
  def events: DataFrame =
    eventsRaw
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
