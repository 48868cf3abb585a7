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

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
