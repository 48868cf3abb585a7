package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table materialization for shuffle-free co-located joins.
  *
  * The shuffle is the unit of cost at 100 TB, and a fact–fact join on
  * the same key run N times a day pays its two giant exchanges N
  * times. Bucketing pays the shuffle ONCE at write: both tables are
  * hash-partitioned into the same number of buckets on the join key
  * and each bucket is sorted, so a later equi-join (or groupBy on the
  * key) satisfies the required distribution straight off the scan —
  * `.explain` shows SortMergeJoin with NO Exchange on either side
  * (asserted in OperatorsSpec). This is the persisted complement of
  * `repartition`-based co-location: repartition co-locates within one
  * query, bucketing co-locates across queries and days.
  *
  * Mechanics: `bucketBy` requires the table catalog (bucket count and
  * key live in table metadata — a bare parquet dir cannot carry
  * them), so tables are written with `saveAsTable` + an explicit
  * `path`. Bucket counts must MATCH across join sides (Spark joins
  * b-vs-b without exchange; mismatched counts shuffle the smaller
  * side). Choose bucket count ≈ target parallelism at the biggest
  * consumer; skewed keys still skew their bucket — salt first
  * ([[Skew]]) if one key dominates.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table. Overwrites. */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      keyCol: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucket-count tables on their bucket key — plans
    * without a shuffle on either side. */
  def bucketedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      keyCol: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keyCol)
}
