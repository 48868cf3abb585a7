package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact GLOBAL rank — `row_number() OVER (ORDER BY key, id)` without
  * ever forming `Exchange SinglePartition` over the corpus. A
  * corpus-wide total order shows up everywhere in curation (global
  * quality rank, length-ordered export, head/tail trims), and the
  * naive window is the classic scale killer: Spark moves every row of
  * the corpus through ONE task.
  *
  * Decomposition (all exact, no sampling in the result):
  *
  *   rank(key, id) = |rows with key' < key|                 (key offset)
  *                 + |same-key rows in lower id sub-buckets| (sub offset)
  *                 + row_number within (key, sub) by id      (local rank)
  *
  *  - the KEY offset comes from the distinct-key count table: one
  *    keyed aggregation (map-side partials), then a running sum over
  *    |distinct keys| rows — a bounded single-partition window over
  *    the AGGREGATE, never the corpus (the operator is designed for
  *    DISCRETE keys: token counts, deciles, integer-grid scores — the
  *    features a curation stack actually ranks; for a continuous key,
  *    bucket it first, the E45 approx-quantile discipline);
  *  - a HOT key (at 100 TB, billions of documents share one token
  *    count) would still flood one window partition, so ties are
  *    split by MONOTONE id sub-buckets: `numSubBuckets−1` boundary
  *    ids from one `percentile_approx` pass ride as literals and
  *    sub = #boundaries < id. Monotone-in-id means within one key the
  *    (sub, id) order IS the id order, so correctness never depends
  *    on where the boundaries fall — skewed boundaries only skew the
  *    load. The sub offsets are a per-key running sum over ≤
  *    numSubBuckets rows per key;
  *  - the local rank is a window over (key, sub) partitions — pinned
  *    keyed exchange (REPARTITION_BY_NUM, AQE-exempt), narrow
  *    (id, key, sub) rows only.
  *
  * Both offset tables are aggregate-sized and broadcast back onto the
  * corpus rows. Keys must be non-null (a null key has no place in a
  * total order — filter first).
  */
object Rank {

  /** (idCol, keyCol, out) — `out` is the 1-based exact global rank by
    * (keyCol ASC, idCol ASC). `idCol` must be unique and numeric,
    * `keyCol` discrete (see object doc). */
  def globalRank(
      df: DataFrame, idCol: String, keyCol: String,
      numSubBuckets: Int = 32, out: String = "rank"): DataFrame = {
    require(numSubBuckets >= 1, s"numSubBuckets=$numSubBuckets must be >= 1")
    val parts = Dedup.pinnedParts(df)
    val narrow = df.select(col(idCol), col(keyCol))
    // monotone id boundaries: ≤ numSubBuckets−1 values, one sketch
    // aggregation collected once (the trainCentroids bounded-driver-
    // artifact contract); boundary PLACEMENT only balances load —
    // the rank arithmetic is exact wherever they fall
    val bounds: Seq[Long] =
      if (numSubBuckets == 1) Seq.empty
      else {
        val qs = (1 until numSubBuckets).map(_.toDouble / numSubBuckets)
        val row = narrow.agg(percentile_approx(
          col(idCol).cast("double"), typedLit(qs), lit(10000))).collect()(0)
        if (row.isNullAt(0)) Seq.empty
        else row.getSeq[Double](0).map(_.toLong).distinct.sorted
      }
    val subCol =
      if (bounds.isEmpty) lit(0)
      else size(filter(typedLit(bounds), b => b < col(idCol).cast("long")))
    val rows = narrow.withColumn("__sub", subCol)
    // distinct-key offsets: running count over the aggregate table
    val keyOff = rows.groupBy(keyCol).agg(count(lit(1)).as("__ck"))
      .withColumn("__koff",
        coalesce(
          sum("__ck").over(Window.orderBy(col(keyCol))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("__ck")
    // per-(key, sub) offsets: running count within the key over the
    // ≤ numSubBuckets-row aggregate slices
    val subOff = rows.groupBy(keyCol, "__sub").agg(count(lit(1)).as("__cs"))
      .withColumn("__soff",
        coalesce(
          sum("__cs").over(Window.partitionBy(col(keyCol)).orderBy(col("__sub"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("__cs")
    val local = row_number().over(
      Window.partitionBy(col(keyCol), col("__sub")).orderBy(col(idCol)))
    rows
      .repartition(parts, col(keyCol), col("__sub"))
      .withColumn("__lr", local.cast("long"))
      .join(broadcast(subOff), Seq(keyCol, "__sub"))
      .join(broadcast(keyOff), Seq(keyCol))
      .select(
        col(idCol), col(keyCol),
        (col("__koff") + col("__soff") + col("__lr")).as(out))
  }

  /** [[globalRank]] for CONTINUOUS / high-cardinality keys, where a
    * distinct-key offset table would itself be corpus-sized: bucket
    * the key by `numBuckets−1` monotone sketch boundaries (equal keys
    * always co-locate — the boundary compare is strict), take bucket
    * offsets from the ≤ numBuckets-row count table, and rank within
    * each bucket by (key, id). Exact wherever the boundaries fall;
    * their placement only balances the per-bucket sort volume
    * (~corpus/numBuckets under a healthy sketch). The one skew case
    * this variant does NOT split is a single key value carrying a
    * dominant corpus fraction — that is [[globalRank]]'s tie-split
    * territory; pick by key shape. */
  def globalRankRange(
      df: DataFrame, idCol: String, keyCol: String,
      numBuckets: Int = 256, out: String = "rank"): DataFrame = {
    require(numBuckets >= 1, s"numBuckets=$numBuckets must be >= 1")
    val parts = Dedup.pinnedParts(df)
    val narrow = df.select(col(idCol), col(keyCol))
    val bounds: Seq[Double] =
      if (numBuckets == 1) Seq.empty
      else {
        val qs = (1 until numBuckets).map(_.toDouble / numBuckets)
        val row = narrow.agg(percentile_approx(
          col(keyCol).cast("double"), typedLit(qs), lit(10000))).collect()(0)
        if (row.isNullAt(0)) Seq.empty
        else row.getSeq[Double](0).distinct.sorted
      }
    val bktCol =
      if (bounds.isEmpty) lit(0)
      else size(filter(typedLit(bounds), b => b < col(keyCol).cast("double")))
    val rows = narrow.withColumn("__bkt", bktCol)
    val bktOff = rows.groupBy("__bkt").agg(count(lit(1)).as("__cb"))
      .withColumn("__boff",
        coalesce(
          sum("__cb").over(Window.orderBy(col("__bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("__cb")
    val local = row_number().over(
      Window.partitionBy(col("__bkt")).orderBy(col(keyCol), col(idCol)))
    rows
      .repartition(parts, col("__bkt"))
      .withColumn("__lr", local.cast("long"))
      .join(broadcast(bktOff), Seq("__bkt"))
      .select(col(idCol), col(keyCol), (col("__boff") + col("__lr")).as(out))
  }
}
