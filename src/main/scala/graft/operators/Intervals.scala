package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (overlap/containment) joins as shuffle-friendly
  * equi-joins.
  *
  * Vanilla Spark plans an inequality-only join condition
  * (`p BETWEEN s AND e`) as BroadcastNestedLoopJoin or a cartesian
  * product — O(|L|·|R|) comparisons, a non-starter at scale. The
  * standard fix is BINNING: quantize time into fixed-width bins,
  * replicate each interval into every bin it covers, map each point
  * to its single bin, equi-join on the bin id, and re-check the exact
  * predicate as a residual filter. The plan becomes a plain hash join
  * Spark shuffles/broadcasts/AQE-optimizes like any other.
  *
  * Correctness: a point's bin is covered by an interval's bin range
  * iff they can overlap, and each point lives in EXACTLY ONE bin, so
  * every true (interval, point) match is produced exactly once — no
  * duplicate elimination needed (asserted in OperatorsSpec).
  *
  * Scale shape (100 TB): replication factor per interval is
  * `len/binWidth + 1` — pick binWidth near the typical interval
  * length so intervals replicate a handful of times while bins stay
  * selective. Skew: a bin containing a hot burst of points is an
  * ordinary hot join key (AQE skew-join splits it). Both sides
  * partition by bin; no driver state, no cartesian (asserted).
  */
object Intervals {

  /** Join `points` to every interval of `intervals` containing them
    * (inclusive bounds). Timestamp columns; rows with NULL or
    * inverted bounds are dropped. Output: all columns of `intervals`
    * then all of `points` (caller disambiguates name collisions
    * beforehand).
    *
    * @param binSeconds bin width; default one week.
    */
  def pointInIntervalJoin(
      intervals: DataFrame, startCol: String, endCol: String,
      points: DataFrame, pointCol: String,
      binSeconds: Long = 7L * 86400L): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive, got $binSeconds")
    val iv = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull &&
             col(startCol) <= col(endCol))
      .withColumn("__bin", explode(sequence(
        floor(unix_timestamp(col(startCol)) / binSeconds).cast("long"),
        floor(unix_timestamp(col(endCol)) / binSeconds).cast("long"))))
    val pt = points
      .where(col(pointCol).isNotNull)
      .withColumn("__bin",
        floor(unix_timestamp(col(pointCol)) / binSeconds).cast("long"))
    iv.join(pt, Seq("__bin"))
      .where(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }
}
