package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed left as-of join: for each left row, attach the most
  * recent right row with the same key whose time is `<=` the left time.
  *
  * Spark has no built-in as-of join, so we compose one from built-ins
  * (preference (a) of the build rules) with the classic union+window
  * technique instead of a quadratic `crossJoin` + filter:
  *
  *   1. tag both sides and union them on (key, time): rights carry
  *      their payload in a struct, lefts carry their whole row in a
  *      struct (so no rejoin is needed afterwards);
  *   2. one shuffle: window partitioned by key, ordered by
  *      (time, side, tie) with rights sorting before lefts at equal
  *      time — that gives inclusive `<=` semantics;
  *   3. `last(payload, ignoreNulls)` over unbounded-preceding rows
  *      gives every left row the latest right payload at or before it;
  *   4. keep left rows, unpack both structs.
  *
  * Cost: a single hash shuffle of |L|+|R| rows on the key plus an
  * in-partition sort — the same O(n log n) a dedicated sort-merge as-of
  * join would pay, and it scales linearly with partition count at
  * 100 TB (no broadcast, no quadratic candidate set; skew is bounded by
  * the key distribution itself, which AQE skew handling can split).
  * Equal right times are resolved to the last payload in
  * `rightTieBreak` order, so output is deterministic when that column
  * is unique.
  */
object AsOfJoin {

  /** @param left          left (probe) side
    * @param right         right (quote) side; its payload columns are attached
    * @param key           equi-key column name present on both sides
    * @param leftTime      event-time column on `left`
    * @param rightTime     event-time column on `right`
    * @param rightPayload  right columns to attach to each left row
    * @param rightTieBreak deterministic ordering for equal right times
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTieBreak: String
  ): DataFrame = {
    val leftCols = left.columns.toSeq

    val r = right.select(
      col(key),
      col(rightTime).as("__t"),
      lit(0).as("__side"),
      col(rightTieBreak).as("__tie"),
      struct(rightPayload.map(col): _*).as("__payload"),
      lit(null).cast(
        org.apache.spark.sql.types.StructType(
          left.schema.fields.filter(f => leftCols.contains(f.name)))
      ).as("__lrow")
    )
    val l = left.select(
      col(key),
      col(leftTime).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(r.schema("__tie").dataType).as("__tie"),
      lit(null).cast(r.schema("__payload").dataType).as("__payload"),
      struct(leftCols.map(col): _*).as("__lrow")
    )

    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = r
      .unionByName(l)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    joined.select(
      leftCols.map(c => col(s"__lrow.$c").as(c)) ++
        rightPayload.map(c => col(s"__asof.$c").as(c)): _*)
  }
}
