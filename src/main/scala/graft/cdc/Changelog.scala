package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog → current-state materialization (the reference's only
  * real "query": `SELECT * FROM users` after a change sequence —
  * utils.py:87-97 — which it never automates; we make it a
  * distributed MERGE).
  *
  * Semantics per key (key = `keyCol` value in the event's post-image,
  * falling back to the pre-image for DELETEs):
  *
  *  - events apply in `lsn` order (commit order — the X2 ordering fix:
  *    ordering is by explicit stream position, not thread timing);
  *  - a key whose LAST event is DELETE disappears;
  *  - otherwise the key's row is: for each column, the value of the
  *    most recent event that set it to something other than the
  *    `"[unchanged]"` TOAST sentinel, falling back to the base-state
  *    value (sentinel = "keep previous" — SURVEY §7.3; the reference
  *    only ever prints the sentinel);
  *  - events before a key's last DELETE are dead history and never
  *    leak into a re-inserted row.
  *
  * Scale shape: one explode of post-images to (key, column, value)
  * rows, one max_by aggregation per (key, column), one conditional-
  * aggregation pivot back to rows, one join against base state — all
  * shuffle-partitioned by key, no windows over whole tables, no
  * driver-side state. Skewed hot keys are bounded by events-per-key
  * and AQE skew splitting.
  */
object Changelog {

  /** Apply a batch of wire-envelope events (layout of
    * [[CdcDecode.toWireDf]]) to `base`, returning the new state.
    * `base` and the result share the layout: `keyCol` plus
    * `valueCols`, all strings (typed views cast downstream).
    */
  def apply(
      base: DataFrame,
      events: DataFrame,
      table: String,
      keyCol: String,
      valueCols: Seq[String]): DataFrame = {
    val spark = base.sparkSession

    val evts = events
      .filter(col("table") === table)
      .select(
        coalesce(col("new_values")(keyCol), col("old_values")(keyCol)).as("__key"),
        col("lsn"), col("operation"), col("new_values"))
      .filter(col("__key").isNotNull)

    // Last event per key decides existence; last DELETE per key fences
    // off dead history.
    val lastPerKey = evts
      .groupBy("__key")
      .agg(
        max_by(col("operation"), col("lsn")).as("__last_op"),
        max(when(col("operation") === "DELETE", col("lsn"))).as("__last_del"))

    // Live column assignments: post-image cells after the delete fence,
    // sentinel cells dropped (they mean "keep previous").
    val cells = evts
      .join(lastPerKey, "__key")
      .filter(col("operation") =!= "DELETE" &&
        (col("__last_del").isNull || col("lsn") > col("__last_del")))
      .select(col("__key"), col("lsn"), explode(col("new_values")).as(Seq("__col", "__val")))
      .filter(col("__col") =!= keyCol && col("__col").isin(valueCols: _*))
      .filter(col("__val").isNull || col("__val") =!= CdcEvent.UnchangedSentinel)
      .groupBy("__key", "__col")
      // struct wrapper: a column explicitly set to NULL must beat the
      // base value, so "latest cell" must be distinguishable from
      // "no cell" after the pivot.
      .agg(max_by(struct(col("__val")), col("lsn")).as("__cell"))

    val setCols = valueCols.map(c =>
      first(when(col("__col") === c, col("__cell")), ignoreNulls = true).as(s"__set_$c"))
    val pivoted = cells
      .groupBy("__key")
      .agg(setCols.head, setCols.tail: _*)

    // Keys whose last event is not DELETE are upserts; they take the
    // latest cell when one exists, else the base value (pre-existing
    // keys whose every event left the column "[unchanged]").
    val upsertKeys = lastPerKey.filter(col("__last_op") =!= "DELETE").select("__key")
    val baseByKey = base.select(col(keyCol).as("__key") +: valueCols.map(c => col(c).as(s"__base_$c")): _*)

    val upserts = upsertKeys
      .join(pivoted, Seq("__key"), "left")
      .join(baseByKey, Seq("__key"), "left")
      .select(col("__key").as(keyCol) +: valueCols.map { c =>
        when(col(s"__set_$c").isNotNull, col(s"__set_$c")("__val"))
          .otherwise(col(s"__base_$c")).as(c)
      }: _*)

    // Base rows not touched by any event survive unchanged; touched
    // keys are replaced by their upsert row (or dropped if deleted).
    val untouched = base
      .join(evts.select(col("__key").as(keyCol)).distinct(), Seq(keyCol), "left_anti")
      .select(col(keyCol) +: valueCols.map(col): _*)

    untouched.unionByName(upserts)
  }
}
