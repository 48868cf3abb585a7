package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression converters.
  *
  * Spark 4's classic `Column` wraps a `ColumnNode` (the Connect-era
  * representation) and no longer exposes a public constructor from a
  * Catalyst `Expression`; the sanctioned internal path is
  * `org.apache.spark.sql.classic.ExpressionUtils`. Libraries that ship
  * native expressions (as this one does for the vector-similarity hot
  * path) conventionally host a one-file shim in the `sql` package to
  * reach it — the shim is the entire extent of private-API use, so a
  * future Spark that publishes an official conversion needs exactly
  * this file changed.
  */
object graftBridge {

  /** Wrap a Catalyst expression as a user-facing [[Column]]. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Extract the Catalyst expression from a classic [[Column]]. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
