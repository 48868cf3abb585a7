package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-exact numeric helpers.
  *
  * Double sums are order-dependent, so a Spark shuffle-order sum and a
  * DuckDB single-thread sum can differ in the last bits and break the
  * driver's hash compare. We therefore do aggregate arithmetic in
  * DECIMAL (exact, order-independent) and cast the final result back to
  * DOUBLE — both engines round the same exact decimal to the same
  * nearest double, giving bit-identical results.
  */
object Exact {
  val Dec: DecimalType = DecimalType(18, 4)

  /** Cast to decimal(18,4) for exact aggregation. */
  def dec(c: Column): Column = c.cast(Dec)

  /** Exact decimal sum surfaced as a double (see object doc). */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")
}
