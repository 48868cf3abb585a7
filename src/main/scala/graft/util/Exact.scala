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
  * DOUBLE.
  *
  * Two portability rules, measured against DuckDB 1.0 (the driver's
  * oracle engine):
  *
  * 1. **double→decimal casts must never need rounding.** Both engines
  *    cast through the double's SHORTEST decimal representation, but
  *    DuckDB truncates digits beyond the target scale while Spark
  *    rounds HALF_UP — they agree only when the shortest repr already
  *    fits the scale. Raw data columns carry ≤2 decimal digits, so
  *    casting them to scale ≥2 is exact in both engines. A computed
  *    double product has ~16 significant digits and MUST NOT be cast
  *    to decimal; instead cast the 2dp operands to decimal(9,2) first
  *    and multiply in decimal — (9,2)×(10,2)×(10,2) stays ≤ (31,6) in
  *    Spark and (29,6) in DuckDB, exact in both, no rescale.
  * 2. **decimal→double casts need `|value|·10^scale < 2^53`.** Spark
  *    rounds the exact decimal correctly once; DuckDB converts the
  *    mantissa int to double and divides by 10^scale — two roundings.
  *    Both agree while the mantissa is double-exact. Scale-6 sums are
  *    good to |sum| ≈ 9·10^9 — past the sf0.1 bench gate; at cluster
  *    scale surface decimals, not doubles.
  *
  * Never downscale a decimal (e.g. (38,6)→(38,4)): DuckDB truncates,
  * Spark rounds — guaranteed drift on arbitrary digits.
  */
object Exact {
  val Dec: DecimalType = DecimalType(18, 4)

  /** Cast to decimal(18,4) for exact aggregation — raw ≤4dp columns
    * only, never computed doubles (rule 1 above). */
  def dec(c: Column): Column = c.cast(Dec)

  /** Cast a raw ≤2dp column to a narrow decimal(9,2) so decimal
    * products stay within precision 38 without a lossy rescale. */
  def dec2(c: Column): Column = c.cast(DecimalType(9, 2))

  /** Exact decimal sum surfaced as a double (see object doc). */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")
}
