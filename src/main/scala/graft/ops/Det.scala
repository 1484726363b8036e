package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for the DuckDB differential oracle (SURVEY.md §7
  * risk 1).
  *
  * Floating-point sums are order-dependent, and Spark's partial
  * aggregation order differs from DuckDB's sequential scan, so any
  * double aggregate can differ in the last bits and fail the driver's
  * hash compare. The fix is to do aggregate arithmetic in DECIMAL
  * (exact, order-independent) and only cast to DOUBLE at the end —
  * decimal→double conversion is correctly rounded in both engines, so
  * results are bit-identical. Per-value double→decimal casts agree
  * between engines except at exact decimal midpoints, which do not
  * occur in the generated data.
  *
  * Every helper here has a matching SQL fragment used in the oracle
  * strings (see the `Sql` mirror below) — keep them in lockstep.
  */
object Det {
  /** Driver-side half-away-from-zero rounding to a whole Long —
    * matches Spark's `round(x, 0)` and DuckDB's `ROUND(x)` exactly, so
    * driver-computed constants (quantized query vectors, Lloyd
    * centroid means) replay bit-identically in both engines. The ONE
    * implementation of this rule; do not inline new copies. */
  def halfUpLong(x: Double): Long =
    new java.math.BigDecimal(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Exact, order-independent sum of a money-like double column. */
  def exactSum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact average: exact decimal sum divided by count in IEEE double —
    * a single correctly-rounded division, identical in both engines. */
  def exactAvg(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double") / count(c)

  /** lineitem revenue term: extendedprice * (1 - discount), exact. */
  def revenueTerm(price: Column, discount: Column): Column =
    price.cast("decimal(12,2)") *
      (lit(1.0).cast("decimal(3,2)") - discount.cast("decimal(3,2)"))

  /** lineitem charge term: revenue * (1 + tax), exact. */
  def chargeTerm(price: Column, discount: Column, tax: Column): Column =
    revenueTerm(price, discount) *
      (lit(1.0).cast("decimal(3,2)") + tax.cast("decimal(3,2)"))

  /** SQL mirrors of the helpers above, for oracle strings. */
  object Sql {
    def exactSum(x: String): String =
      s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
    def exactAvg(x: String): String =
      s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / COUNT($x)"
    def revenueTerm(price: String, discount: String): String =
      s"CAST($price AS DECIMAL(12,2)) * (CAST(1.0 AS DECIMAL(3,2)) - CAST($discount AS DECIMAL(3,2)))"
    def chargeTerm(price: String, discount: String, tax: String): String =
      s"${revenueTerm(price, discount)} * (CAST(1.0 AS DECIMAL(3,2)) + CAST($tax AS DECIMAL(3,2)))"
  }
}
