package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * NaN-aware math, both scalar (for the online algorithms) and as Spark
 * `Column` expressions (for the DataFrame planner). Semantics follow the
 * reference (atlas-core util/Math.scala): NaN means "no data" and is treated
 * as absent by the `*NaN` variants; only if every input is NaN does the
 * result stay NaN. Values within 1e-12 of zero are false as booleans.
 *
 * In the long-format series frame, "no data" appears in two encodings:
 * an absent row (sparse frames) or an explicit NaN value (dense frames).
 * The Column helpers canonicalize via nanToNull/nullToNan so that Spark's
 * null-skipping aggregates implement the NaN-skipping semantics.
 */
object NanMath {

  /**
   * Tie-breaker added before rounding comparison outputs to 4 decimals.
   * Parallel float summation is order-nondeterministic (both in Spark and
   * in the DuckDB oracle), so a quotient whose exact value sits on a
   * x.xxxx5 boundary flips its 4th decimal between runs. Shifting both
   * engines by the same epsilon (larger than any accumulated summation
   * error, far smaller than the 1e-4 resolution) moves every such value
   * off the boundary, making round-then-hash comparisons deterministic.
   */
  val RoundEps = 1.3e-7

  // ---- scalar ----

  def isNearlyZero(v: Double): Boolean = v.isNaN || math.abs(v) < 1e-12
  def toBoolean(v: Double): Boolean = !isNearlyZero(v)
  def toBooleanDouble(v: Double): Double = if (toBoolean(v)) 1.0 else 0.0

  def addNaN(a: Double, b: Double): Double =
    if (a.isNaN) b else if (b.isNaN) a else a + b

  def subtractNaN(a: Double, b: Double): Double = addNaN(a, -b)

  def maxNaN(a: Double, b: Double): Double =
    if (a.isNaN) b else if (b.isNaN) a else if (a > b) a else b

  def minNaN(a: Double, b: Double): Double =
    if (a.isNaN) b else if (b.isNaN) a else if (a < b) a else b

  // ---- Column encoding helpers ----

  val nan: Column = lit(Double.NaN)

  /** NaN (and null) -> null, so Spark's null-skipping aggregates skip it. */
  def nanToNull(c: Column): Column = when(isnan(c), lit(null)).otherwise(c)

  /** null -> NaN, the dense-frame encoding of "no data". */
  def nullToNan(c: Column): Column = coalesce(c, nan)

  /** Truthiness of a signal value: non-NaN and not nearly zero. */
  def boolCol(c: Column): Column = !isnan(c) && abs(c) >= lit(1e-12)

  // ---- NaN-skipping aggregate columns (for groupBy.agg) ----
  // All-NaN/empty groups yield null; callers either drop those rows (sparse
  // output) or nullToNan them (dense output).

  def sumNaN(c: Column): Column = sum(nanToNull(c))
  def minNaNAgg(c: Column): Column = min(nanToNull(c))
  def maxNaNAgg(c: Column): Column = max(nanToNull(c))
  def avgNaN(c: Column): Column = avg(nanToNull(c))

  /** Count of inputs with data; 0 -> null (no series had data -> NaN). */
  def countNaN(c: Column): Column = {
    val n = count(nanToNull(c))
    when(n > 0, n.cast("double")).otherwise(lit(null))
  }

  // ---- pointwise binary operators on (possibly NaN) value columns ----
  // Inputs must be NaN-encoded (never null): apply nullToNan first.

  def addCol(a: Column, b: Column): Column =
    when(isnan(a), b).when(isnan(b), a).otherwise(a + b)

  def subCol(a: Column, b: Column): Column =
    when(isnan(a), -b).when(isnan(b), a).otherwise(a - b)

  def mulCol(a: Column, b: Column): Column = a * b // NaN propagates

  /** Reference `:div`: x/0 is NaN but 0/0 is 0 (MathExpr.scala Divide). */
  def divCol(a: Column, b: Column): Column =
    when(isnan(a) || isnan(b), nan)
      .when(b === 0.0 && a === 0.0, lit(0.0))
      .when(b === 0.0, nan)
      .otherwise(a / b)

  def faddCol(a: Column, b: Column): Column = a + b
  def fsubCol(a: Column, b: Column): Column = a - b
  def fmulCol(a: Column, b: Column): Column = a * b

  def fdivCol(a: Column, b: Column): Column =
    when(isnan(a) || isnan(b), nan)
      .when(b === 0.0 && a === 0.0, nan) // IEEE 0/0 = NaN
      .when(b === 0.0 && a > 0.0, lit(Double.PositiveInfinity))
      .when(b === 0.0 && a < 0.0, lit(Double.NegativeInfinity))
      .otherwise(a / b)

  def powCol(a: Column, b: Column): Column = pow(a, b)

  // Comparisons: plain Java compare semantics -> NaN compares false -> 0.0.
  def gtCol(a: Column, b: Column): Column =
    when(!isnan(a) && !isnan(b) && a > b, lit(1.0)).otherwise(lit(0.0))
  def geCol(a: Column, b: Column): Column =
    when(!isnan(a) && !isnan(b) && a >= b, lit(1.0)).otherwise(lit(0.0))
  def ltCol(a: Column, b: Column): Column =
    when(!isnan(a) && !isnan(b) && a < b, lit(1.0)).otherwise(lit(0.0))
  def leCol(a: Column, b: Column): Column =
    when(!isnan(a) && !isnan(b) && a <= b, lit(1.0)).otherwise(lit(0.0))

  def andCol(a: Column, b: Column): Column =
    when(boolCol(a) && boolCol(b), lit(1.0)).otherwise(lit(0.0))
  def orCol(a: Column, b: Column): Column =
    when(boolCol(a) || boolCol(b), lit(1.0)).otherwise(lit(0.0))
}
