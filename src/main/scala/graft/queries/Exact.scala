package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine deterministic arithmetic helpers.
  *
  * Floating-point SUM/AVG results depend on accumulation order, which differs
  * between Spark's partial/final hash aggregation and the DuckDB oracle.
  * Routing through exact decimal arithmetic makes the result order-independent
  * and therefore bit-identical across engines:
  *
  *   Spark : CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
  *   DuckDB: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
  *
  * Scale >= 1 keeps rounding deterministic too: a decimal half-boundary with
  * scale >= 1 (e.g. 0.00005) is not representable in binary, so a double is
  * never exactly on the boundary and both engines round identically no matter
  * their tie-breaking rule.
  *
  * This is a *test-oracle* discipline, not an engine limitation — the same
  * query shapes run with plain double sums in production (see Bench).
  */
object Exact {
  /** Order-independent sum of a double column, returned as double. */
  def dsum(c: Column, precision: Int = 18, scale: Int = 4): Column =
    sum(c.cast(DecimalType(precision, scale))).cast("double")

  /** Order-independent average (exact decimal sum / count). */
  def davg(c: Column): Column =
    dsum(c) / count(c)

  /** Order-independent sum of a product of two double columns. */
  def dsumProduct(a: Column, b: Column): Column =
    sum(a.cast(DecimalType(18, 4)) * b.cast(DecimalType(18, 4))).cast("double")

  /** SQL fragment mirrors, for building the DuckDB oracle strings.
    *
    * The final decimal->double cast routes through VARCHAR: DuckDB's direct
    * DECIMAL->DOUBLE converts the scaled hugeint to double and then divides
    * (two roundings), which diverges from Spark's correctly-rounded
    * Decimal.toDouble once the scaled integer exceeds 2^53. strtod on the
    * decimal string is correctly rounded, matching Spark bit-for-bit at
    * any magnitude. */
  def sqlDsum(expr: String): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)"
  /** scale-8 variant for small-magnitude values (embedding components:
    * float precision ~7 digits, sums in the thousands). */
  def sqlDsum8(expr: String): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(18,8))) AS VARCHAR) AS DOUBLE)"
  def sqlDavg(expr: String): String =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT($expr)"
}
