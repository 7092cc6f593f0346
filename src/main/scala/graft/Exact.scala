package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Cross-engine-exact aggregation helpers.
  *
  * Double sums are order-dependent; Spark's partial aggregation order is
  * nondeterministic across partitions, so a raw `sum(double)` can differ
  * from the DuckDB oracle in the last ulps. All money/measure sums are
  * therefore computed in DECIMAL (exact, order-independent) and only
  * surfaced as DOUBLE at the boundary — bit-identical in both engines.
  */
object Exact {
  /** Exact sum of a money-ish column (2 decimal places). DECIMAL(18,2)
    * holds any per-row value up to 10^16: with ANSI off a narrower cast
    * would overflow to NULL and silently drop rows from the sum. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact sum of a product like extendedprice * (1 - discount).
    * The exact decimal sum is rounded to scale 4 before the double cast:
    * at scale ≤4 the unscaled value stays below 2^53, so BOTH engines
    * convert it to double exactly (DuckDB's high-scale decimal→double
    * cast is not correctly rounded — observed at scale 10). */
  def dsum2(price: Column, factor: Column): Column =
    round(sum(price.cast(DecimalType(18, 2)) * factor.cast(DecimalType(8, 4))), 4)
      .cast(DoubleType)

  /** Exact sum of price * f1 * f2 (e.g. (1-disc)*(1+tax)). */
  def dsum3(price: Column, f1: Column, f2: Column): Column =
    round(sum(
      price.cast(DecimalType(18, 2)) * f1.cast(DecimalType(8, 4)) *
        f2.cast(DecimalType(8, 4))), 4)
      .cast(DoubleType)

  /** Deterministic average: exact decimal sum cast to double / count. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType) / count(c).cast(LongType)
}
