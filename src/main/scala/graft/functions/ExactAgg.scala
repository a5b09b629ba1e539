package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent (associativity-proof) aggregation helpers.
  *
  * Plain `sum(double)` is not reproducible across partitionings: IEEE-754
  * addition is not associative, so the same query on 32 vs 32,000 partitions
  * yields different last-ulp results. For money-like measures we sum exact
  * fixed-point cents (`floor(x*100 + 0.5)` as BIGINT — half-up rounding, so
  * 19.99 (whose double*100 is 1998.9999…) maps to 1999, not 1998; exact
  * and order-independent as an integer sum), then convert once to double.
  * This makes results bit-identical on any cluster size AND bit-identical to
  * the DuckDB oracle, which evaluates the same scalar expressions.
  *
  * Range: |x| ≤ 1e7 in cents is ~1e9/row; an int64 sum overflows only past
  * ~9e9 rows per group — acceptable for grouped KPIs; switch to
  * `sum(cents.cast("decimal(38,0)"))` for global sums at extreme scale.
  */
object ExactAgg {
  /** Exact integer cents of a double money value (deterministic per row). */
  def cents(c: Column): Column = floor(c * lit(100.0) + lit(0.5)).cast("long")

  /** Exact fixed-point long of a double at `scale` (half-up, per row) —
    * the shared rounding kernel; sums of this are order-independent.
    */
  def scaledLong(c: Column, scale: Long): Column =
    floor(c * lit(scale.toDouble) + lit(0.5)).cast("long")

  /** Order-independent sum of `c` at fixed-point `scale` (e.g. 10000 for a
    * 4-decimal measure), returned as double.
    */
  def scaledSum(c: Column, scale: Long): Column =
    sum(scaledLong(c, scale)).cast("double") / lit(scale.toDouble)

  /** Order-independent sum of a money column, returned as double. */
  def moneySum(c: Column): Column = sum(cents(c)).cast("double") / lit(100.0)

  /** Deterministic mean of a money column (exact sum / count). */
  def moneyAvg(c: Column): Column = moneySum(c) / count(lit(1))
}
