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
  def cents(c: Column): Column = scaledLong(c, 100L)

  /** Exact fixed-point long of a double at `scale` (half-up, per row) —
    * the shared rounding kernel; sums of this are order-independent.
    *
    * Non-finite quarantine (round-9 adversarial sweep): a NaN or ±Inf
    * measure — the failed-sensor / serialization-bug rows a 100 TB feed
    * WILL contain — made the ANSI long cast throw ARITHMETIC_OVERFLOW
    * and killed 28 of the catalog's money queries whole-job. The
    * library contract is the same as r8's zero-vector contract: the
    * kernel QUARANTINES the row to NULL (standard aggregate semantics
    * skip it; the validation split q01/q02 is where such rows get
    * counted), so one bad row can't kill a 6-hour cluster job. The
    * guard is on the SCALED value's long-representability, so an
    * absurd-but-finite 1e300 measure quarantines identically. DuckDB
    * oracle twin: CASE WHEN isfinite(x) THEN floor(x*scale+0.5) END.
    */
  def scaledLong(c: Column, scale: Long): Column = {
    // guard the DOUBLE, then floor: Spark's floor(double) returns BIGINT
    // directly and converts NaN to 0 SILENTLY (NaN money would count as
    // $0.00) and ±Inf to ±Long.MaxValue (whose ANSI sum then overflows) —
    // so a floor-output guard is too late. The between band is false for
    // NaN (NaN compares larger than any value, so `NaN <= hi` is false),
    // ±Inf, NULL, and any finite value too large to scale into a long.
    val scaled = c * lit(scale.toDouble)
    when(scaled.between(lit(-9.2233720368547e18), lit(9.2233720368547e18)),
      floor(scaled + lit(0.5)))
  }

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
