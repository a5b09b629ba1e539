package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation: the sublinear-memory path for
  * metrics whose exact forms don't partial-aggregate cheaply at 100 TB.
  *
  *  - distinct counts: HyperLogLog++ (`approx_count_distinct`) — fixed-size
  *    state per group vs the exact two-phase expand;
  *  - quantiles: KLL/Greenwald-Khanna (`approx_percentile`) — bounded
  *    buffers vs a full sort;
  *  - heavy hitters: count-min-style `approx_top_k` style via frequency
  *    cutoffs on the aggregated counts (exact here, since the aggregation
  *    is already one shuffle).
  *
  * Error bounds are asserted against the exact forms in the spec; sketch
  * VALUES are engine-specific state (not SQL-oracle-comparable by
  * design), so the query catalog gates them through [[summaryContract]]'s
  * boolean error-bound contract instead of raw estimates.
  */
object Sketches {

  /** Per-group sketch summary next to the exact values it approximates. */
  def summary(events: DataFrame, rsd: Double = 0.05,
              percentileAccuracy: Int = 10000): DataFrame =
    events.groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        approx_percentile(col("value"), lit(0.5), lit(percentileAccuracy)).as("approx_p50"),
        percentile(col("value"), lit(0.5)).as("exact_p50"),
        count(lit(1)).as("n_events"))

  /** Boolean-contract readout of [[summary]] (round 5, VERDICT r4 item 8):
    * sketch estimates are engine-specific state, so their VALUES can never
    * hash-match a DuckDB oracle — but their CONTRACTS can. The output
    * carries the exact aggregates plus two booleans — the HLL++ estimate
    * within 3·rsd of the exact distinct, and the approx-percentile inside
    * the exact [p45, p55] envelope (its rank guarantee at accuracy 10⁴ is
    * ±10⁻⁴, orders of magnitude tighter) — and the oracle emits the same
    * exact values with literal TRUEs. A sketch drifting out of contract
    * flips a boolean and fails the hash compare, which upgrades q41 from
    * rows-only to a full oracle row.
    */
  def summaryContract(events: DataFrame, rsd: Double = 0.05,
                      percentileAccuracy: Int = 10000): DataFrame = {
    // finite-support contract for every rank statistic (exact AND
    // sketch): non-finite measures are no measurement — NaN breaks
    // DuckDB's quantile ordering outright and would poison the
    // approx-vs-exact bound columns (adversarial sweep r9)
    val v = when(abs(col("value")) <= lit(Double.MaxValue), col("value"))
    events.groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        approx_percentile(v, lit(0.5), lit(percentileAccuracy))
          .as("approx_p50"),
        percentile(v, lit(0.5)).as("exact_p50"),
        percentile(v, lit(0.45)).as("p45"),
        percentile(v, lit(0.55)).as("p55"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("exact_users"), col("exact_p50"),
        col("n_events"),
        (abs(col("approx_users") - col("exact_users"))
          <= lit(3 * rsd) * col("exact_users")).as("users_in_bound"),
        col("approx_p50").between(col("p45"), col("p55")).as("p50_in_bound"))
  }

  /** Mergeable distinct-user sketches — the non-monoid arm of incremental
    * aggregate maintenance: [[Kpi.mergeDailyAgg]] folds deliveries into
    * counts and sums by re-summation, but a distinct count cannot
    * re-aggregate from per-delivery distinct counts — its SKETCH can. The
    * standing table keeps one Datasketches HLL blob per day; a delivery's
    * partial is the same shape; the merge is `hll_union_agg` — a
    * register-wise max, order- and partitioning-independent — so the
    * merged estimate equals the full-recompute estimate EXACTLY (same
    * registers, not merely within error bounds), which the spec asserts.
    * Estimates stay within the sketch's usual error of the true distinct.
    */
  def dailyUserSketch(events: DataFrame): DataFrame =
    events.withColumn("event_date", to_date(col("ts")))
      .groupBy(col("event_date"))
      .agg(hll_sketch_agg(col("user_id")).as("users_hll"))

  /** Fold a delivery's sketch partials into the standing sketch table;
    * output feeds back in as the next fold's base, like mergeDailyAgg.
    */
  def mergeDailyUserSketch(base: DataFrame, deltaEvents: DataFrame): DataFrame =
    base.select(col("event_date"), col("users_hll"))
      .unionByName(dailyUserSketch(deltaEvents))
      .groupBy(col("event_date"))
      .agg(hll_union_agg(col("users_hll")).as("users_hll"))

  /** Readout: the serving-layer projection of the sketch table. */
  def estimateUsers(sketches: DataFrame): DataFrame =
    sketches.select(col("event_date"),
      hll_sketch_estimate(col("users_hll")).as("approx_users"))

  /** Count-min frequency estimates (`DataFrameStatFunctions.countMinSketch`
    * — a distributed build, only the eps×delta-sized table returns to the
    * driver): point-lookup frequencies in fixed memory, the primitive for
    * frequency capping and hot-key detection when the key domain is too
    * large to aggregate exactly. Guarantees (asserted in the spec):
    * estimate ≥ true count, and ≤ true + eps·N with the given confidence.
    */
  def cmsEstimates(df: DataFrame, column: String, eps: Double,
                   confidence: Double, probes: Seq[Long]): Seq[(Long, Long)] = {
    val cms = df.stat.countMinSketch(col(column), eps, confidence, seed = 42)
    probes.map(p => (p, cms.estimateCount(p)))
  }
}
