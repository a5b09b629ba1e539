package graft.operators

import graft.functions.ExactAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's core transform job re-expressed declaratively
  * (reference: glue_jobs/transform.py:19-50):
  * derive a date from the event timestamp, join the fact stream to a
  * dimension, compute per-(day, genre) KPIs, and per-group top-k via a
  * `row_number` window.
  *
  * Scale notes (100 TB contract):
  *  - the dimension side is `broadcast()` (bounded domain), so the join is
  *    map-side — no fact shuffle;
  *  - sum/count aggregates combine map-side; the single unavoidable shuffle
  *    is on the (day, genre) grouping key;
  *  - `countDistinct` is planned by Catalyst as a two-phase expand+agg —
  *    exact, and partial-aggregated;
  *  - top-k windows run over the *aggregated* counts (days × genres ≪ fact
  *    rows), never over the raw fact table;
  *  - every window carries a total-order tie-breaker so ranks are stable
  *    under any partitioning (`row_number` over a non-total order is
  *    nondeterministic at scale).
  */
object Kpi {

  /** events ⋈ customer with derived event_date and segment (the
    * streams ⋈ songs analog of transform.py:19-23).
    */
  def enrich(events: DataFrame, customer: DataFrame): DataFrame = {
    val dim = customer.select(col("c_custkey"), col("c_mktsegment").as("segment"))
    events
      .withColumn("event_date", to_date(col("ts")))
      .join(broadcast(dim), events("user_id") === dim("c_custkey"))
      .drop("c_custkey")
  }

  /** Daily per-segment KPIs (transform.py:26-36): distinct users, exact
    * total value, event count, and the derived avg-per-user ratio.
    */
  def dailyKpis(events: DataFrame, customer: DataFrame): DataFrame =
    kpisFromEnriched(enrich(events, customer))

  /** KPI aggregation over an already-enriched frame — lets an orchestrator
    * compute `enrich` once and feed several aggregations off it.
    */
  def kpisFromEnriched(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(col("event_date"), col("segment"))
      .agg(
        countDistinct(col("user_id")).as("unique_users"),
        ExactAgg.moneySum(col("value")).as("total_value"),
        count(lit(1)).as("event_count"))
      .withColumn("avg_value_per_user", col("total_value") / col("unique_users"))

  /** Mergeable daily aggregate — the PARTIAL form of a KPI table: integer
    * cent sums and row counts keyed by (event_date, event_type).
    * Commutative-monoid columns only, which is what makes [[mergeDailyAgg]]
    * exact; measures that aren't monoids under addition (distinct counts,
    * percentiles) need mergeable sketches instead —
    * [[graft.operators.Sketches]] is that path.
    */
  def dailyAggPartial(events: DataFrame): DataFrame =
    events
      .withColumn("event_date", to_date(col("ts")))
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.functions.ExactAgg.cents(col("value"))).as("cents"))

  /** Incremental aggregate maintenance: fold a new delivery into a standing
    * aggregate table WITHOUT rescanning history — re-aggregation of
    * partials, the delta-refresh every production KPI table runs on. The
    * merge is exact because every measure is an integer monoid sum
    * ([[dailyAggPartial]]); `merged == full recompute over base ∪ delta`
    * bit-for-bit, which is precisely what the oracle asserts.
    *
    * The 100 TB shape: the standing aggregate is output-sized (days ×
    * types), the delta aggregates map-side down to the same size before
    * the union, and the merge shuffle moves only those bounded partials —
    * history is never touched. Derived columns (here `total_value`) are
    * computed AFTER the merge, never merged themselves.
    */
  def mergeDailyAgg(baseAgg: DataFrame, deltaEvents: DataFrame): DataFrame =
    // project the monoid columns only, so a prior merge's output (which
    // carries the derived total_value) feeds straight back in as the next
    // delivery's base — fold(fold(base, d1), d2) must just work
    baseAgg.select(col("event_date"), col("event_type"),
        col("n_events"), col("cents"))
      .unionByName(dailyAggPartial(deltaEvents))
      .groupBy(col("event_date"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"), sum(col("cents")).as("cents"))
      .withColumn("total_value", col("cents").cast("double") / lit(100.0))

  /** Generic per-group top-k (transform.py:39-50): count rows per
    * (groupCols ++ rankCol), rank within groupCols by count desc with a
    * total-order tie-break, keep rank <= k.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], rankCol: String, k: Int): DataFrame = {
    val counted = df.groupBy((groupCols :+ rankCol).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("cnt").desc, col(rankCol).asc)
    counted.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Key-value items in the shape the reference loads into DynamoDB
    * (reference: glue_jobs/load_dynamo.py:133-143): string date, composite
    * `hash#range` key, int coercions, and null-key rows skipped.
    */
  def kvItems(topSongs: DataFrame, hashCol: String, rangeCols: (String, String),
              countCol: String): DataFrame = {
    val (r1, r2) = rangeCols
    topSongs
      .filter(col(hashCol).isNotNull && col(r1).isNotNull && col(r2).isNotNull)
      .select(
        col(hashCol).cast("string").as("pk"),
        concat(col(r1), lit("#"), col(r2)).as("sk"),
        col(countCol).cast("long").as("play_count"),
        col("rank").cast("long").as("rank"))
  }

  /** Daily-KPI items for the DailyKpis table (load_dynamo.py:121-131's
    * build_genre_kpi: null-key skip, string date, numeric coercions).
    */
  def kvDailyKpis(kpis: DataFrame): DataFrame =
    kpis
      .filter(col("event_date").isNotNull && col("segment").isNotNull)
      .select(
        col("event_date").cast("string").as("date"),
        col("segment"),
        col("unique_users").cast("long").as("unique_users"),
        col("total_value").cast("double").as("total_value"),
        col("event_count").cast("long").as("event_count"),
        col("avg_value_per_user").cast("double").as("avg_value_per_user"))

  /** Top-segments-per-day items for the TopSegmentsPerDay table
    * (load_dynamo.py:145-153's build_top_genre).
    */
  def kvTopSegments(top: DataFrame): DataFrame =
    top
      .filter(col("event_date").isNotNull && col("segment").isNotNull)
      .select(
        col("event_date").cast("string").as("date"),
        col("segment"),
        col("cnt").cast("long").as("cnt"),
        col("rank").cast("long").as("rank"))
}
