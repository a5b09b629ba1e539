package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch operators: sessionization, replay dedup, and
  * latest-partition selection. These are the batch forms of the semantics
  * the reference gets from its orchestration layer
  * (reference: dags/music_etl_pipeline.py:34-56 — idempotent reprocessing —
  * and glue_jobs/load_dynamo.py:27-39 — latest `date=` partition discovery).
  */
object Events {

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. Windows are
    * partitioned by user — the shuffle key — so state per partition is one
    * user's timeline; skew is bounded by the busiest user, not data size.
    * Returns per-user (n_events, n_sessions).
    */
  /** Within-session ordered funnel: sessions where a `to` event follows a
    * `from` event INSIDE the same gap-session (strictly later by event
    * order). One shuffle on user_id feeds the session-id window; the
    * running-min-of-`from` window rides the same partitioning (its keys
    * are a superset), so conversion detection adds sorts but no exchange.
    * Output: one row of session counts — total, with `from`, converted.
    */
  def sessionFunnel(events: DataFrame, gapMinutes: Int,
                    from: String, to: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val sessions = events
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_session")).over(w))
    val wSess = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val flagged = sessions
      .withColumn("from_before",
        min(when(col("event_type") === from, col("us"))).over(wSess))
      .withColumn("is_conv",
        col("event_type") === to && col("from_before").isNotNull)
    flagged.agg(
      // struct, not bare two-column countDistinct: Spark's multi-column
      // count(DISTINCT a, b) SKIPS rows where any column is NULL, so
      // NULL-user sessions vanished from the denominator while both
      // engines (and the two struct-based counts below) keep them —
      // found by the r9 adversarial sweep (200 NULL-user events = 200
      // silently missing sessions)
      countDistinct(struct(col("user_id"), col("sid"))).as("n_sessions"),
      countDistinct(when(col("event_type") === from,
        struct(col("user_id"), col("sid")))).as("n_with_from"),
      countDistinct(when(col("is_conv"),
        struct(col("user_id"), col("sid")))).as("n_converted"))
  }

  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("new_session")).as("n_sessions"))
  }

  /** Replay dedup: exactly-once semantics over an at-least-once feed — keep
    * the lowest event_id per (user_id, ts) key. One shuffle on the dedup key.
    */
  def dedupEvents(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("ts")).orderBy(col("event_id"))
    events.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Rows of the most recent event date — the latest-partition pattern
    * (load_dynamo.py:27-39) without a driver-side listing: a 1-row global
    * max broadcast-joined back to the fact, so partition pruning would apply
    * on a date-partitioned layout.
    */
  def latestDate(events: DataFrame): DataFrame = {
    val dated = events.withColumn("event_date", to_date(col("ts")))
    val maxd = dated.agg(max(col("event_date")).as("max_date"))
    dated.join(broadcast(maxd), col("event_date") === col("max_date")).drop("max_date")
  }

  /** Calendar gap-fill with forward fill — time-series alignment: per
    * event_type, emit one row for EVERY day in that type's [min_day,
    * max_day] span. Missing days get zero counts/sums plus `cents_ffill`,
    * the last observed day's sum carried forward (the
    * last-observation-carried-forward convention every downstream
    * trend/anomaly consumer wants instead of holes). Output:
    * (event_type, day, n_events, cents, cents_ffill).
    *
    * Shape: the daily aggregate is one shuffle; the calendar is generated
    * FROM the per-type span aggregate (aggregate-output-sized — days are
    * never materialized wider than the observed range), and the left join
    * plus the forward-fill window both ride the event_type partitioning.
    * Never a row per (type × global calendar) — sparse types stay sparse.
    */
  def gapFillDaily(events: DataFrame): DataFrame = {
    val daily = events
      .withColumn("day", to_date(col("ts")))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.functions.ExactAgg.cents(col("value"))).as("cents"))
    val calendar = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type").as("cal_type"),
        explode(sequence(col("d0"), col("d1"))).as("cal_day"))
    val w = Window.partitionBy(col("cal_type")).orderBy(col("cal_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-safe on the type key: groupBy keeps a NULL-typed group (like
    // scd2's null-typed runs), and a plain equi-join would silently drop
    // its daily rows back out of the calendar — zeros where data exists
    calendar.join(daily,
        col("cal_type") <=> col("event_type") && col("cal_day") === col("day"),
        "left")
      .withColumn("cents_ffill",
        last(col("cents"), ignoreNulls = true).over(w))
      .select(col("cal_type").as("event_type"), col("cal_day").as("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("cents"), lit(0L)).as("cents"),
        col("cents_ffill"))
  }

  /** Per-user ordered action sequences — the export feed for behavioral
    * sequence models: each user's first `cap` events by (ts, event_id)
    * total order, joined into one `>`-separated string, plus the full
    * timeline length. The cap is applied BEFORE the collect via a
    * row_number on the same user window, so per-group state is bounded by
    * `cap` even for the busiest user — collecting first and slicing after
    * would hold whole timelines in the aggregation buffer. The row_number
    * and the groupBy share the user_id partitioning: corpus rows shuffle
    * once. Output: (user_id, n_events, seq_str).
    */
  def userSequences(events: DataFrame, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .withColumn("rn", row_number().over(w))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(when(col("rn") <= cap,
              struct(col("rn"), col("event_type"))))),
            x => x("event_type")), ">").as("seq_str"))
  }

  /** Event-type transition matrix — the Markov-chain feed for
    * next-action models and funnel diagnostics: count consecutive
    * (from_type → to_type) pairs within each user's timeline, with the
    * per-from transition probability as an exact ratio of BIGINT counts.
    * Output: (from_type, to_type, n, p).
    *
    * One shuffle on user_id orders each timeline; the lag pair emission is
    * a window over that partitioning; the (from, to) count is a map-side-
    * combining aggregate over a bounded key domain (|types|²); and the
    * per-from total rides a second aggregate over the ALREADY bounded
    * frame — corpus-sized rows shuffle exactly once.
    */
  def typeTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val pairs = events
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("n_from")).as("p"))
  }

  /** SCD2 history build: collapse each user's `event_type` timeline into
    * type-2 slowly-changing-dimension rows — consecutive equal values merge
    * into one validity interval, a change closes the prior interval and
    * opens the next, the latest interval stays open (`valid_to_us` null,
    * `is_current`). The standard warehouse dimension-history construction,
    * derived from the raw change log. Output: (user_id, run_id, event_type,
    * valid_from_us, valid_to_us, n_events, is_current).
    *
    * One shuffle on user_id feeds every step: the change-detection lag and
    * the running run-id share one window sort; the per-run groupBy's keys
    * (user_id, run_id) are a superset of the partitioning key, so it
    * aggregates without a new exchange; and the closing `lead` rides the
    * user_id partitioning again. Skew bound = the busiest key's timeline,
    * the inherent floor for any ordered-history build.
    */
  def scd2(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val runs = events
      // null-safe change test (<=>): a null-typed event opens its own run
      // instead of being silently absorbed into the previous one — the
      // IS DISTINCT FROM semantics the oracle uses; a plain =!= evaluates
      // to null against a null side and would fall through to "no change"
      .withColumn("chg",
        when(!(lag(col("event_type"), 1).over(w) <=> col("event_type")), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(w))
      .groupBy(col("user_id"), col("run_id"))
      .agg(min(col("event_type")).as("event_type"), // constant within a run
        min(col("ts_us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    runs
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wRun))
      .withColumn("is_current", col("valid_to_us").isNull)
  }

  /** Last-touch attribution: each `conv` event (purchase) is credited to
    * the user's most recent PRECEDING non-`conv` event — the touch — if it
    * happened within `lookbackDays`; otherwise the conversion is
    * `unattributed`. Conversions never attribute to other conversions, and
    * the lookback window makes stale touches lapse — the two rules that
    * separate attribution from a plain lag.
    *
    * One shuffle on user_id; both carry-forward windows
    * (`last(..., ignoreNulls)` over UNBOUNDED PRECEDING..1 PRECEDING)
    * ride that partitioning with one sort. The conversion filter runs
    * AFTER the windows by necessity (touches live on non-conversion rows),
    * but the post-window frame narrows to conversions before the final
    * aggregate, whose key space is the bounded touch-type set. Revenue is
    * half-up integer cents so the sums are exact on any partitioning.
    * Skew bound = busiest user's timeline, inherent to ordered history.
    */
  def lastTouchAttribution(events: DataFrame, lookbackDays: Int,
                           conv: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lookbackUs = lookbackDays.toLong * 86400L * 1000000L
    val touch = when(col("event_type") =!= conv, col("event_type"))
    events
      .withColumn("lt_type", last(touch, ignoreNulls = true).over(w))
      .withColumn("lt_us",
        last(when(col("event_type") =!= conv, col("ts_us")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === conv)
      .withColumn("channel",
        coalesce(when(col("ts_us") - col("lt_us") <= lookbackUs,
          col("lt_type")), lit("unattributed")))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(graft.functions.ExactAgg.cents(col("value"))).as("cents"))
  }

  /** Multi-touch LINEAR attribution: each conversion's cents split
    * EQUALLY across its preceding touches within `lookbackUs`, rolled up
    * per touch type — [[lastTouchAttribution]]'s equal-credit
    * counterpart. Credits are exact integer micro-cents: the per-touch
    * base is `(cents·10⁶) div n` and the `(cents·10⁶) % n` remainder
    * cells go to the MOST RECENT touches (largest-remainder per
    * conversion, q114's apportionment pattern per key), so each
    * conversion's credits sum exactly to its cents — no double division
    * anywhere.
    *
    * Shape: one user shuffle carries the nearest-FOLLOWING-conversion
    * carry window (the last-touch machinery run on the descending
    * order); the split windows ride a (user, conversion) partitioning
    * bounded by the per-conversion touch count. Conversions with no
    * in-window touches simply credit nothing (they are visible in
    * [[lastTouchAttribution]]'s `unattributed` row instead).
    */
  /** (touch, crediting conversion) pairs shared by the multi-touch
    * attribution family: each non-conversion event paired with the NEXT
    * conversion of the same user within the lookback.
    */
  private[graft] def touchFrame(events: DataFrame, lookbackUs: Long,
                                conv: String): DataFrame = {
    val wDesc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us"),
        when(col("event_type") === conv,
          graft.functions.ExactAgg.cents(col("value"))).as("p_cents"))
      .withColumn("np", last(when(col("event_type") === conv,
        struct(col("ts_us").as("p_us"), col("event_id").as("p_id"),
          col("p_cents").as("cents"))), ignoreNulls = true).over(wDesc))
      .filter(col("event_type") =!= conv && col("np").isNotNull &&
        col("np.p_us") - col("ts_us") <= lookbackUs &&
        col("np.cents").isNotNull)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us"), col("np.p_id").as("p_id"),
        col("np.p_us").as("p_us"), col("np.cents").as("cents"))
  }

  def linearAttribution(events: DataFrame, lookbackUs: Long,
                        conv: String): DataFrame = {
    val touches = touchFrame(events, lookbackUs, conv)
    touches
      .withColumn("n", count(lit(1))
        .over(Window.partitionBy(col("user_id"), col("p_id"))))
      .withColumn("rk", row_number()
        .over(Window.partitionBy(col("user_id"), col("p_id"))
          .orderBy(col("ts_us").desc, col("event_id").desc)).cast("long"))
      .withColumn("credit_micro", expr(
        "(cents * 1000000) div n + CASE WHEN rk <= (cents * 1000000) % n THEN 1 ELSE 0 END"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_micro")).as("credit_micro"))
  }

  /** U-shaped (position-based 40/20/40) attribution — the fourth member
    * of the family after last-touch, first-touch, and linear: the first
    * and last touches before each conversion take 40% each, the middle
    * touches split the remaining 20% equally. Exact integer micros with
    * deterministic remainder placement: a single touch takes everything,
    * two touches split half-and-half (remainder to the first), and with
    * n ≥ 3 the ends take (4·total) div 10 each while the middle pool
    * (total − 2·ends — the div remainders fold into the pool, so per-
    * conversion conservation is exact by construction) distributes div
    * (n−2) with the remainder to the EARLIEST middles, SIGN-AWARE: a
    * negative conversion total (refund) hands each of the |pool % (n−2)|
    * earliest middles a −1 instead of a +1, because SQL `%` follows the
    * dividend's sign — so Σcredit = total_micro holds for refunds too,
    * not just purchases. Same touch frame and window shapes as
    * [[linearAttribution]].
    */
  def uShapedAttribution(events: DataFrame, lookbackUs: Long,
                         conv: String): DataFrame = {
    val touches = touchFrame(events, lookbackUs, conv)
    touches
      .withColumn("n", count(lit(1))
        .over(Window.partitionBy(col("user_id"), col("p_id"))))
      .withColumn("rk", row_number()
        .over(Window.partitionBy(col("user_id"), col("p_id"))
          .orderBy(col("ts_us").asc, col("event_id").asc)).cast("long"))
      .withColumn("total_micro", col("cents") * lit(1000000L))
      .withColumn("credit_micro", expr(
        """CASE
          |  WHEN n = 1 THEN total_micro
          |  WHEN n = 2 THEN CASE WHEN rk = 1
          |    THEN total_micro - total_micro div 2
          |    ELSE total_micro div 2 END
          |  WHEN rk = 1 OR rk = n THEN (4 * total_micro) div 10
          |  ELSE (total_micro - 2 * ((4 * total_micro) div 10)) div (n - 2)
          |    + CASE WHEN rk - 1 <=
          |        abs((total_micro - 2 * ((4 * total_micro) div 10)) % (n - 2))
          |      THEN CASE WHEN total_micro >= 0 THEN 1 ELSE -1 END
          |      ELSE 0 END
          |END""".stripMargin))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_micro")).as("credit_micro"))
  }
}
