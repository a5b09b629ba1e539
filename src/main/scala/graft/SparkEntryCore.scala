package graft

import graft.functions.ExactAgg
import graft.operators._
import graft.sources.CsvSource
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import SparkEntryShared._

/** ingestion, validation, KPI, KV-shaping, sessionization/streaming-batch-twin, and multimodal-plumbing queries (SURVEY §2.1–§2.5, §2.10) — one `queries` entry per SURVEY §2 item, with its
  * DuckDB oracle twin in `oracleSql`. Moved verbatim from the
  * single-file SparkEntry in round 6; SparkEntry concatenates
  * the per-family maps, so names/plans/oracles are unchanged.
  */
private[graft] object SparkEntryCore {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.1/§2.2 — validation split (reference glue_jobs/validate.py:34-47)
    "q01_validate_good" -> ((s, dir) =>
      Validation.splitGoodBad(corruptedEvents(s, dir),
        Seq("user_id", "event_type", "ts_us", "value"), "events")._1),

    "q02_validate_bad" -> ((s, dir) =>
      Validation.splitGoodBad(corruptedEvents(s, dir),
        Seq("user_id", "event_type", "ts_us", "value"), "events")._2),

    // §2.3 — the reference's core transform (glue_jobs/transform.py:26-36)
    "q03_daily_kpis" -> ((s, dir) => qDailyKpis(s, dir)),

    // top-k per group (transform.py:39-50)
    "q04_top3_types_per_seg_day" -> ((s, dir) => top3Types(s, dir)),

    "q05_top5_segments_per_day" -> ((s, dir) =>
      Kpi.topKPerGroup(enriched(s, dir), Seq("event_date"), "segment", 5)
        .withColumn("rank", col("rank").cast("long"))),

    // §2.4 — KV item shaping (glue_jobs/load_dynamo.py:133-143)
    "q06_kv_items" -> ((s, dir) =>
      Kpi.kvItems(top3Types(s, dir), "event_date", ("segment", "event_type"), "cnt")),

    // §2.5 — sessionization / dedup / latest-partition
    "q11_sessionize" -> ((s, dir) => Events.sessionize(events(s, dir), 30)),

    "q12_dedup_events" -> ((s, dir) =>
      Events.dedupEvents(events(s, dir))
        .select(col("event_id"), col("ts_us"), col("user_id"), col("event_type"),
          col("value"), col("props"))),

    "q13_latest_partition" -> ((s, dir) =>
      Events.latestDate(events(s, dir))
        .groupBy(col("event_date"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          ExactAgg.moneySum(col("value")).as("total_value"))),

    // §2.10 — multimodal binary plumbing
    "q25_binary_meta" -> ((s, dir) =>
      Multimodal.withBinaryMeta(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
          col("content_id"))),

    // §2.5 — gap sessionization via Spark's native session_window (the
    // same operator drives the streaming pipeline; batch mode here)
    "q28_session_window" -> ((s, dir) =>
      events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          ExactAgg.moneySum(col("value")).as("total_value"))
        .select(
          unix_micros(col("session_window.start")).as("session_start_us"),
          unix_micros(col("session_window.end")).as("session_end_us"),
          col("user_id"), col("n_events"), col("total_value"))),

    // §2.2 — one-pass multi-constraint quality report
    "q33_quality_report" -> ((s, dir) =>
      Quality.report(events(s, dir), "event_id",
        Seq("user_id", "event_type", "value", "props"), "value")),

    // §2.5/§2.6 — keyed range join: assign events to their session interval
    "q43_range_join_sessions" -> ((s, dir) => {
      val ev = events(s, dir)
      val sessions = ev
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("sess_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"))
      RangeJoin.keyedPointInInterval(
          ev.select(col("user_id"), col("ts_us")), sessions,
          "user_id", "ts_us", "start_us", "end_us")
        .groupBy(col("user_id"), col("start_us").as("session_start_us"))
        .agg(count(lit(1)).as("n_events"))
    }),

    // §2.1/§2.2 — CSV dirty-data path: PERMISSIVE parse, corrupt rows
    // split off, good rows compared against DuckDB read_csv(ignore_errors).
    // The input is a static, committed dirty CSV (type errors, arity
    // errors, quoted delimiters, null fields) in testdata-ext/.
    "q50_csv_dirty_split" -> ((s, _) =>
      CsvSource.readSplit(s, DirtyCsvPath,
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"))._1),

    // §2.1 — JSONL ingest (schema-first, PERMISSIVE corrupt-line split)
    // over a static committed file with nulls/unicode/nested-struct/broken
    // lines; oracled against DuckDB read_json(ignore_errors)
    "q58_jsonl_read" -> ((s, _) => {
      val (good, _) = graft.sources.JsonSource.readSplit(s, JsonlPath,
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, lang STRING, text STRING, " +
            "meta STRUCT<source: STRING, quality: DOUBLE>"))
      good.select(col("doc_id"), col("lang"), col("text"),
        col("meta.source").as("source"), col("meta.quality").as("quality"))
    }),

    // §2.5 — rate-limit dedup: first event per (user, type) per 10-minute
    // tumbling window; one shuffle, WindowGroupLimit cuts map-side
    "q68_event_rate_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // integer `div`, not `/`: double division of epoch-µs longs rounds
      val win = expr("ts_us div 600000000")
      events(s, dir)
        .withColumn("w", win)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"), col("event_type"), col("w"))
            .orderBy(col("ts_us"), col("event_id"))))
        .filter(col("rn") === 1)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_us"))
    }),

    // §2.1 — semi-structured extraction: typed from_json over the props
    // JSON column, then bucketed aggregation on the extracted field
    "q79_props_extract" -> ((s, dir) =>
      events(s, dir)
        .select(from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k"),
          col("value"))
        .groupBy(expr("k div 10").as("k_bucket"))
        .agg(count(lit(1)).as("n_events"),
          ExactAgg.moneySum(col("value")).as("total_value"))),

    // §2.5 — within-session ordered funnel: purchase counts only when a
    // click precedes it INSIDE the same 30-minute gap-session
    "q84_session_funnel" -> ((s, dir) =>
      Events.sessionFunnel(events(s, dir), 30, "click", "purchase")),

    // §2.2 — ingest volume anomaly detection: days whose event count
    // deviates more than 5% from the previous day (the pipeline guard
    // that catches a half-delivered feed before it poisons downstream);
    // the window runs over the tiny per-day aggregate
    "q85_volume_anomaly" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n_events"))
      daily
        .withColumn("prev_n",
          lag(col("n_events"), 1).over(Window.orderBy(col("d"))))
        .filter(col("prev_n").isNotNull)
        .withColumn("ratio",
          col("n_events").cast("double") / col("prev_n").cast("double"))
        .filter(col("ratio") > 1.05 || col("ratio") < 0.95)
        .select(col("d"), col("n_events"), col("prev_n"), col("ratio"))
    }),

    // §2.2 — snapshot diff (CDC-style reconciliation): full outer on the
    // key, rows classified added/removed/changed by null-sides and value
    // inequality — the validation primitive for a migration cutover
    "q86_snapshot_diff" -> ((s, dir) => {
      val before = events(s, dir)
        .select(col("event_id").as("k"), col("value").as("v"))
      val after = corruptedEvents(s, dir)
        .filter(col("event_id") % 101 =!= 0) // drop some rows
        .select(col("event_id").as("k"), col("value").as("v"))
      before.as("b").join(after.as("a"), col("b.k") === col("a.k"),
          "full_outer")
        .select(
          when(col("b.k").isNull, "added")
            .when(col("a.k").isNull, "removed")
            .when(col("b.v") =!= col("a.v") ||
              (col("b.v").isNull =!= col("a.v").isNull), "changed")
            .otherwise("same").as("diff_kind"))
        .groupBy(col("diff_kind"))
        .agg(count(lit(1)).as("n_rows"))
    }),

    // §2.2 — incremental aggregate maintenance: the standing KPI table
    // (events with event_id % 10 != 0, pre-aggregated) merged with a new
    // delivery (the rest) by partial re-aggregation; the oracle asserts
    // merged == full recompute, bit for bit
    "q103_incremental_agg" -> ((s, dir) => {
      val ev = events(s, dir)
      Kpi.mergeDailyAgg(
        Kpi.dailyAggPartial(ev.filter(expr("event_id % 10 <> 0"))),
        ev.filter(expr("event_id % 10 = 0")))
    }),

    // §2.2 — CDC round trip: rebuild the after-snapshot by applying the
    // row-level changelog to the before-snapshot. The oracle is the
    // after-snapshot itself — the identity apply(before,
    // changelog(before, after)) == after is the operator contract, so
    // ANY defect in either primitive breaks the hash, on every key
    "q120_changelog_apply" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // Cdc snapshots REQUIRE unique keys (a duplicated PK multiplies the
      // full-outer diff join — found by the r9 adversarial sweep's
      // duplicate event_ids). A hostile at-least-once feed is
      // canonicalized FIRST-WRITE-WINS before diffing: row_number over
      // (key, ts) keeps the earliest row per key, deterministic on both
      // engines because ts differs within every duplicated key.
      def firstWrite(df: DataFrame): DataFrame =
        df.withColumn("rn", row_number().over(
            Window.partitionBy(col("k")).orderBy(col("ts_us"))))
          .filter(col("rn") === 1).select(col("k"), col("v"))
      val before = firstWrite(events(s, dir)
        .select(col("event_id").as("k"), col("value").as("v"), col("ts_us")))
      val after = firstWrite(corruptedEvents(s, dir)
        .filter(col("event_id") % 101 =!= 0)
        .select(col("event_id").as("k"), col("value").as("v"), col("ts_us")))
      Cdc.applyChangelog(before, Cdc.changelog(before, after))
    }),

    // §2.2 — order-insensitive table checksum: per-row polynomial hash
    // over canonical column encodings (mod 1e9+7 at every step, so no
    // intermediate exceeds ~1.3e11 — ANSI-safe in both engines), folded
    // by bit_xor, which is commutative/associative/overflow-free — the
    // same number on ANY partitioning, task order, or engine. The
    // replication-audit primitive: two sides compare one row per flag
    // instead of shipping snapshots. Scan-bound, zero joins, one
    // 3-row aggregate
    "q121_table_checksum" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .withColumn("h", expr(ChecksumExpr))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("xor_sum"))),

    // §2.5 — sessionized bounce rate: share of single-event sessions per
    // day. Session ids are the running sum of gap-break flags (the same
    // 30-min rule as q11), the per-session rollup keys on (user, session)
    // — a user_id-prefixed key, so AQE plans it off the window's
    // partitioning — and the daily rate is an exact integer micro-ratio.
    // Sessions are dated by their FIRST event (a session spanning
    // midnight counts once, on its start day)
    "q127_bounce_rate" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      events(s, dir)
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("brk",
          when(col("prev_us").isNull ||
            col("ts_us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).cast("date").as("session_date"))
        .groupBy(col("session_date"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
        .withColumn("bounce_micro",
          expr("(n_bounces * 1000000L) div n_sessions"))
    }),

    // §2.5 — hopping (sliding) window aggregates in BATCH: 30-min windows
    // every 10 min via the native `window()` generator — each event
    // explodes to exactly size/slide = 3 epoch-aligned windows map-side,
    // then ONE groupBy on window start; the same operator Structured
    // Streaming uses, so batch and stream windows agree by construction.
    // The oracle rebuilds the explode with integer arithmetic
    // (ws = us - us % slide - k·slide), checking Spark's alignment rule
    // rather than restating its implementation
    "q128_hopping_windows" -> ((s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "30 minutes", "10 minutes"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .select(unix_micros(col("window.start")).as("ws_us"),
          col("n_events"), col("n_users"))),

    // §2.2 — one-pass column profile: per-column row/null/distinct counts
    // and string-cast bounds for a mixed-type column set; the exact
    // countDistincts share one Expand (k× map rows, never k scans) and
    // the wide→long melt is a zero-shuffle stack on the 1-row aggregate
    "q129_column_profile" -> ((s, dir) =>
      Quality.profile(
        t(s, dir, "orders").withColumn("o_orderdate",
          col("o_orderdate").cast("date")),
        Seq("o_custkey", "o_orderstatus", "o_orderdate"))),

    // §2.1 — schema-drift union: merge deliveries whose schemas evolved
    // (a column added mid-stream) by NAME, missing columns null-filled —
    // unionByName(allowMissingColumns), the ingestion-compat primitive a
    // positional UNION silently corrupts. Zero shuffles: a union is a
    // partition concat
    "q131_union_drift" -> ((s, dir) => {
      val e = events(s, dir)
      val oldFeed = e.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("user_id"), col("value"))
      val newFeed = e.filter(col("event_id") % 2 === 1)
        .select(col("event_id"), col("user_id"), col("value"),
          col("event_type"))
      oldFeed.unionByName(newFeed, allowMissingColumns = true)
    }),

    // §2.2 — declarative constraint suite over the corrupted feed: named
    // row predicates evaluated in ONE scan, one report row each; a
    // predicate that is FALSE OR NULL counts as a violation (the
    // three-valued-logic trap that lets `value >= 0` "pass" on nulls —
    // the oracle mirrors the same rule with explicit IS-TRUE arithmetic)
    "q133_constraint_suite" -> ((s, dir) =>
      Quality.constraints(corruptedEvents(s, dir), Seq(
        "user_id_not_null" -> col("user_id").isNotNull,
        "value_non_negative" -> (col("value") >= 0),
        "event_type_known" -> col("event_type").isin(
          "click", "view", "purchase", "signup", "error"),
        "ts_in_range" -> (col("ts_us") >= 1577836800000000L &&
          col("ts_us") < 1893456000000000L)))),

    // §2.5 — session concurrency curve: active sessions per hour — the
    // capacity-planning load profile. Sessions come from the q11/q127 gap
    // rule; each explodes to the hours it touches (bounded by the session
    // span, which the 30-min gap rule keeps to the user's active
    // stretch), and ONE groupBy on the hour ordinal counts overlaps.
    // Equal hour grain on both engines: integer div of epoch-µs
    "q134_concurrency_curve" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      events(s, dir)
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("brk",
          when(col("prev_us").isNull ||
            col("ts_us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(expr("min(ts_us) div 3600000000").as("sh"),
          expr("max(ts_us) div 3600000000").as("eh"))
        .select(explode(expr("sequence(sh, eh)")).as("hour_ord"))
        .groupBy(col("hour_ord"))
        .agg(count(lit(1)).as("n_active"))
    }),

    // §2.2 — feed freshness report: per event type, last-event recency
    // against the globally freshest feed in whole hours — the staleness
    // monitor that catches a dead producer. Type-grain aggregate plus a
    // 1-row global max broadcast back (the documented 1-row combine)
    "q139_freshness" -> ((s, dir) => {
      val perType = events(s, dir)
        .groupBy(col("event_type"))
        .agg(max(col("ts_us")).as("last_us"))
      perType
        .crossJoin(perType.groupBy().agg(max(col("last_us")).as("global_us")))
        .select(col("event_type"), col("last_us"),
          expr("(global_us - last_us) div 3600000000").as("stale_hours"))
    }),

    // §2.2 — CUSUM change-point on the daily event volume: the max
    // |N·S_i − i·S_N| deviation of the cumulative count from the uniform
    // trend, all in exact BIGINT (no means, no doubles). Tiny daily frame
    // (bounded by #days) + 1-row totals broadcast
    "q143_cusum_changepoint" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("d"))
      val scored = daily
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("s_i",
          sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      val tot = scored.groupBy()
        .agg(max(col("i")).as("n_days"), sum(col("n")).as("total"))
      scored.crossJoin(tot)
        .select(col("d").as("cp_date"), col("i").as("cp_index"),
          col("n_days"), col("s_i").as("cum_before"), col("total"),
          abs(col("n_days") * col("s_i") - col("i") * col("total"))
            .as("stat_max"))
        .orderBy(col("stat_max").desc, col("cp_date").asc)
        .limit(1)
    }),

    // §2.5/§2.9 — top-20 within-session event-type trigram paths (the
    // next-action / sequence-model feed): q11's 30-min gap rule, then
    // lead() twice over the SAME user window (one sort) with session-id
    // equality guards so paths never span a session break; trigram
    // aggregate collapses map-side
    "q155_session_paths" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        // NULL-typed events stay in the sequence as an explicit
        // 'unknown' step: concat_ws SKIPS nulls (a silent 2-step path
        // counted as a trigram) while SQL '||' null-propagates — the
        // engines can only agree on a named token (adversarial r9)
        .withColumn("event_type", coalesce(col("event_type"), lit("unknown")))
        .withColumn("prev", lag(col("ts_us"), 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull ||
            col("ts_us") - col("prev") > 1800000000L, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(run))
        .withColumn("t2", lead(col("event_type"), 1).over(w))
        .withColumn("t3", lead(col("event_type"), 2).over(w))
        .withColumn("s2", lead(col("sid"), 1).over(w))
        .withColumn("s3", lead(col("sid"), 2).over(w))
        .filter(col("s3") === col("sid") && col("s2") === col("sid"))
        .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
          .as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path").asc)
        .limit(20)
    }),

    // §2.2 — per-source column fill-rate scorecard (round 5: the
    // data-vendor completeness report — for every (source, column), the
    // row count, nulls, EMPTY values (blank-trimmed strings / non-positive
    // numerics: present but useless, the gap null counting misses), and
    // the exact fill permille. One conditional-aggregate shuffle on the
    // bounded source key; the wide→long melt is a zero-shuffle stack over
    // the per-source aggregate row
    "q228_fill_rates" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("nu_text"),
          sum(when(col("text").isNotNull &&
            length(trim(col("text"))) === 0, 1L).otherwise(0L)).as("em_text"),
          sum(when(col("lang").isNull, 1L).otherwise(0L)).as("nu_lang"),
          sum(when(col("lang").isNotNull &&
            length(trim(col("lang"))) === 0, 1L).otherwise(0L)).as("em_lang"),
          sum(when(col("n_chars").isNull, 1L).otherwise(0L)).as("nu_nc"),
          sum(when(col("n_chars").isNotNull && col("n_chars") <= 0, 1L)
            .otherwise(0L)).as("em_nc"))
        .select(col("source"), col("n_rows"),
          expr("stack(3, 'text', nu_text, em_text, 'lang', nu_lang, em_lang," +
            " 'n_chars', nu_nc, em_nc) AS (col_name, n_null, n_empty)"))
        .withColumn("fill_permille",
          expr("(1000 * (n_rows - n_null - n_empty)) div n_rows"))
    }),

    // §2.2 — functional-dependency audit (round 5): does column A
    // determine column B? One report row per candidate FD with the
    // lhs-group count and how many groups witness ≥2 distinct rhs values
    // — the normalization/data-contract check that q133's row predicates
    // and q175's cross-table FK audit cannot express (it quantifies over
    // GROUPS). Each FD is one map-side-combining (lhs → distinct-rhs)
    // aggregate; the union output is bounded by the FD list
    "q196_fd_audit" -> ((s, dir) => {
      def fd(df: DataFrame, rel: String, lhs: String, rhs: String) =
        df.groupBy(col(lhs))
          .agg(countDistinct(col(rhs)).as("n_rhs"))
          .agg(count(lit(1)).as("n_groups"),
            count(when(col("n_rhs") > 1, 1)).as("n_violating"))
          .select(lit(rel).as("relation"), lit(lhs).as("lhs"),
            lit(rhs).as("rhs"), col("n_groups"), col("n_violating"))
      fd(t(s, dir, "part"), "part", "p_name", "p_brand")
        .unionByName(fd(t(s, dir, "part"), "part", "p_brand", "p_type"))
        .unionByName(fd(t(s, dir, "orders"), "orders", "o_orderkey", "o_custkey"))
        .unionByName(fd(t(s, dir, "orders"), "orders", "o_custkey", "o_orderpriority"))
        .unionByName(fd(t(s, dir, "customer"), "customer", "c_custkey", "c_mktsegment"))
        .unionByName(fd(t(s, dir, "events"), "events", "user_id", "event_type"))
    }),

    // §2.2 — referential-integrity audit (round 4): one report row per
    // FK relation with row/null-FK/orphan counts — the cross-TABLE
    // complement of q133's row-predicate constraints. Each relation is
    // an independent aggregate + anti-join pair fused into one DAG;
    // no collects, dims broadcast
    "q175_fk_audit" -> ((s, dir) => {
      def rel(name: String, child: DataFrame, fk: String, parent: DataFrame,
              pk: String): DataFrame = {
        val keys = parent.select(col(pk)).filter(col(pk).isNotNull).distinct()
        val nonNull = child.filter(col(fk).isNotNull)
        val orphans = nonNull.join(keys, nonNull(fk) === keys(pk), "left_anti")
        child.agg(count(lit(1)).as("n_rows"),
            count(when(col(fk).isNull, 1)).as("n_null_fk"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_orphan")))
          .select(lit(name).as("relation"), col("n_rows"),
            col("n_null_fk"), col("n_orphan"))
      }
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      Seq(
        rel("lineitem.l_orderkey->orders", li, "l_orderkey",
          ord, "o_orderkey"),
        rel("lineitem.l_partkey->part", li, "l_partkey",
          t(s, dir, "part"), "p_partkey"),
        rel("lineitem.l_suppkey->supplier", li, "l_suppkey",
          t(s, dir, "supplier"), "s_suppkey"),
        rel("orders.o_custkey->customer", ord, "o_custkey",
          t(s, dir, "customer"), "c_custkey"),
        rel("customer.c_nationkey->nation", t(s, dir, "customer"),
          "c_nationkey", t(s, dir, "nation"), "n_nationkey"),
        rel("supplier.s_nationkey->nation", t(s, dir, "supplier"),
          "s_nationkey", t(s, dir, "nation"), "n_nationkey"),
        rel("nation.n_regionkey->region", t(s, dir, "nation"),
          "n_regionkey", t(s, dir, "region"), "r_regionkey"),
        rel("events.user_id->customer", events(s, dir), "user_id",
          t(s, dir, "customer"), "c_custkey")
      ).reduce(_.unionByName(_))
    }),

    // §2.2 — order-total consistency audit (round 4): does o_totalprice
    // equal the sum of its lines' extendedprice·(1−disc)·(1+tax)? A
    // cross-FIELD reconciliation (vs q175's cross-table keys): exact
    // integer micros on both sides of the delta, one orderkey join of
    // the line aggregate, status-grain report
    "q177_totalprice_audit" -> ((s, dir) => {
      val lineSum = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(ExactAgg.scaledLong(
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")), 10000)).as("lines_micro"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          ExactAgg.scaledLong(col("o_totalprice"), 10000).as("total_micro"))
        .join(lineSum, col("o_orderkey") === col("l_orderkey"), "left")
        .na.fill(0L, Seq("lines_micro"))
        .withColumn("delta", col("lines_micro") - col("total_micro"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          count(when(col("delta") =!= 0L, 1)).as("n_mismatch"),
          max(abs(col("delta"))).as("max_abs_delta"),
          sum(abs(col("delta"))).as("sum_abs_delta"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q01_validate_good" ->
      s"""$CorruptedCte
         |SELECT * FROM corrupted
         |WHERE user_id IS NOT NULL AND event_type IS NOT NULL
         |  AND ts_us IS NOT NULL AND value IS NOT NULL""".stripMargin,

    "q02_validate_bad" ->
      s"""$CorruptedCte
         |SELECT * FROM corrupted
         |WHERE user_id IS NULL OR event_type IS NULL
         |   OR ts_us IS NULL OR value IS NULL""".stripMargin,

    "q03_daily_kpis" ->
      s"""SELECT CAST(ts AS DATE) AS event_date, c_mktsegment AS segment,
         |       count(DISTINCT user_id) AS unique_users,
         |       $SumCents AS total_value,
         |       count(*) AS event_count,
         |       ($SumCents) / count(DISTINCT user_id) AS avg_value_per_user
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY 1, 2""".stripMargin,

    "q04_top3_types_per_seg_day" ->
      s"""$EnrichedCte,
         |c AS (SELECT event_date, segment, event_type, count(*) AS cnt
         |      FROM e GROUP BY 1, 2, 3)
         |SELECT * FROM (
         |  SELECT event_date, segment, event_type, cnt,
         |         CAST(row_number() OVER (PARTITION BY event_date, segment
         |                                 ORDER BY cnt DESC, event_type ASC) AS BIGINT) AS "rank"
         |  FROM c) WHERE "rank" <= 3""".stripMargin,

    "q05_top5_segments_per_day" ->
      s"""$EnrichedCte,
         |c AS (SELECT event_date, segment, count(*) AS cnt FROM e GROUP BY 1, 2)
         |SELECT * FROM (
         |  SELECT event_date, segment, cnt,
         |         CAST(row_number() OVER (PARTITION BY event_date
         |                                 ORDER BY cnt DESC, segment ASC) AS BIGINT) AS "rank"
         |  FROM c) WHERE "rank" <= 5""".stripMargin,

    "q06_kv_items" ->
      s"""$EnrichedCte,
         |c AS (SELECT event_date, segment, event_type, count(*) AS cnt
         |      FROM e GROUP BY 1, 2, 3),
         |r AS (SELECT event_date, segment, event_type, cnt,
         |             CAST(row_number() OVER (PARTITION BY event_date, segment
         |                                     ORDER BY cnt DESC, event_type ASC) AS BIGINT) AS "rank"
         |      FROM c)
         |SELECT CAST(event_date AS VARCHAR) AS pk,
         |       segment || '#' || event_type AS sk,
         |       cnt AS play_count, "rank"
         |FROM r WHERE "rank" <= 3""".stripMargin,

    "q11_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                 ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |       CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM x GROUP BY 1""".stripMargin,

    "q12_dedup_events" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |                                   ORDER BY event_id) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin,

    "q13_latest_partition" ->
      s"""SELECT CAST(ts AS DATE) AS event_date, event_type,
         |       count(*) AS n_events, $SumCents AS total_value
         |FROM events
         |WHERE CAST(ts AS DATE) = (SELECT max(CAST(ts AS DATE)) FROM events)
         |GROUP BY 1, 2""".stripMargin,

    "q25_binary_meta" ->
      """SELECT doc_id,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |       sha256(text) AS content_id
        |FROM documents""".stripMargin,

    // gap-merge sessions: cumulative new-session flags form session ids;
    // session_window's end = last event + gap
    "q28_session_window" ->
      """WITH x AS (
        |  SELECT user_id, value, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                 ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events),
        |y AS (SELECT user_id, value, us,
        |             -- session_window is [start, last+gap): a gap of exactly
        |             -- the threshold does NOT merge, hence >=
        |             CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
        |                  THEN 1 ELSE 0 END AS new_s
        |      FROM x),
        |z AS (SELECT user_id, value, us,
        |             sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |                              ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM y)
        |SELECT min(us) AS session_start_us,
        |       max(us) + 1800000000 AS session_end_us,
        |       user_id, count(*) AS n_events,
        |       CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
        |FROM z GROUP BY user_id, sid""".stripMargin,

    "q33_quality_report" ->
      """SELECT count(*) AS n_rows,
        |       count(DISTINCT event_id) AS n_distinct_keys,
        |       count(*) = count(DISTINCT event_id) AS key_is_unique,
        |       min(value) AS min_value, max(value) AS max_value,
        |       CAST(sum(CASE WHEN user_id    IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS null_ratio_user_id,
        |       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS null_ratio_event_type,
        |       CAST(sum(CASE WHEN value      IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS null_ratio_value,
        |       CAST(sum(CASE WHEN props      IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS null_ratio_props
        |FROM events""".stripMargin,

    "q43_range_join_sessions" ->
      """WITH x AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                 ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events),
        |y AS (SELECT user_id, us,
        |             CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
        |                  THEN 1 ELSE 0 END AS new_s
        |      FROM x),
        |z AS (SELECT user_id, us,
        |             sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |                              ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM y),
        |sess AS (SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us
        |         FROM z GROUP BY user_id, sid)
        |SELECT s.user_id, s.start_us AS session_start_us, count(*) AS n_events
        |FROM events e JOIN sess s
        |  ON e.user_id = s.user_id
        | AND epoch_us(e.ts) >= s.start_us AND epoch_us(e.ts) < s.end_us
        |GROUP BY 1, 2""".stripMargin,

    "q50_csv_dirty_split" ->
      s"""SELECT event_id, user_id, event_type, value
         |FROM read_csv('$DirtyCsvPath', header=true,
         |  columns={'event_id':'BIGINT','user_id':'BIGINT',
         |           'event_type':'VARCHAR','value':'DOUBLE'},
         |  ignore_errors=true)""".stripMargin,

    "q58_jsonl_read" ->
      s"""SELECT doc_id, lang, text, meta.source AS source,
         |       meta.quality AS quality
         |FROM read_json('$JsonlPath', format='newline_delimited',
         |  columns={'doc_id': 'BIGINT', 'lang': 'VARCHAR',
         |           'text': 'VARCHAR',
         |           'meta': 'STRUCT(source VARCHAR, quality DOUBLE)'},
         |  ignore_errors=true)
         |WHERE doc_id IS NOT NULL""".stripMargin,

    "q68_event_rate_dedup" ->
      """WITH x AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
        |         epoch_us(ts) // 600000000 AS w
        |  FROM events),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY user_id, event_type, w
        |        ORDER BY ts_us, event_id) AS rn
        |      FROM x)
        |SELECT event_id, user_id, event_type, ts_us FROM r WHERE rn = 1""".stripMargin,

    "q79_props_extract" ->
      s"""SELECT CAST(json_extract(props, '$$.k') AS BIGINT) // 10 AS k_bucket,
         |       count(*) AS n_events, $SumCents AS total_value
         |FROM events GROUP BY 1""".stripMargin,

    "q84_session_funnel" ->
      """WITH x AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                 ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events),
        |y AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |                     THEN 1 ELSE 0 END AS new_s FROM x),
        |z AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
        |                                 ORDER BY us, event_id
        |                                 ROWS UNBOUNDED PRECEDING) AS sid FROM y),
        |f AS (SELECT *, min(CASE WHEN event_type = 'click' THEN us END) OVER (
        |        PARTITION BY user_id, sid ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS from_before
        |      FROM z)
        |SELECT count(DISTINCT (user_id, sid)) AS n_sessions,
        |       count(DISTINCT CASE WHEN event_type = 'click'
        |                           THEN (user_id, sid) END) AS n_with_from,
        |       count(DISTINCT CASE WHEN event_type = 'purchase'
        |                            AND from_before IS NOT NULL
        |                           THEN (user_id, sid) END) AS n_converted
        |FROM f""".stripMargin,

    "q85_volume_anomaly" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n_events
        |               FROM events GROUP BY 1),
        |w AS (SELECT d, n_events, lag(n_events) OVER (ORDER BY d) AS prev_n
        |      FROM daily)
        |SELECT d, n_events, prev_n,
        |       CAST(n_events AS DOUBLE) / prev_n AS ratio
        |FROM w
        |WHERE prev_n IS NOT NULL
        |  AND (CAST(n_events AS DOUBLE) / prev_n > 1.05
        |       OR CAST(n_events AS DOUBLE) / prev_n < 0.95)""".stripMargin,

    "q86_snapshot_diff" ->
      s"""$CorruptedCte,
         |b AS (SELECT event_id AS k, value AS v FROM events),
         |a AS (SELECT event_id AS k, value AS v FROM corrupted
         |      WHERE event_id % 101 <> 0)
         |SELECT CASE WHEN b.k IS NULL THEN 'added'
         |            WHEN a.k IS NULL THEN 'removed'
         |            WHEN b.v <> a.v OR ((b.v IS NULL) <> (a.v IS NULL))
         |            THEN 'changed'
         |            ELSE 'same' END AS diff_kind,
         |       count(*) AS n_rows
         |FROM b FULL OUTER JOIN a ON b.k = a.k
         |GROUP BY 1""".stripMargin,

    // merged == full recompute: the oracle IS the from-scratch aggregate
    "q103_incremental_agg" ->
      """SELECT CAST(ts AS DATE) AS event_date, event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT)
        |         AS cents,
        |       CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS DOUBLE)
        |         / 100.0 AS total_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,

    "q120_changelog_apply" ->
      s"""$CorruptedCte
         |SELECT event_id AS k, value AS v FROM corrupted
         |WHERE event_id % 101 <> 0
         |QUALIFY row_number() OVER (PARTITION BY event_id
         |                           ORDER BY ts_us) = 1""".stripMargin,

    "q121_table_checksum" ->
      s"""SELECT l_returnflag,
         |       CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(bit_xor($ChecksumExpr) AS BIGINT) AS xor_sum
         |FROM lineitem
         |GROUP BY 1""".stripMargin,

    "q127_bounce_rate" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                 ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
        |                 THEN 1 ELSE 0 END AS brk
        |  FROM x),
        |sid AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id
        |                           ORDER BY us, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM f),
        |sess AS (
        |  SELECT user_id, session_id, count(*) AS n_events,
        |         CAST(min(ts) AS DATE) AS session_date
        |  FROM sid GROUP BY 1, 2)
        |SELECT session_date, CAST(count(*) AS BIGINT) AS n_sessions,
        |       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_bounces,
        |       (CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |        * 1000000) // CAST(count(*) AS BIGINT) AS bounce_micro
        |FROM sess GROUP BY 1""".stripMargin,

    // integer rebuild of Spark's epoch-aligned hopping windows:
    // ws = us - us % slide - k*slide, k in 0..size/slide-1
    "q128_hopping_windows" ->
      """WITH x AS (
        |  SELECT epoch_us(ts) AS us, user_id,
        |         unnest(generate_series(0, 2)) AS k
        |  FROM events)
        |SELECT us - us % 600000000 - k * 600000000 AS ws_us,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM x GROUP BY 1""".stripMargin,

    "q129_column_profile" ->
      """WITH o AS (SELECT o_custkey, o_orderstatus,
        |                  CAST(o_orderdate AS DATE) AS o_orderdate
        |           FROM orders)
        |SELECT 'o_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
        |       CAST(min(o_custkey) AS VARCHAR) AS min_s,
        |       CAST(max(o_custkey) AS VARCHAR) AS max_s
        |FROM o
        |UNION ALL
        |SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
        |       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(count(DISTINCT o_orderstatus) AS BIGINT),
        |       min(o_orderstatus), max(o_orderstatus)
        |FROM o
        |UNION ALL
        |SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
        |       CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(count(DISTINCT o_orderdate) AS BIGINT),
        |       CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
        |FROM o""".stripMargin,

    "q131_union_drift" ->
      """SELECT event_id, user_id, value, NULL AS event_type
        |FROM events WHERE event_id % 2 = 0
        |UNION ALL
        |SELECT event_id, user_id, value, event_type
        |FROM events WHERE event_id % 2 = 1""".stripMargin,

    "q133_constraint_suite" ->
      s"""$CorruptedCte
         |SELECT 'user_id_not_null' AS check_name,
         |       CAST(coalesce(sum(CASE WHEN user_id IS NOT NULL THEN 0 ELSE 1 END), 0) AS BIGINT) AS n_violations,
         |       coalesce(sum(CASE WHEN user_id IS NOT NULL THEN 0 ELSE 1 END), 0) = 0 AS pass
         |FROM corrupted
         |UNION ALL
         |SELECT 'value_non_negative',
         |       CAST(coalesce(sum(CASE WHEN value >= 0 THEN 0 ELSE 1 END), 0) AS BIGINT),
         |       coalesce(sum(CASE WHEN value >= 0 THEN 0 ELSE 1 END), 0) = 0
         |FROM corrupted
         |UNION ALL
         |SELECT 'event_type_known',
         |       CAST(coalesce(sum(CASE WHEN event_type IN ('click','view','purchase','signup','error') THEN 0 ELSE 1 END), 0) AS BIGINT),
         |       coalesce(sum(CASE WHEN event_type IN ('click','view','purchase','signup','error') THEN 0 ELSE 1 END), 0) = 0
         |FROM corrupted
         |UNION ALL
         |SELECT 'ts_in_range',
         |       CAST(coalesce(sum(CASE WHEN ts_us >= 1577836800000000 AND ts_us < 1893456000000000 THEN 0 ELSE 1 END), 0) AS BIGINT),
         |       coalesce(sum(CASE WHEN ts_us >= 1577836800000000 AND ts_us < 1893456000000000 THEN 0 ELSE 1 END), 0) = 0
         |FROM corrupted""".stripMargin,

    "q134_concurrency_curve" ->
      """WITH x AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                 ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
        |                 THEN 1 ELSE 0 END AS brk
        |  FROM x),
        |sid AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id
        |                           ORDER BY us, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM f),
        |sess AS (
        |  SELECT min(us) // 3600000000 AS sh, max(us) // 3600000000 AS eh
        |  FROM sid GROUP BY user_id, session_id),
        |hrs AS (
        |  SELECT unnest(generate_series(sh, eh)) AS hour_ord FROM sess)
        |SELECT hour_ord, CAST(count(*) AS BIGINT) AS n_active
        |FROM hrs GROUP BY 1""".stripMargin,

    "q139_freshness" ->
      """WITH t AS (
        |  SELECT event_type, max(epoch_us(ts)) AS last_us
        |  FROM events GROUP BY 1)
        |SELECT event_type, last_us,
        |       ((SELECT max(last_us) FROM t) - last_us) // 3600000000
        |         AS stale_hours
        |FROM t""".stripMargin,

    "q143_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |sc AS (
        |  SELECT d, n,
        |         CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
        |         CAST(sum(n) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
        |              AS BIGINT) AS s_i
        |  FROM daily),
        |tot AS (SELECT CAST(max(i) AS BIGINT) AS n_days,
        |               CAST(sum(n) AS BIGINT) AS total FROM sc)
        |SELECT d AS cp_date, i AS cp_index, n_days, s_i AS cum_before,
        |       total,
        |       CAST(abs(n_days * s_i - i * total) AS BIGINT) AS stat_max
        |FROM sc, tot
        |ORDER BY stat_max DESC, cp_date ASC LIMIT 1""".stripMargin,

    "q155_session_paths" ->
      """WITH x AS (
        |  SELECT user_id, event_id,
        |         coalesce(event_type, 'unknown') AS event_type,
        |         epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER w AS prev_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, event_id, event_type, us,
        |         sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |                  THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY us, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x),
        |t AS (
        |  SELECT event_type, sid,
        |         lead(event_type, 1) OVER w AS t2,
        |         lead(event_type, 2) OVER w AS t3,
        |         lead(sid, 1) OVER w AS s2,
        |         lead(sid, 2) OVER w AS s3
        |  FROM s
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT event_type || '>' || t2 || '>' || t3 AS path,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM t WHERE s3 = sid AND s2 = sid
        |GROUP BY 1 ORDER BY 2 DESC, 1 ASC LIMIT 20""".stripMargin,

    "q228_fill_rates" ->
      """WITH a AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(*) FILTER (WHERE text IS NULL) AS BIGINT) AS nu_text,
        |    CAST(count(*) FILTER (WHERE text IS NOT NULL
        |         AND length(trim(text)) = 0) AS BIGINT) AS em_text,
        |    CAST(count(*) FILTER (WHERE lang IS NULL) AS BIGINT) AS nu_lang,
        |    CAST(count(*) FILTER (WHERE lang IS NOT NULL
        |         AND length(trim(lang)) = 0) AS BIGINT) AS em_lang,
        |    CAST(count(*) FILTER (WHERE n_chars IS NULL) AS BIGINT) AS nu_nc,
        |    CAST(count(*) FILTER (WHERE n_chars IS NOT NULL
        |         AND n_chars <= 0) AS BIGINT) AS em_nc
        |  FROM documents GROUP BY 1),
        |m AS (
        |  SELECT source, n_rows, 'text' AS col_name,
        |         nu_text AS n_null, em_text AS n_empty FROM a
        |  UNION ALL
        |  SELECT source, n_rows, 'lang', nu_lang, em_lang FROM a
        |  UNION ALL
        |  SELECT source, n_rows, 'n_chars', nu_nc, em_nc FROM a)
        |SELECT source, n_rows, col_name, n_null, n_empty,
        |       (1000 * (n_rows - n_null - n_empty)) // n_rows
        |         AS fill_permille
        |FROM m""".stripMargin,

    "q196_fd_audit" ->
      """SELECT 'part' AS relation, 'p_name' AS lhs, 'p_brand' AS rhs,
        |       CAST(count(*) AS BIGINT) AS n_groups,
        |       CAST(count(CASE WHEN n_rhs > 1 THEN 1 END) AS BIGINT) AS n_violating
        |FROM (SELECT count(DISTINCT p_brand) AS n_rhs FROM part GROUP BY p_name)
        |UNION ALL
        |SELECT 'part', 'p_brand', 'p_type', CAST(count(*) AS BIGINT),
        |       CAST(count(CASE WHEN n_rhs > 1 THEN 1 END) AS BIGINT)
        |FROM (SELECT count(DISTINCT p_type) AS n_rhs FROM part GROUP BY p_brand)
        |UNION ALL
        |SELECT 'orders', 'o_orderkey', 'o_custkey', CAST(count(*) AS BIGINT),
        |       CAST(count(CASE WHEN n_rhs > 1 THEN 1 END) AS BIGINT)
        |FROM (SELECT count(DISTINCT o_custkey) AS n_rhs FROM orders GROUP BY o_orderkey)
        |UNION ALL
        |SELECT 'orders', 'o_custkey', 'o_orderpriority', CAST(count(*) AS BIGINT),
        |       CAST(count(CASE WHEN n_rhs > 1 THEN 1 END) AS BIGINT)
        |FROM (SELECT count(DISTINCT o_orderpriority) AS n_rhs FROM orders GROUP BY o_custkey)
        |UNION ALL
        |SELECT 'customer', 'c_custkey', 'c_mktsegment', CAST(count(*) AS BIGINT),
        |       CAST(count(CASE WHEN n_rhs > 1 THEN 1 END) AS BIGINT)
        |FROM (SELECT count(DISTINCT c_mktsegment) AS n_rhs FROM customer GROUP BY c_custkey)
        |UNION ALL
        |SELECT 'events', 'user_id', 'event_type', CAST(count(*) AS BIGINT),
        |       CAST(count(CASE WHEN n_rhs > 1 THEN 1 END) AS BIGINT)
        |FROM (SELECT count(DISTINCT event_type) AS n_rhs FROM events GROUP BY user_id)""".stripMargin,

    "q175_fk_audit" -> {
      def rel(name: String, child: String, fk: String, parent: String,
              pk: String): String =
        s"""SELECT '$name' AS relation,
           |       (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_rows,
           |       (SELECT CAST(count(*) AS BIGINT) FROM $child
           |        WHERE $fk IS NULL) AS n_null_fk,
           |       (SELECT CAST(count(*) AS BIGINT) FROM $child
           |        WHERE $fk IS NOT NULL AND $fk NOT IN
           |          (SELECT $pk FROM $parent WHERE $pk IS NOT NULL))
           |         AS n_orphan""".stripMargin
      Seq(
        rel("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        rel("lineitem.l_partkey->part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        rel("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        rel("orders.o_custkey->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        rel("customer.c_nationkey->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        rel("supplier.s_nationkey->nation", "supplier", "s_nationkey",
          "nation", "n_nationkey"),
        rel("nation.n_regionkey->region", "nation", "n_regionkey",
          "region", "r_regionkey"),
        rel("events.user_id->customer", "events", "user_id",
          "customer", "c_custkey")
      ).mkString("\nUNION ALL\n")
    },

    "q177_totalprice_audit" ->
      """WITH ls AS (
        |  SELECT l_orderkey,
        |         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |              * (1.0 + l_tax) * 10000 + 0.5) AS BIGINT)) AS BIGINT)
        |           AS lines_micro
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT o_orderstatus,
        |         COALESCE(ls.lines_micro, 0)
        |           - CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)
        |           AS delta
        |  FROM orders LEFT JOIN ls ON o_orderkey = l_orderkey)
        |SELECT o_orderstatus,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(count(*) FILTER (WHERE delta <> 0) AS BIGINT)
        |         AS n_mismatch,
        |       CAST(max(abs(delta)) AS BIGINT) AS max_abs_delta,
        |       CAST(sum(abs(delta)) AS BIGINT) AS sum_abs_delta
        |FROM j GROUP BY 1""".stripMargin,
  )
}
