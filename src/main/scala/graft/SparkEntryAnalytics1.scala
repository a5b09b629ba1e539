package graft

import graft.functions.ExactAgg
import graft.operators._
import graft.sources.CsvSource
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import SparkEntryShared._

/** relational/OLAP analytics queries, part 1 of 3 (SURVEY §2.6) — one `queries` entry per SURVEY §2 item, with its
  * DuckDB oracle twin in `oracleSql`. Moved verbatim from the
  * single-file SparkEntry in round 6; SparkEntry concatenates
  * the per-family maps, so names/plans/oracles are unchanged.
  */
private[graft] object SparkEntryAnalytics1 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.6 — pricing summary (TPC-H Q1 shape, decimal-exact)
    "q07_pricing_summary" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          ExactAgg.moneySum(col("l_extendedprice")).as("sum_base_price"),
          ExactAgg.scaledSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000).as("sum_disc_price"),
          ExactAgg.scaledSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 1000000).as("sum_charge"),
          ExactAgg.scaledSum(col("l_discount"), 100).as("sum_disc"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .withColumn("avg_price", col("sum_base_price") / col("count_order"))
        .withColumn("avg_disc", col("sum_disc") / col("count_order"))
    }),

    // same top-k pattern at lineitem scale
    "q08_top_parts_brand_month" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("month", trunc(to_date(col("l_shipdate")), "month"))
      val part = t(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val joined = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      Kpi.topKPerGroup(joined, Seq("month", "p_brand"), "l_partkey", 3)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // multi-way star join with broadcast dims
    "q09_revenue_by_nation" -> ((s, dir) => {
      val dims = t(s, dir, "region").select(col("r_regionkey"), col("r_name"))
        .join(t(s, dir, "nation"), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("r_name"), col("n_name"))
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(dims), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          ExactAgg.scaledSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // existence semi-join (TPC-H Q4 shape)
    "q10_priority_semijoin" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li,
          ord("o_orderkey") === li("l_orderkey") && li("l_shipdate") > ord("o_orderdate"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    }),

    // §2.6 — skew-salted join, provably identical to the plain join
    "q27_salted_join" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id").as("c_custkey"), col("value"))
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      SkewJoin.saltedJoin(ev, cust, "c_custkey", 8)
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_events"),
          ExactAgg.moneySum(col("value")).as("total_value"))
    }),

    // §2.6 — rollup subtotals (region → region+nation → grand total)
    "q29_rollup_revenue" -> ((s, dir) => {
      val dims = t(s, dir, "region").select(col("r_regionkey"), col("r_name"))
        .join(t(s, dir, "nation"), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("r_name"), col("n_name"))
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(dims), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(ExactAgg.scaledSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // §2.6 — running totals: integer-cents cumulative window (tree-
    // aggregation-proof: the windowed sum is over BIGINTs)
    "q30_running_revenue" -> ((s, dir) => {
      val monthly = t(s, dir, "orders")
        .groupBy(trunc(to_date(col("o_orderdate")), "month").as("month"))
        .agg(sum(ExactAgg.cents(col("o_totalprice"))).as("rev_cents"),
          count(lit(1)).as("n_orders"))
      import org.apache.spark.sql.expressions.Window
      monthly
        .withColumn("cum_cents",
          sum(col("rev_cents")).over(Window.orderBy(col("month"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("month"), col("n_orders"),
          (col("rev_cents").cast("double") / 100.0).as("revenue"),
          (col("cum_cents").cast("double") / 100.0).as("cum_revenue"))
    }),

    // §2.6 — anti-join: customers with no finished order
    "q31_anti_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_customers"))),

    // §2.6 — pivot with a FIXED value list (no discovery pass at scale)
    "q32_pivot_events" -> ((s, dir) =>
      enriched(s, dir)
        .groupBy(col("segment"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)),

    // §2.6 — exact interpolated percentiles per group
    "q37_percentiles" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          // finite-support contract: see SparkEntryShared.finiteVal
          percentile(finiteVal(col("value")), lit(0.5)).as("p50"),
          percentile(finiteVal(col("value")), lit(0.9)).as("p90"),
          percentile(finiteVal(col("value")), lit(0.99)).as("p99"))),

    // §2.6 — left-outer enrichment keeping unmatched rows (sparse dim)
    "q38_left_join_sparse" -> ((s, dir) => {
      val dim = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_mktsegment"))
      events(s, dir)
        .join(broadcast(dim), col("user_id") === col("c_custkey"), "left_outer")
        .groupBy(coalesce(col("c_mktsegment"), lit("UNMATCHED")).as("segment"))
        .agg(count(lit(1)).as("n_events"),
          ExactAgg.moneySum(col("value")).as("total_value"))
    }),

    // §2.6 — set operations (INTERSECT / EXCEPT / UNION on key sets)
    "q39_setops" -> ((s, dir) => {
      val active = events(s, dir).select(col("user_id").as("k")).distinct()
      val rich = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("k")).distinct()
      val i = active.intersect(rich).agg(count(lit(1)).as("n_active_rich"))
      val e = rich.except(active).agg(count(lit(1)).as("n_rich_inactive"))
      val u = active.union(rich).distinct().agg(count(lit(1)).as("n_union"))
      i.crossJoin(e).crossJoin(u)
    }),

    // §2.6 — fixed-width histogram (integer bucketing, exact)
    "q40_histogram" -> ((s, dir) =>
      events(s, dir)
        // non-finite values land in the NULL bucket instead of silently
        // flooring (Spark floor(NaN) = 0!) or saturating (±Inf) — the
        // histogram then SHOWS the bad rows; guard the DOUBLE before
        // floor, as in ExactAgg.scaledLong (adversarial sweep r9)
        .groupBy(when((col("value") / 50)
            .between(lit(-9.2233720368547e18), lit(9.2233720368547e18)),
          floor(col("value") / 50)).as("bucket"))
        .agg(count(lit(1)).as("n_events"),
          ExactAgg.moneySum(col("value")).as("total_value"))),

    // §2.6 — sketch summary (HLL distinct + approx quantiles next to the
    // exact values; rows-only — sketch state is engine-specific)
    "q41_sketches" -> ((s, dir) => Sketches.summaryContract(events(s, dir))),

    // §2.6 — as-of join (composed union+window; oracled against DuckDB's
    // native ASOF JOIN): each event picks the user's latest preceding order
    "q42_asof_join" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_id"), col("ts"), col("ts_us"), col("user_id"))
      val ord = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
        .withColumnRenamed("o_custkey", "user_id")
      AsofJoin.asofJoin(ev, ord, "user_id", "ts", "o_orderdate", Seq("o_orderkey"))
        .select(col("event_id"), col("ts_us"), col("user_id"),
          col("asof_o_orderkey"),
          unix_micros(col("asof_o_orderdate").cast("timestamp_ltz")).as("asof_order_us"))
    }),

    // §2.6 — unkeyed range join via time binning (equi-join on the bin,
    // exact refine): lineitems falling in 45-day windows from each quarter
    "q44_range_join_binned" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(unix_micros(col("l_shipdate").cast("timestamp_ltz")).as("ship_us"),
          col("l_extendedprice"))
      val iv = li.select(col("ship_us"))
        .withColumn("q_start_us",
          unix_micros(date_trunc("quarter",
            timestamp_micros(col("ship_us"))).cast("timestamp_ltz")))
        .select(col("q_start_us")).distinct()
        .withColumn("q_end_us", col("q_start_us") + lit(45L * 86400L * 1000000L))
      RangeJoin.binnedPointInInterval(li, iv, "ship_us", "q_start_us", "q_end_us",
          15L * 86400L * 1000000L)
        .groupBy(col("q_start_us"))
        .agg(count(lit(1)).as("n_items"),
          ExactAgg.moneySum(col("l_extendedprice")).as("total_price"))
    }),

    // §2.6 — TPC-H Q6 shape: every range predicate reaches the parquet scan
    // (PushedFilters), asserted in PlanShapeSpec
    "q46_filtered_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(ExactAgg.scaledSum(col("l_extendedprice") * col("l_discount"), 10000)
          .as("revenue"),
          count(lit(1)).as("n_items"))),

    // §2.6 — CUBE over (event_type, iso weekday): all four grouping-set
    // levels in one pass, partial-agg friendly (null placeholders labeled)
    "q63_cube_kpis" -> ((s, dir) =>
      events(s, dir)
        .withColumn("wd", expr("weekday(ts) + 1"))
        .cube(col("event_type"), col("wd"))
        .agg(count(lit(1)).as("n_events"),
          ExactAgg.moneySum(col("value")).as("total_value"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("wd"), lit(-1)).cast("long").as("wd"),
          col("n_events"), col("total_value"))),

    // §2.6 — gaps-and-islands: per-user runs of consecutive active days
    // via the date-minus-row_number anchor; one shuffle (user_id), the
    // window and both aggregations reuse its partitioning
    "q64_streaks" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // ONE shuffle: the explicit user_id partitioning satisfies the
      // distinct's (user_id, d) clustering, the window's user_id
      // partitioning, AND the final (user_id, anchor) grouping — without
      // it each step would re-exchange
      val days = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .repartition(col("user_id"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
      days
        .withColumn("anchor", date_sub(col("d"), row_number().over(w)))
        .groupBy(col("user_id"), col("anchor"))
        .agg(min(col("d")).as("streak_start"), max(col("d")).as("streak_end"),
          count(lit(1)).as("streak_len"))
        .drop("anchor")
    }),

    // §2.6 — Bloom-prefiltered join: urgent orders' key set as a Bloom
    // filter probes the lineitem scan before the join shuffle; result is
    // exactly the plain inner join (false positives die in the real join)
    "q65_bloom_join" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderpriority"))
      BloomJoin.bloomPrefilteredJoin(
          t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity")),
          urgent, "l_orderkey", "o_orderkey", fpp = 0.01)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
    }),

    // §2.6 — strict-order funnel (view → click → purchase): each stage is
    // first-event-after-previous-stage; all three aggs shuffle on user_id
    // so the stage joins reuse one partitioning; 1-row stage counts at
    // the end combine with cross joins (driver-free)
    "q66_funnel" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_us"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_view"))
      val c = e.filter(col("event_type") === "click").join(v, Seq("user_id"))
        .filter(col("ts_us") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_click"))
      val p = e.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
        .filter(col("ts_us") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_purchase"))
      v.agg(count(lit(1)).as("n_view_users"))
        .crossJoin(c.agg(count(lit(1)).as("n_click_users")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase_users")))
    }),

    // §2.6 — cohort retention: users bucketed by first-active day, distinct
    // actives per (cohort, day offset); the classic triangle matrix
    "q67_retention" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // cohort via a window min instead of a self-join: the explicit
      // user_id partitioning serves the distinct AND the window, so the
      // only other shuffle is the final (cohort, offset) rollup
      val days = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .repartition(col("user_id"))
        .distinct()
      days
        .withColumn("cohort",
          min(col("d")).over(Window.partitionBy(col("user_id"))))
        .groupBy(col("cohort"),
          datediff(col("d"), col("cohort")).cast("long").as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // §2.6 — Morton z-value arithmetic (the sort key behind the
    // two-dimensional data-skipping layout in PartitionedSink
    // .writeZOrdered); pure codegen'd bitwise ladder, exact in any engine
    "q69_zorder_values" -> ((s, dir) =>
      events(s, dir).select(col("event_id"),
        graft.functions.ZOrder.zValue(
          col("user_id").bitwiseAND(lit(65535L)),
          expr("ts_us div 86400000000")).as("zval"))),

    // §2.6 — correlated scalar subquery through the SQL facade: Catalyst
    // decorrelates the per-partkey average into an aggregate + join (no
    // per-row re-execution); the threshold arithmetic is exact because
    // integral quantities sum exactly in doubles in any order
    "q72_below_avg_parts" -> ((s, dir) => {
      GraftSql.register(s, dir)
      s.sql(
        """SELECT l_partkey, count(*) AS n_below
          |FROM lineitem l1
          |WHERE l_quantity < (SELECT 0.2 * avg(l_quantity)
          |                    FROM lineitem l2
          |                    WHERE l2.l_partkey = l1.l_partkey)
          |GROUP BY l_partkey""".stripMargin)
    }),

    // §2.6 — robust dispersion stats: median + MAD per event type (the
    // outlier-resistant sigma for quality gating); the tiny median frame
    // broadcasts back for the deviation pass — two scans, no extra
    // corpus shuffle
    "q74_mad_stats" -> ((s, dir) => {
      // finite-support contract on the measure (SparkEntryShared.finiteVal);
      // count(lit(1)) below still counts every row, guarded or not
      val e = events(s, dir)
        .select(col("event_type"), finiteVal(col("value")).as("value"))
      val med = e.groupBy(col("event_type"))
        .agg(percentile(col("value"), lit(0.5)).as("med"))
      e.join(broadcast(med), Seq("event_type"))
        .withColumn("dev", abs(col("value") - col("med")))
        .groupBy(col("event_type"), col("med"))
        .agg(percentile(col("dev"), lit(0.5)).as("mad"),
          count(lit(1)).as("n_events"))
    }),

    // §2.6 — k-anonymity audit over a quasi-identifier: group sizes with a
    // below-k flag (the privacy gate before publishing grouped extracts)
    "q76_k_anonymity" -> ((s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("group_size"))
        .withColumn("below_k", col("group_size") < 12)),

    // §2.6 — full-outer reconciliation: daily counts from two independent
    // feeds, unmatched days surfaced from either side with zero fills
    "q78_reconcile_feeds" -> ((s, dir) => {
      val e = events(s, dir).groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n_events"))
      val o = t(s, dir, "orders").groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n_orders"))
      e.join(o, Seq("d"), "full_outer")
        .select(col("d"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    }),

    // §2.6 — co-purchase pairs ("bought X, also bought Y"): bipartite
    // 2-hop via a self-join on the user side, per-user item cap bounding
    // the quadratic fan-out (cap 100 does not bind on this data, so the
    // uncapped oracle applies; the binding case is spec-tested)
    "q80_copurchase" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("user"), col("l_partkey").as("item"))
      Recommend.coPairs(edges, capPerUser = 100, k = 50)
    }),

    // §2.6 — ratio-to-report: national revenue share of the global total;
    // the unpartitioned window runs over the 25-row AGGREGATED frame (a
    // global window over the fact table would single-partition — this
    // shape never does), and the share divides two exact cent integers
    "q82_revenue_share" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cents = sum(ExactAgg.cents(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
      val rev = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(cents.as("cents"))
      rev.select(col("n_name"),
        (col("cents").cast("double") / 100.0).as("revenue"),
        (col("cents").cast("double") /
          sum(col("cents")).over(Window.partitionBy())).as("share"))
    }),

    // §2.6 — supplier league table: suppliers beating their nation's
    // average revenue; the nation-average window runs over the per-
    // supplier AGGREGATE (bounded by supplier count), dims broadcast
    "q87_supplier_league" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cents = sum(ExactAgg.cents(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey")).agg(cents.as("cents"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey").cast("long") === col("n_nationkey"))
        .withColumn("nation_avg_cents",
          avg(col("cents")).over(Window.partitionBy(col("n_name"))))
        .filter(col("cents") > col("nation_avg_cents"))
        .select(col("s_name"), col("n_name"),
          (col("cents").cast("double") / 100.0).as("revenue"),
          (col("nation_avg_cents") / 100.0).as("nation_avg_revenue"))
    }),

    // §2.6 — per-type daily-volume trend: closed-form least-squares slope
    // from exact integer sums (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) — no
    // engine-dependent float accumulation, unlike regr_slope
    "q89_volume_trend" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type"),
          expr("ts_us div 86400000000").as("x"))
        .agg(count(lit(1)).as("y"))
      daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("event_type"),
          // nullif: a SINGLE-day series has zero x-variance, where the
          // ANSI double division throws; the slope is undefined → NULL
          // (DuckDB's /0 is NULL natively) — adversarial sweep r9 advD
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            nullif((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double"), lit(0.0)))
            .as("slope"),
          col("n").as("n_days"))
    }),

    // §2.6 — trailing-7-day rolling totals: a RANGE frame over the
    // integer day ordinal (handles gapped days correctly, unlike a
    // 7-ROW frame), windowing the tiny per-day aggregate
    "q90_rolling_7d" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir)
        .groupBy(expr("ts_us div 86400000000").as("day_num"))
        .agg(count(lit(1)).as("n_events"))
      daily.withColumn("n_7d",
          sum(col("n_events")).over(Window.orderBy(col("day_num"))
            .rangeBetween(-6, 0)))
        .select(col("day_num"), col("n_events"), col("n_7d"))
    }),

    // §2.6 — equal-depth decile bucketing per market segment (the
    // rank-bucketing primitive writeZOrdered's doc calls for): NTILE
    // windows partitioned by segment so the sort parallelizes — a GLOBAL
    // ntile would funnel the table through one partition and is
    // deliberately not what this query does
    "q73_ntile_deciles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"),
        ntile(10).over(Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal"), col("c_custkey"))).cast("long").as("decile"))
    }),

    // §2.6 — SCD2 dimension-history build from the raw event log
    "q101_scd2_intervals" -> ((s, dir) => Events.scd2(events(s, dir))),

    // §2.6 — calendar gap-fill with forward fill: every day in each
    // type's observed span, zeros on quiet days, LOCF carry-forward
    "q104_gap_fill" -> ((s, dir) => Events.gapFillDaily(events(s, dir))),

    // §2.6 — unkeyed interval-overlap join (binned, ownership emission):
    // concurrent session pairs across the odd/even user split
    "q105_interval_overlap" -> ((s, dir) => {
      // localCheckpoint: both parity filters read the sessionization once
      // instead of re-scanning events + re-aggregating per side
      val sessions = events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"))
        .localCheckpoint()
      // expr("% 2"): Spark's % matches DuckDB's on negatives; pmod doesn't
      RangeJoin.binnedIntervalOverlap(
          sessions.filter(expr("user_id % 2 = 1")),
          sessions.filter(expr("user_id % 2 = 0")),
          "start_us", "end_us", 3600L * 1000000L)
        .select(col("a_user_id"), col("a_start_us"),
          col("b_user_id"), col("b_start_us"), col("overlap_us"))
    }),

    // §2.6 — event-type transition matrix: the Markov-chain feed
    "q107_type_transitions" -> ((s, dir) =>
      Events.typeTransitions(events(s, dir))),

    // §2.6 — integer-micro PageRank over the symmetric co-purchase part
    // graph (pair fan-out bounded by lineitems-per-order, a schema
    // constant; the orderkey exchange is shared by both self-join sides)
    "q110_pagerank" -> ((s, dir) => {
      val edges = Graph.symmetricCoOccurrenceEdges(t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))
      Graph.pageRankMicro(edges, 3)
    }),

    // §2.6 — trailing-7-day EXACT distinct users per day: day-grain
    // dedup first (bounded at days × users, the only pass over raw
    // events), then a map-side 7-offset fan-out replaces the range
    // join — every shuffle after the dedup runs on the small frame.
    // Days with no events of their own are excluded (semi-join on the
    // broadcast day list)
    "q111_rolling_distinct" -> ((s, dir) => {
      // localCheckpoint: the deduped frame feeds both the fan-out and
      // the broadcast day list — without it each consumer re-scans and
      // re-dedups the raw events
      val du = events(s, dir)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        .localCheckpoint()
      val days = du.select(col("day")).distinct()
      du.select(col("user_id"), col("day"),
          explode(sequence(lit(0), lit(6))).as("off"))
        .select(col("user_id"), date_add(col("day"), col("off")).as("day"))
        .join(broadcast(days), Seq("day"), "leftsemi")
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("u7"))
    }),

    // §2.6 — RFM customer scoring, quartiles WITHIN each nation: the
    // ntile windows partition on c_nationkey, so no global single-
    // partition sort exists at any scale (same shape as q73's per-
    // segment NTILE). Monetary is exact integer cents; every window
    // carries a total-order tie-break
    "q113_rfm_scores" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val rfm = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_dt"),
          count(lit(1)).as("freq"),
          sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .as("cents"))
        .join(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
      def q(order: Column*) = ntile(4)
        .over(Window.partitionBy(col("c_nationkey")).orderBy(order: _*))
        .cast("long")
      rfm.select(col("o_custkey").as("custkey"), col("c_nationkey").as("nationkey"),
          q(col("last_dt"), col("o_custkey")).as("r_score"),
          q(col("freq"), col("o_custkey")).as("f_score"),
          q(col("cents"), col("o_custkey")).as("m_score"))
        .withColumn("rfm_cell",
          col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
    }),

    // §2.6 — last-touch attribution: purchases credited to the most
    // recent preceding non-purchase event within 7 days, else
    // unattributed; ONE user_id shuffle carries both carry-forward
    // windows, revenue in exact half-up cents
    "q117_attribution" -> ((s, dir) =>
      Events.lastTouchAttribution(events(s, dir), 7, "purchase")),

    // §2.6 — arbitrary GROUPING SETS (the general form of q63's CUBE /
    // q29's ROLLUP): the three requested levels in ONE pass over the
    // corpus, partial-agg friendly; grouping() bits disambiguate subtotal
    // rows from genuine values, which coalesce alone cannot
    "q118_grouping_sets" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupingSets(
          Seq(Seq(col("lang"), col("source")), Seq(col("lang")),
            Seq(col("source"))),
          col("lang"), col("source"))
        .agg(
          (grouping(col("lang")).cast("long") * 2L +
            grouping(col("source")).cast("long")).as("gid"),
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .select(col("gid"),
          coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"),
          col("n_docs"), col("total_chars"))),

    // §2.6 — source×lang association lift (market-basket style): observed
    // cell count vs the independence expectation, as an exact integer
    // micro-ratio (no doubles, no libm). ONE corpus shuffle builds the
    // cell frame; the margin sums are windows over that frame, which is
    // bounded by |sources|×|langs| — a domain constant, not data scale
    "q119_lift_cells" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cells = t(s, dir, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("obs"))
      cells
        .withColumn("n_source",
          sum(col("obs")).over(Window.partitionBy(col("source"))))
        .withColumn("n_lang",
          sum(col("obs")).over(Window.partitionBy(col("lang"))))
        .withColumn("n_total",
          sum(col("obs")).over(Window.partitionBy()))
        .select(col("source"), col("lang"), col("obs"),
          col("n_source"), col("n_lang"),
          // two-step division IS the contract: obs*1e6 first (bounded by
          // 9.2e12 rows per cell before int64 overflow — fine at 100 TB,
          // where the single-product form obs*n_total*1e6 would overflow
          // past ~3M rows), per-source rate ≤ 1e6, then scale by
          // n_total/n_lang. The oracle mirrors the same two steps
          expr("(((obs * 1000000L) div n_source) * n_total) div n_lang")
            .as("lift_micro"))
    }),

    // §2.6 — deterministic mode per group (argmax pattern): most frequent
    // event_type per user, ties broken by the larger type string so the
    // result is a function of the data, not the plan. Two partial-agg
    // shuffles — (user, type) counts, then max(struct(cnt, type)) per
    // user — both map-side combining; no window, no sort, state per
    // group is ONE struct. The oracle formulates it independently as a
    // row_number window to catch argmax-semantics drift
    "q122_mode_per_group" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("user_id"))
        .agg(max(struct(col("cnt"), col("event_type"))).as("m"))
        .select(col("user_id"), col("m.event_type").as("mode_type"),
          col("m.cnt").as("cnt"))),

    // §2.6 — TPC-H Q18 shape (large-volume orders): HAVING on a grouped
    // sum gates the join, so only the tiny qualifying-order set probes
    // orders/customer — AQE sees a sub-threshold build side and
    // broadcasts. Quantities are integral doubles, so the sum is exact
    // on any partitioning; the output casts it to BIGINT
    "q123_large_volume_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).cast("long").as("total_qty"))
        .filter(col("total_qty") > 300)
      big.join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("order_date"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("total_cents"),
          col("total_qty"))
    }),

    // §2.6 — TPC-H Q21 shape (sole-culprit suppliers): suppliers whose
    // line was the ONLY returned one in a multi-supplier order — the
    // EXISTS + NOT-EXISTS double correlation, re-expressed as ONE
    // per-order aggregate (distinct suppliers, distinct returning
    // suppliers) joined back to the returned lines: two orderkey
    // shuffles replace two correlated sub-scans, and the per-supplier
    // rollup + name join ride broadcast-sized frames. The oracle keeps
    // the classic EXISTS formulation so the rewrite is checked against
    // the textbook semantics, not itself
    "q124_sole_culprit_suppliers" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val perOrder = li.groupBy(col("l_orderkey")).agg(
        countDistinct(col("l_suppkey")).as("ns"),
        countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
          .as("nr"))
      li.filter(col("l_returnflag") === "R")
        .join(perOrder.filter(col("ns") > 1 && col("nr") === 1),
          "l_orderkey")
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
    }),

    // §2.6 — UNPIVOT (melt): wide-to-long, the inverse of q32's pivot —
    // the round trip pivot→unpivot must land back on the plain long-form
    // groupBy, which is exactly what the oracle computes, so the identity
    // checks both directions at once. unpivot is a zero-shuffle Expand
    // over the already-aggregated wide frame; absent cells pivot to null
    // and are dropped, matching the long form's absent rows
    "q125_unpivot_events" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      events(s, dir)
        .withColumn("event_date", col("ts").cast("date"))
        .groupBy(col("event_date"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .unpivot(Array(col("event_date")), types.map(col).toArray,
          "event_type", "n")
        .filter(col("n").isNotNull)
    }),

    // §2.6 — per-user purchase cadence: inter-purchase gaps from one lag
    // window, rolled up to (count, span, min/max gap) per repeat buyer.
    // ONE user_id shuffle carries the lag window AND the groupBy (same
    // key); gaps are exact integer seconds (epoch-µs div), so min/max/span
    // are partitioning-independent. The churn-model feature feed
    "q126_purchase_cadence" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      events(s, dir)
        .filter(col("event_type") === "purchase")
        .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .withColumn("gap_s", expr("gap_us div 1000000"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          expr("(max(ts_us) - min(ts_us)) div 1000000").as("span_s"),
          min(col("gap_s")).as("min_gap_s"),
          max(col("gap_s")).as("max_gap_s"))
        .filter(col("n_purchases") >= 2)
    }),

    // §2.6 — rank-statistics window family (percent_rank / cume_dist /
    // nth_value) per nation over a TOTAL order (acctbal, suppkey) — no
    // peer rows, so the doubles are the same two integers divided on both
    // engines (IEEE division is correctly rounded → hash-exact); nation
    // partitioning means no global sort at any scale
    "q130_rank_stats" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("s_acctbal"), col("s_suppkey"))
      t(s, dir, "supplier")
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("third_name", nth_value(col("s_name"), 3).over(w))
        .select(col("s_suppkey"), col("s_nationkey"), col("pr"), col("cd"),
          col("third_name"))
    }),

    // §2.6 — join-skew diagnosis: top-20 keys by estimated PAIR cost
    // (n_left × n_right) for the lineitem self-join every co-purchase /
    // same-order analysis starts from — the number that finds the
    // reducer that never finishes. Costs two count-aggregates plus a
    // TakeOrdered top-k, never the join itself
    "q132_skew_report" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey").as("k"))
      SkewJoin.skewReport(li, li, "k", 20)
    }),

    // §2.6 — Pearson correlation from exact integer sums (value cents ×
    // hour-of-day, per event type): like q115, the five sums (n, Σx, Σy,
    // Σxy, Σx², Σy²) are exact BIGINTs from ONE conditional-aggregate
    // shuffle; doubles appear only in the closed form, whose expression
    // structure is identical on both sides — products/quotients/sqrt are
    // correctly-rounded IEEE ops, so r is hash-exact. (Engine corr()
    // builtins use streaming co-moment updates whose float accumulation
    // order is partitioning-dependent — this formulation is not)
    "q136_pearson_corr" -> ((s, dir) =>
      events(s, dir)
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          expr("CAST((CASE WHEN abs(value) <= 1.7976931348623157E308 " +
            "THEN floor(value * 100 + 0.5) END) AS BIGINT)").as("x"),
          expr("(ts_us div 3600000000) % 24").as("y"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("event_type"), col("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double")) *
              sqrt((col("n") * col("syy") - col("sy") * col("sy"))
                .cast("double")))).as("r"))),

    // §2.6 — Pareto revenue concentration: the share of order revenue
    // carried by the top decile of customers. Ranking runs over the
    // CUSTOMER AGGREGATE (never order rows); that frame is |customers|,
    // so the global row_number is the honest cost of an exact decile —
    // at extreme customer counts the scale path is a sampled-quantile
    // revenue threshold, traded for tie-handling exactness. All money is
    // integer cents, the share an exact micro-ratio
    "q137_pareto_revenue" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val rev = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"))
      rev
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("cents").desc, col("o_custkey"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        .withColumn("in_top", col("rnk") * 10L <= col("n"))
        .groupBy()
        .agg(count(lit(1)).as("n_customers"),
          sum(when(col("in_top"), 1L).otherwise(0L)).as("top_decile_n"),
          sum(when(col("in_top"), col("cents")).otherwise(0L))
            .as("top_cents"),
          sum(col("cents")).as("total_cents"))
        .withColumn("share_micro",
          expr("(top_cents * 1000000L) div total_cents"))
    }),

    // §2.6 — conversion latency: hours from a user's FIRST signup to
    // their FIRST purchase after it — n/min/max plus the exact
    // interpolated median (Spark `percentile` ≡ DuckDB `quantile_cont`
    // bit-for-bit on integral inputs). ONE conditional-aggregate shuffle
    // computes both firsts; the latency math is integer hours
    "q138_conversion_latency" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "signup", col("ts_us")))
          .as("first_signup"),
          min(when(col("event_type") === "purchase", col("ts_us")))
            .as("first_purchase"))
        .filter(col("first_signup").isNotNull &&
          col("first_purchase") >= col("first_signup"))
        .withColumn("latency_h",
          expr("(first_purchase - first_signup) div 3600000000"))
        .groupBy()
        .agg(count(lit(1)).as("n_converted"),
          min(col("latency_h")).as("min_h"),
          max(col("latency_h")).as("max_h"),
          expr("percentile(latency_h, 0.5)").as("median_h"))),

    // §2.6 — chi-square independence cells for lang × source (the
    // source-mix drift monitor): per-cell EXACT integer deviation
    // dev = n·obs − row_tot·col_tot (the signed root of the chi statistic's
    // numerator) — no doubles anywhere, so the hash is trivially stable.
    // All three marginals are windows over the CELL AGGREGATE (bounded by
    // |langs|·|sources|), never the corpus; windows keep null keys in one
    // group exactly like the oracle's PARTITION BY (an equi-join back
    // would silently drop them)
    "q146_chi_cells" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cells = t(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("obs"))
      cells.select(col("lang"), col("source"), col("obs"),
          sum(col("obs")).over(Window.partitionBy(col("lang"))).as("row_tot"),
          sum(col("obs")).over(Window.partitionBy(col("source"))).as("col_tot"),
          sum(col("obs")).over(Window.partitionBy()).as("n"))
        .withColumn("dev",
          col("obs") * col("n") - col("row_tot") * col("col_tot"))
    }),

    // §2.6 — lag-1 autocorrelation of the daily event volume from exact
    // integer sums (the seasonality/momentum screen): the five sums are
    // BIGINTs over the bounded |days| frame; numerator and variance terms
    // stay integral, so r's ingredients are hash-exact (same reasoning as
    // q136's Pearson — engine corr() builtins use partitioning-dependent
    // streaming co-moments, this formulation does not)
    "q147_autocorr" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("d"))
      daily.withColumn("prev", lag(col("n"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy()
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("prev")).as("sx"), sum(col("n")).as("sy"),
          sum(col("prev") * col("n")).as("sxy"),
          sum(col("prev") * col("prev")).as("sxx"),
          sum(col("n") * col("n")).as("syy"))
        .select(col("n_pairs"), col("sx"), col("sy"), col("sxy"),
          col("sxx"), col("syy"),
          (col("n_pairs") * col("sxy") - col("sx") * col("sy")).as("num"),
          (col("n_pairs") * col("sxx") - col("sx") * col("sx")).as("den_x"),
          (col("n_pairs") * col("syy") - col("sy") * col("sy")).as("den_y"))
    }),

    // §2.6 — Benford leading-digit profile of order totals (the
    // fabricated-feed screen): digit of the integer CENTS (same
    // significand as the price, no float formatting), counts + integer
    // permille against the 1-row total; the digit groupBy collapses
    // map-side to ≤9 keys
    "q148_benford" -> ((s, dir) => {
      val digits = t(s, dir, "orders")
        .select(substring(floor(col("o_totalprice") * 100 + 0.5)
          .cast("long").cast("string"), 1, 1).as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
        .localCheckpoint() // feeds the total AND the final projection
      digits.crossJoin(
          broadcast(digits.groupBy().agg(sum(col("n_orders")).as("total"))))
        .select(col("digit"), col("n_orders"),
          expr("CAST((1000 * n_orders) div total AS BIGINT)").as("permille"))
    }),

    // §2.6 — l-diversity audit ((date, segment) quasi-identifier groups
    // whose sensitive attribute event_type shows < l distinct values —
    // the homogeneity-attack complement of q76's k-anonymity size check);
    // one enriched-stream shuffle on the QI grain
    "q151_l_diversity" -> ((s, dir) =>
      enriched(s, dir)
        .groupBy(col("event_date"), col("segment"))
        .agg(count(lit(1)).as("group_size"),
          countDistinct(col("event_type")).as("l_div"))
        .withColumn("below_l", col("l_div") < 3)),

    // §2.6 — weekday × event-type seasonality profile (0 = Monday on both
    // engines: Spark weekday() ≡ DuckDB isodow−1): counts + integer
    // permille within the weekday over the bounded 7×|types| aggregate
    "q152_weekday_mix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      events(s, dir)
        .groupBy(expr("CAST(weekday(CAST(ts AS DATE)) AS BIGINT)").as("dow"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("dow_total",
          sum(col("n")).over(Window.partitionBy(col("dow"))))
        .withColumn("permille",
          expr("CAST((1000 * n) div dow_total AS BIGINT)"))
    }),

    // §2.6 — reciprocal-rank fusion of two part rankings (revenue cents
    // vs distinct-order breadth): rrf = 1/(60+r₁) + 1/(60+r₂) — the only
    // doubles are two IEEE divisions of small integers and ONE addition,
    // bit-identical on any engine; ranks are row_numbers over the PART
    // AGGREGATE (bounded catalog, q137's documented exemption), fused
    // top-20 by TakeOrdered
    "q153_rrf_fusion" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
            .as("rev_cents"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .withColumn("rank_rev", row_number().over(
          Window.orderBy(col("rev_cents").desc, col("l_partkey"))).cast("long"))
        .withColumn("rank_ord", row_number().over(
          Window.orderBy(col("n_orders").desc, col("l_partkey"))).cast("long"))
        .select(col("l_partkey"), col("rank_rev"), col("rank_ord"),
          (lit(1.0) / (lit(60) + col("rank_rev"))
            + lit(1.0) / (lit(60) + col("rank_ord"))).as("rrf"))
        .orderBy(col("rrf").desc, col("l_partkey").asc)
        .limit(20)
    }),

    // §2.6 — top-10 parts by triangle participation in the co-purchase
    // graph (the community-vs-hub signal): per-order distinct-part pairs
    // (fan-out bounded by order size) feed Graph.triangleCounts'
    // degree-ordered orientation — wedge volume ≤ m·√m on any graph; the
    // oracle counts the same triangles via the naive id-ordered 3-way join
    "q154_triangles" -> ((s, dir) => {
      val edges = Graph.coOccurrenceEdges(t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))
      Graph.triangleCounts(edges)
        .orderBy(col("n_triangles").desc, col("node").asc)
        .limit(10)
    }),

    // §2.6 — skyline / Pareto frontier of parts (maximize revenue cents
    // AND distinct-order breadth): dominance resolved by two RANGE-frame
    // window maxima over the PART AGGREGATE — "any strictly-higher-revenue
    // row with ≥ my breadth" (integer cents make 1 FOLLOWING exact) and
    // "any equal-revenue row with > my breadth" — replacing the naive
    // quadratic NOT-EXISTS anti-join the oracle runs
    "q156_skyline" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // m_gt = max n_orders among STRICTLY higher-revenue parts. On the
      // ascending order that is a (1, unboundedFollowing) frame — which
      // Spark executes as the O(n²) shrinking-frame recompute (measured
      // 8.7 s at sf0.1). The descending-order (unboundedPreceding, -1)
      // frame is the SAME set (integer cents: -1 ≡ strictly greater) but
      // runs on the incremental growing-frame path: 8.7 s → ~1 s
      val byRevDesc = Window.orderBy(col("rev_cents").desc)
      t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
            .as("rev_cents"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .withColumn("m_gt", max(col("n_orders"))
          .over(byRevDesc.rangeBetween(Window.unboundedPreceding, -1)))
        .withColumn("m_eq", max(col("n_orders"))
          .over(byRevDesc.rangeBetween(Window.currentRow, Window.currentRow)))
        .filter((col("m_gt").isNull || col("m_gt") < col("n_orders")) &&
          col("m_eq") <= col("n_orders"))
        .select(col("l_partkey"), col("rev_cents"), col("n_orders"))
    }),

    // §2.6 — 2-itemset association rules over order baskets (support /
    // confidence / lift in exact integer MICROS — lift's cross-multiplied
    // numerator 10⁶·n_ab·n needs n_ab·n ≤ 9.2×10¹² of 64-bit headroom,
    // documented bound): per-order pair fan-out is C(k,2) of the bounded
    // basket size; item supports re-attach by key join; both rule
    // directions emitted
    "q157_basket_rules" -> ((s, dir) => {
      // round 12: the (o, p)-distinct frame + self-join became ONE
      // basket collect (the shared co-occurrence edge-build shape):
      // baskets feed totals, item supports, and the MAP-SIDE pair
      // explode — the pair self-join and its two exchanges are gone.
      // Counts are identical: each order contributes exactly one
      // (pa < pb) instance per unordered pair, as the join did.
      val baskets = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .localCheckpoint() // feeds totals, item supports, AND the pairs
      val nTot = baskets.groupBy().agg(count(lit(1)).as("n"))
      val item = baskets.select(explode(col("ps")).as("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("n_item"))
      val pairs = baskets.filter(size(col("ps")) > 1)
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, " +
            "size(ps)), y -> struct(x AS pa, y AS pb))))")).as("e"))
        .groupBy(col("e.pa").as("pa"), col("e.pb").as("pb"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 5)
      val rules = pairs
        .select(col("pa").as("ante"), col("pb").as("cons"), col("n_ab"))
        .unionAll(pairs
          .select(col("pb").as("ante"), col("pa").as("cons"), col("n_ab")))
      rules
        .join(item.select(col("p").as("ante"), col("n_item").as("n_ante")),
          Seq("ante"))
        .join(item.select(col("p").as("cons"), col("n_item").as("n_cons")),
          Seq("cons"))
        .crossJoin(broadcast(nTot))
        .select(col("ante"), col("cons"), col("n_ab"), col("n_ante"),
          col("n_cons"), col("n"),
          expr("CAST((1000000 * n_ab) div n AS BIGINT)").as("support_micro"),
          expr("CAST((1000000 * n_ab) div n_ante AS BIGINT)")
            .as("conf_micro"),
          expr("CAST((1000000 * n_ab * n) div (n_ante * n_cons) AS BIGINT)")
            .as("lift_micro"))
    }),

    // §2.6 — TPC-H Q3 shape (shipping priority): top-10 unshipped-revenue
    // orders for one segment. Both date filters reach the parquet scans
    // before the joins; orders×customer prunes to the segment first and
    // broadcasts; revenue sums exact micros per order; the top-10 is a
    // TakeOrdered (no global sort), tie-broken on l_orderkey so the limit
    // is deterministic for the oracle compare
    "q158_shipping_priority" -> ((s, dir) => {
      val cut = lit("1997-07-01").cast("date")
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") > cut)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum(ExactAgg.scaledLong(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000))
          .as("revenue_micro"))
        .select(col("l_orderkey"),
          col("o_orderdate").cast("date").as("order_date"),
          col("o_orderpriority"), col("revenue_micro"))
        .orderBy(col("revenue_micro").desc, col("l_orderkey"))
        .limit(10)
    }),

    // §2.6 — TPC-H Q5 shape (local supplier volume): revenue per nation
    // where the customer and the line's supplier share a nation — the
    // c_nationkey = s_nationkey co-location twist distinguishes this from
    // q09's plain star. Both membership dims broadcast; the fact stream
    // shuffles once per key join and aggregates to 25 rows
    "q159_local_supplier_volume" -> ((s, dir) => {
      val nat = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = t(s, dir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
          col("o_orderdate") < lit("1997-01-01").cast("date"))
        .select(col("o_orderkey"), col("o_custkey"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"),
          col("l_discount"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(ExactAgg.scaledSum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000)
          .as("revenue"))
    }),

    // §2.6 — TPC-H Q10 shape (returned-item reporting): top-20 customers
    // by revenue lost to returns in one quarter. The quarter filter gates
    // orders at the scan; lineitem prunes to returnflag='R' before the
    // join; the customer/nation attach happens AFTER the custkey-grain
    // aggregate, so only ~top rows join the dims. Deterministic limit via
    // the custkey tiebreak
    "q160_returned_items" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("date") &&
          col("o_orderdate") < lit("1997-01-01").cast("date"))
        .select(col("o_orderkey"), col("o_custkey"))
      val rev = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(ExactAgg.scaledLong(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000))
          .as("revenue_micro"))
      rev.join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"), col("revenue_micro"))
        .orderBy(col("revenue_micro").desc, col("c_custkey"))
        .limit(20)
    }),

    // §2.6 — TPC-H Q14 shape (promo revenue share): one month's revenue
    // ratio for PROMO-type parts. The month filter reaches the lineitem
    // scan; part broadcasts; both numerator and denominator come out of
    // ONE conditional aggregate (no second pass); the share divides two
    // exact-integer micros as doubles, so it is hash-exact vs the oracle
    "q161_promo_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("date") &&
          col("l_shipdate") < lit("1997-04-01").cast("date"))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      li.join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          // prefix match (TPC-H Q14's LIKE 'PROMO%') — robust whether the
          // datagen emits bare 'PROMO' or composite 'PROMO BURNISHED ...'
          sum(when(col("p_type").startsWith("PROMO"),
            ExactAgg.scaledLong(
              col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000))
            .otherwise(0L)).as("promo_micro"),
          sum(ExactAgg.scaledLong(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000))
            .as("total_micro"))
        .select(col("promo_micro"), col("total_micro"),
          (col("promo_micro").cast("double") * lit(100.0) /
            col("total_micro").cast("double")).as("promo_share"))
    }),

    // §2.6 — TPC-H Q7 shape (volume shipping): revenue flowing between a
    // nation PAIR (supplier's nation × customer's nation, both directions)
    // per ship year. The two tiny nation-keyed maps broadcast; the only
    // corpus shuffle is lineitem⋈orders on orderkey; the pair predicate
    // runs after the broadcasts, the year comes off the pruned shipdate
    "q162_nation_volume" -> ((s, dir) => {
      val natPair = Seq("NATION_3", "NATION_7")
      val nat = t(s, dir, "nation")
        .filter(col("n_name").isin(natPair: _*))
        .select(col("n_nationkey"), col("n_name"))
      val cust = t(s, dir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate") < lit("1998-01-01").cast("date"))
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(ExactAgg.scaledLong(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000))
          .as("revenue_micro"))
    }),

    // §2.6 — TPC-H Q8 shape (national market share): of the STANDARD-part
    // revenue sold to ASIA customers per order year, the share supplied
    // by one nation — numerator and denominator from ONE conditional
    // aggregate, the share an exact integer division of their micros
    "q163_market_share" -> ((s, dir) => {
      val asiaNations = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = t(s, dir, "customer")
        .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
          col("o_orderdate") < lit("1998-01-01").cast("date"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"))
      // prefix match, not equality: the datagen may adopt composite
      // p_type strings ("STANDARD BRUSHED..."), and exact equality would
      // silently turn the query vacuous on both engines (ADVICE r4;
      // same hedge as q161's PROMO prefix)
      val stdParts = t(s, dir, "part").filter(col("p_type").startsWith("STANDARD"))
        .select(col("p_partkey"))
      val natSup = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(broadcast(stdParts), col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(natSup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("n_name") === "NATION_5", ExactAgg.scaledLong(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000))
            .otherwise(0L)).as("nation_micro"),
          sum(ExactAgg.scaledLong(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000))
            .as("total_micro"))
        .withColumn("share_ppm",
          expr("(nation_micro * 1000000) div total_micro"))
    }),

    // §2.6 — TPC-H Q17 shape (small-quantity revenue): lines whose
    // quantity is below 20% of their part's average, for one brand. The
    // correlated average is exact: 5·qty·cnt < sum_qty in int64 (the
    // synthetic quantities are integral), never a double avg. Both the
    // per-part stats and the probe reuse one l_partkey shuffle
    "q164_small_qty_revenue" -> ((s, dir) => {
      val brandLines = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .localCheckpoint() // consumed twice: stats build + probe
      val stats = brandLines.groupBy(col("l_partkey").as("sp_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("cnt"))
      brandLines
        .join(stats, col("l_partkey") === col("sp_partkey"))
        .filter(col("l_quantity").cast("long") * lit(5L) * col("cnt") <
          col("sum_qty"))
        .agg(sum(ExactAgg.scaledLong(col("l_extendedprice"), 10000))
          .as("total_micro"))
        .select(col("total_micro"),
          expr("total_micro div 7").as("avg_yearly_micro"))
    }),

    // §2.6 — TPC-H Q19 shape (disjunctive predicates): three OR'd
    // (brand, size-range, quantity-range) arms evaluated in one pass —
    // the part side prunes to the three brands AT THE SCAN (the
    // brand-disjunction is pushable), the residual arm predicate runs
    // after the broadcast join, and revenue sums exact micros
    "q165_disjunct_revenue" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#14"))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
      val arm = (brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =>
        col("p_brand") === brand &&
          col("p_size").between(szLo, szHi) &&
          col("l_quantity").between(qLo, qHi)
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(arm("Brand#12", 1, 5, 1, 11) ||
          arm("Brand#23", 1, 10, 10, 20) ||
          // Brand#14 (not TPC-H's Brand#34): the datagen only emits
          // Brand#1..Brand#25, and a never-matching arm would leave a
          // third of the disjunction untested (ADVICE r4)
          arm("Brand#14", 1, 15, 20, 30))
        .agg(sum(ExactAgg.scaledLong(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000))
          .as("revenue_micro"),
          count(lit(1)).as("n_lines"))
    }),

    // §2.6 — TPC-H Q22 shape (idle wealthy customers): customers whose
    // balance beats the average POSITIVE balance (exact rational compare:
    // cents·cnt > sum_cents, no double avg) and who placed no order in
    // the final window — scalar-aggregate broadcast + anti-join on
    // custkey, grouped to one row per nation
    "q166_idle_customers" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          ExactAgg.cents(col("c_acctbal")).as("bal_cents"))
      val posAvg = cust.filter(col("bal_cents") > 0L)
        .agg(sum(col("bal_cents")).as("sum_cents"),
          count(lit(1)).as("n_pos"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("date"))
        .select(col("o_custkey"))
      cust.crossJoin(broadcast(posAvg))
        .filter(col("bal_cents") * col("n_pos") > col("sum_cents"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("bal_cents")).as("total_cents"))
    }),

    // §2.6 — TPC-H Q2 shape (round 5, adapted: no partsupp table in this
    // schema, so "supply cost" is the supplier's observed unit price from
    // lineitem history): for every size-15 part, the cheapest supplier in
    // one region by exact integer-micro unit price (Σprice_micro div Σqty
    // — deterministic integer division, never a double avg), argmin via a
    // part-partitioned rank with a suppkey tie-break. The (part, supplier)
    // aggregate is the only corpus shuffle; region membership broadcasts;
    // the rank window rides the part partitioning — no global sort
    "q185_cheapest_supplier" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val regSup = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region")
            .filter(col("r_name") === "AMERICA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      val parts15 = t(s, dir, "part").filter(col("p_size") === 15)
        .select(col("p_partkey"), col("p_name"))
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          ExactAgg.scaledLong(col("l_extendedprice"), 10000).as("price_micro"),
          col("l_quantity").cast("long").as("qty"))
        .join(broadcast(parts15), col("l_partkey") === col("p_partkey"))
        .join(broadcast(regSup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"))
        .agg(sum(col("price_micro")).as("sum_micro"), sum(col("qty")).as("sum_qty"))
        // a supplier whose lines sum to ZERO units has no unit price and
        // cannot win "cheapest" — and the ANSI div would throw on it;
        // filtering (not NULLing) also dodges the engines' opposite
        // NULLS FIRST/LAST defaults in the rank (adversarial sweep r9)
        .filter(col("sum_qty") > 0)
        .withColumn("unit_micro", expr("sum_micro div sum_qty"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("p_partkey"))
          .orderBy(col("unit_micro").asc, col("s_suppkey").asc)))
        .filter(col("rk") === 1)
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
          col("s_name"), col("unit_micro"))
    }),

    // §2.6 — TPC-H Q4 shape (round 5, adapted: no l_commitdate, so "late"
    // is shipped >60 days after the order date): orders placed in 1997Q1
    // with at least one late-shipped line, counted per priority. The
    // correlated EXISTS is an equi-join on orderkey with the date
    // predicate refined after — one orderkey shuffle of the quarter's
    // orders against lineitem, then a distinct + bounded priority rollup
    "q186_late_order_priority" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("date") &&
          col("o_orderdate") < lit("1997-04-01").cast("date"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("o_orderkey"), col("o_orderpriority")).distinct()
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q07_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
        |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
        |       CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_disc,
        |       count(*) AS count_order,
        |       sum(l_quantity) / count(*) AS avg_qty,
        |       (CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0) / count(*) AS avg_price,
        |       (CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0) / count(*) AS avg_disc
        |FROM lineitem
        |GROUP BY 1, 2""".stripMargin,

    "q08_top_parts_brand_month" ->
      """WITH c AS (
        |  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
        |         p_brand, l_partkey, count(*) AS cnt
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2, 3)
        |SELECT * FROM (
        |  SELECT month, p_brand, l_partkey, cnt,
        |         CAST(row_number() OVER (PARTITION BY month, p_brand
        |                                 ORDER BY cnt DESC, l_partkey ASC) AS BIGINT) AS "rank"
        |  FROM c) WHERE "rank" <= 3""".stripMargin,

    "q09_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation   ON c_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,

    "q10_priority_semijoin" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate)
        |GROUP BY 1""".stripMargin,

    // the salted join must produce exactly what the plain join produces
    "q27_salted_join" ->
      s"""SELECT c_mktsegment AS segment, count(*) AS n_events,
         |       $SumCents AS total_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY 1""".stripMargin,

    "q29_rollup_revenue" ->
      """SELECT r_name, n_name,
        |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation   ON c_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |HAVING count(*) > 0""".stripMargin,
        // HAVING count(*) > 0 is a no-op on any non-empty input (every
        // rollup group contains >= 1 row) but pins the EMPTY-input
        // contract: Spark's Expand-based rollup emits 0 rows on an empty
        // table, while ANSI emits the all-NULL grand-total row — the
        // engines genuinely diverge and the library's contract is the
        // Spark shape (adversarial sweep r9; EmptyInputSpec)

    "q30_running_revenue" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_cents,
        |         count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT month, n_orders,
        |       CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
        |       CAST(sum(rev_cents) OVER (ORDER BY month
        |              ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0 AS cum_revenue
        |FROM m""".stripMargin,

    "q31_anti_join" ->
      """SELECT c_mktsegment AS segment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |GROUP BY 1""".stripMargin,

    "q32_pivot_events" ->
      s"""$EnrichedCte
         |SELECT segment,
         |       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
         |       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
         |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
         |       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
         |       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error
         |FROM e GROUP BY 1""".stripMargin,

    "q37_percentiles" ->
      """SELECT event_type,
        |       quantile_cont((CASE WHEN isfinite(value) THEN value END), 0.5)  AS p50,
        |       quantile_cont((CASE WHEN isfinite(value) THEN value END), 0.9)  AS p90,
        |       quantile_cont((CASE WHEN isfinite(value) THEN value END), 0.99) AS p99
        |FROM events GROUP BY 1""".stripMargin,

    "q38_left_join_sparse" ->
      s"""SELECT coalesce(c_mktsegment, 'UNMATCHED') AS segment,
         |       count(*) AS n_events,
         |       $SumCents AS total_value
         |FROM events LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer
         |                       WHERE c_mktsegment = 'BUILDING') c
         |  ON user_id = c.c_custkey
         |GROUP BY 1""".stripMargin,

    "q39_setops" ->
      """WITH active AS (SELECT DISTINCT user_id AS k FROM events),
        |rich AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
        |SELECT
        |  (SELECT count(*) FROM (SELECT k FROM active INTERSECT SELECT k FROM rich)) AS n_active_rich,
        |  (SELECT count(*) FROM (SELECT k FROM rich EXCEPT SELECT k FROM active)) AS n_rich_inactive,
        |  (SELECT count(*) FROM (SELECT k FROM active UNION SELECT k FROM rich)) AS n_union""".stripMargin,

    "q40_histogram" ->
      s"""SELECT CASE WHEN isfinite(value)
         |            THEN CAST(floor(value / 50) AS BIGINT) END AS bucket,
         |       count(*) AS n_events,
         |       $SumCents AS total_value
         |FROM events GROUP BY 1""".stripMargin,

    // boolean-contract oracle (round 5): the exact aggregates must match
    // value-for-value, and the sketch-bound booleans must be TRUE — a
    // sketch estimate drifting out of its documented bound flips a column
    // and fails the hash compare, without the oracle ever needing the
    // engine-specific estimate itself
    "q41_sketches" ->
      """SELECT event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |       quantile_cont((CASE WHEN isfinite(value) THEN value END), 0.5) AS exact_p50,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       TRUE AS users_in_bound,
        |       TRUE AS p50_in_bound
        |FROM events GROUP BY 1""".stripMargin,

    "q42_asof_join" ->
      """WITH o AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |           FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, epoch_us(e.ts) AS ts_us, e.user_id,
        |       o.o_orderkey AS asof_o_orderkey,
        |       epoch_us(o.o_orderdate) AS asof_order_us
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,

    "q44_range_join_binned" ->
      """WITH iv AS (
        |  SELECT DISTINCT epoch_us(date_trunc('quarter', l_shipdate)) AS q_start_us
        |  FROM lineitem)
        |SELECT iv.q_start_us, count(*) AS n_items,
        |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
        |FROM lineitem l JOIN iv
        |  ON epoch_us(l.l_shipdate) >= iv.q_start_us
        | AND epoch_us(l.l_shipdate) < iv.q_start_us + 3888000000000
        |GROUP BY 1""".stripMargin,

    "q46_filtered_revenue" ->
      """SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q63_cube_kpis" ->
      s"""SELECT coalesce(event_type, 'ALL') AS event_type,
         |       CAST(coalesce(isodow(ts), -1) AS BIGINT) AS wd,
         |       count(*) AS n_events, $SumCents AS total_value
         |FROM events
         |GROUP BY CUBE(event_type, isodow(ts))
         |HAVING count(*) > 0""".stripMargin,
         // same empty-input contract as q29: no synthetic grand-total
         // row on an empty table (Spark semantics; EmptyInputSpec)

    "q64_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |r AS (SELECT user_id, d,
        |             row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
        |      FROM d)
        |SELECT user_id, min(d) AS streak_start, max(d) AS streak_end,
        |       count(*) AS streak_len
        |FROM r GROUP BY user_id, d - CAST(rn AS INT)""".stripMargin,

    // the Bloom prefilter is exact-join-equivalent by construction
    "q65_bloom_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1""".stripMargin,

    "q66_funnel" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t_view
        |           FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_click
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
        |      GROUP BY 1),
        |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
        |      GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view_users,
        |       (SELECT count(*) FROM c) AS n_click_users,
        |       (SELECT count(*) FROM p) AS n_purchase_users""".stripMargin,

    "q67_retention" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort FROM d GROUP BY 1)
        |SELECT f.cohort, CAST(d.d - f.cohort AS BIGINT) AS day_offset,
        |       count(DISTINCT d.user_id) AS n_users
        |FROM d JOIN f ON d.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin,

    "q69_zorder_values" ->
      s"""SELECT event_id,
         |       ${graft.functions.ZOrder.zValueSql(
                    "(user_id & 65535)", "(epoch_us(ts) // 86400000000)")} AS zval
         |FROM events""".stripMargin,

    "q72_below_avg_parts" ->
      """SELECT l_partkey, count(*) AS n_below
        |FROM lineitem l1
        |WHERE l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = l1.l_partkey)
        |GROUP BY l_partkey""".stripMargin,

    "q74_mad_stats" ->
      """WITH m AS (SELECT event_type, quantile_cont((CASE WHEN isfinite(value) THEN value END), 0.5) AS med
        |           FROM events GROUP BY 1),
        |d AS (SELECT e.event_type, m.med,
        |             abs((CASE WHEN isfinite(value) THEN value END) - m.med) AS dev
        |      FROM events e JOIN m USING (event_type))
        |SELECT event_type, med, quantile_cont(dev, 0.5) AS mad,
        |       count(*) AS n_events
        |FROM d GROUP BY 1, 2""".stripMargin,

    "q76_k_anonymity" ->
      """SELECT c_mktsegment, c_nationkey, count(*) AS group_size,
        |       count(*) < 12 AS below_k
        |FROM customer GROUP BY 1, 2""".stripMargin,

    "q78_reconcile_feeds" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n_events
        |           FROM events GROUP BY 1),
        |o AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n_orders
        |      FROM orders GROUP BY 1)
        |SELECT coalesce(e.d, o.d) AS d,
        |       coalesce(e.n_events, 0) AS n_events,
        |       coalesce(o.n_orders, 0) AS n_orders
        |FROM e FULL OUTER JOIN o ON e.d = o.d""".stripMargin,

    "q80_copurchase" ->
      """WITH up AS (
        |  SELECT DISTINCT o_custkey AS u, l_partkey AS p
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT a.p AS part_1, b.p AS part_2, count(*) AS n_users
        |FROM up a JOIN up b ON a.u = b.u AND a.p < b.p
        |GROUP BY 1, 2 ORDER BY n_users DESC, part_1, part_2 LIMIT 50""".stripMargin,

    "q82_revenue_share" ->
      """WITH rev AS (
        |  SELECT n_name,
        |         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS cents
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1)
        |SELECT n_name, CAST(cents AS DOUBLE) / 100.0 AS revenue,
        |       CAST(cents AS DOUBLE) / sum(cents) OVER () AS share
        |FROM rev""".stripMargin,

    "q87_supplier_league" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS cents
        |  FROM lineitem GROUP BY 1),
        |j AS (SELECT s_name, n_name, cents,
        |             avg(cents) OVER (PARTITION BY n_name) AS nation_avg_cents
        |      FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |      JOIN nation ON CAST(s_nationkey AS BIGINT) = n_nationkey)
        |SELECT s_name, n_name, CAST(cents AS DOUBLE) / 100.0 AS revenue,
        |       nation_avg_cents / 100.0 AS nation_avg_revenue
        |FROM j WHERE cents > nation_avg_cents""".stripMargin,

    "q89_volume_trend" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS x, count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |             sum(x * y) AS sxy, sum(x * x) AS sxx
        |      FROM daily GROUP BY 1)
        |SELECT event_type,
        |       CAST(n * sxy - sx * sy AS DOUBLE)
        |         / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |       n AS n_days
        |FROM m""".stripMargin,

    "q90_rolling_7d" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day_num, count(*) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT day_num, n_events,
        |       CAST(sum(n_events) OVER (ORDER BY day_num
        |         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
        |FROM daily""".stripMargin,

    "q73_ntile_deciles" ->
      """SELECT c_custkey, c_mktsegment,
        |       ntile(10) OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal, c_custkey) AS decile
        |FROM customer""".stripMargin,

    "q101_scd2_intervals" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events),
        |r AS (
        |  SELECT *, CASE WHEN lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts_us, event_id)
        |      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        |  FROM e),
        |s AS (
        |  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS run_id
        |  FROM r),
        |g AS (
        |  SELECT user_id, run_id, min(event_type) AS event_type,
        |         min(ts_us) AS valid_from_us,
        |         CAST(count(*) AS BIGINT) AS n_events
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id, run_id, event_type, valid_from_us,
        |       lead(valid_from_us) OVER (PARTITION BY user_id
        |                                 ORDER BY run_id) AS valid_to_us,
        |       n_events,
        |       lead(valid_from_us) OVER (PARTITION BY user_id
        |                                 ORDER BY run_id) IS NULL AS is_current
        |FROM g""".stripMargin,

    "q104_gap_fill" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events GROUP BY 1, 2),
        |spans AS (
        |  SELECT event_type, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1),
        |cal AS (
        |  SELECT event_type,
        |         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |           CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM spans)
        |SELECT c.event_type, c.day,
        |       COALESCE(d.n_events, 0) AS n_events,
        |       COALESCE(d.cents, 0) AS cents,
        |       last_value(d.cents IGNORE NULLS) OVER (
        |         PARTITION BY c.event_type ORDER BY c.day
        |         ROWS UNBOUNDED PRECEDING) AS cents_ffill
        |FROM cal c LEFT JOIN daily d
        |  ON c.event_type IS NOT DISTINCT FROM d.event_type
        | AND c.day = d.day""".stripMargin,

    "q105_interval_overlap" ->
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
        |SELECT a.user_id AS a_user_id, a.start_us AS a_start_us,
        |       b.user_id AS b_user_id, b.start_us AS b_start_us,
        |       least(a.end_us, b.end_us) - greatest(a.start_us, b.start_us)
        |         AS overlap_us
        |FROM sess a JOIN sess b
        |  ON a.user_id % 2 = 1 AND b.user_id % 2 = 0
        | AND a.start_us < b.end_us AND b.start_us < a.end_us""".stripMargin,

    "q107_type_transitions" ->
      """WITH p AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS from_type,
        |         event_type AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |      FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        |      FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        |       CAST(c.n AS DOUBLE) / t.n_from AS p
        |FROM c JOIN t USING (from_type)""".stripMargin,

    "q110_pagerank" -> pageRankOracleSql(3),

    "q111_rolling_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |x AS (
        |  SELECT user_id, day + CAST(unnest(generate_series(0, 6)) AS INTEGER) AS day
        |  FROM du)
        |SELECT x.day, CAST(count(DISTINCT x.user_id) AS BIGINT) AS u7
        |FROM x SEMI JOIN (SELECT DISTINCT day FROM du) d ON x.day = d.day
        |GROUP BY 1""".stripMargin,

    "q113_rfm_scores" ->
      """WITH a AS (
        |  SELECT o_custkey,
        |         max(o_orderdate) AS last_dt,
        |         CAST(count(*) AS BIGINT) AS freq,
        |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |j AS (SELECT a.*, c_nationkey FROM a JOIN customer ON o_custkey = c_custkey)
        |SELECT o_custkey AS custkey, c_nationkey AS nationkey,
        |       CAST(ntile(4) OVER (PARTITION BY c_nationkey
        |                           ORDER BY last_dt, o_custkey) AS BIGINT) AS r_score,
        |       CAST(ntile(4) OVER (PARTITION BY c_nationkey
        |                           ORDER BY freq, o_custkey) AS BIGINT) AS f_score,
        |       CAST(ntile(4) OVER (PARTITION BY c_nationkey
        |                           ORDER BY cents, o_custkey) AS BIGINT) AS m_score,
        |       CAST(ntile(4) OVER (PARTITION BY c_nationkey
        |                           ORDER BY last_dt, o_custkey) AS BIGINT) * 100 +
        |       CAST(ntile(4) OVER (PARTITION BY c_nationkey
        |                           ORDER BY freq, o_custkey) AS BIGINT) * 10 +
        |       CAST(ntile(4) OVER (PARTITION BY c_nationkey
        |                           ORDER BY cents, o_custkey) AS BIGINT) AS rfm_cell
        |FROM j""".stripMargin,

    "q117_attribution" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |  FROM events),
        |t AS (
        |  SELECT *,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_type,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN ts_us END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_us
        |  FROM e)
        |SELECT coalesce(CASE WHEN ts_us - lt_us <= 604800000000 THEN lt_type END,
        |                'unattributed') AS channel,
        |       CAST(count(*) AS BIGINT) AS n_conversions,
        |       CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT) AS cents
        |FROM t
        |WHERE event_type = 'purchase'
        |GROUP BY 1""".stripMargin,

    "q118_grouping_sets" ->
      """SELECT CAST(GROUPING(lang) * 2 + GROUPING(source) AS BIGINT) AS gid,
        |       coalesce(lang, 'ALL') AS lang,
        |       coalesce(source, 'ALL') AS source,
        |       count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |GROUP BY GROUPING SETS ((lang, source), (lang), (source))""".stripMargin,

    "q119_lift_cells" ->
      """WITH c AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS obs
        |  FROM documents GROUP BY 1, 2)
        |SELECT source, lang, obs,
        |       CAST(sum(obs) OVER (PARTITION BY source) AS BIGINT) AS n_source,
        |       CAST(sum(obs) OVER (PARTITION BY lang) AS BIGINT) AS n_lang,
        |       CAST((((obs * 1000000)
        |              // (sum(obs) OVER (PARTITION BY source)))
        |             * (sum(obs) OVER ()))
        |            // (sum(obs) OVER (PARTITION BY lang)) AS BIGINT)
        |         AS lift_micro
        |FROM c""".stripMargin,

    "q122_mode_per_group" ->
      """WITH c AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |            ORDER BY cnt DESC, event_type DESC) AS rn
        |  FROM c)
        |SELECT user_id, event_type AS mode_type, cnt
        |FROM r WHERE rn = 1""".stripMargin,

    "q123_large_volume_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
        |SELECT c_custkey, c_name, o_orderkey,
        |       CAST(o_orderdate AS DATE) AS order_date,
        |       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents,
        |       total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q124_sole_culprit_suppliers" ->
      """WITH culprit AS (
        |  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
        |  FROM lineitem l1
        |  WHERE l1.l_returnflag = 'R'
        |    AND EXISTS (SELECT 1 FROM lineitem l2
        |                WHERE l2.l_orderkey = l1.l_orderkey
        |                  AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                    WHERE l3.l_orderkey = l1.l_orderkey
        |                      AND l3.l_suppkey <> l1.l_suppkey
        |                      AND l3.l_returnflag = 'R'))
        |SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM culprit JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1, 2""".stripMargin,

    // the long form directly — the pivot→unpivot round trip must land here
    "q125_unpivot_events" ->
      """SELECT CAST(ts AS DATE) AS event_date, event_type,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM events
        |WHERE event_type IN ('click','view','purchase','signup','error')
        |GROUP BY 1, 2""".stripMargin,
        // the IN list pins the operator's contract, not a workaround: a
        // pivot over a FIXED value list only materializes the listed
        // values, so its unpivot roundtrip cannot (and should not)
        // resurrect rows for unlisted or NULL types (adversarial r9)

    "q126_purchase_cadence" ->
      """WITH p AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                 ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
        |       (max(us) - min(us)) // 1000000 AS span_s,
        |       min((us - prev) // 1000000) AS min_gap_s,
        |       max((us - prev) // 1000000) AS max_gap_s
        |FROM p GROUP BY 1 HAVING count(*) >= 2""".stripMargin,

    "q130_rank_stats" ->
      """SELECT s_suppkey, s_nationkey,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd,
        |       nth_value(s_name, 3) OVER w AS third_name
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey
        |             ORDER BY s_acctbal, s_suppkey)""".stripMargin,

    "q132_skew_report" ->
      """WITH c AS (
        |  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1)
        |SELECT k, n AS n_left, n AS n_right, n * n AS cost
        |FROM c ORDER BY cost DESC, k LIMIT 20""".stripMargin,

    "q136_pearson_corr" ->
      """WITH g AS (
        |  SELECT event_type,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM (SELECT event_type,
        |               CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT) AS x,
        |               (epoch_us(ts) // 3600000000) % 24 AS y
        |        FROM events WHERE value IS NOT NULL)
        |  GROUP BY event_type)
        |SELECT event_type, n,
        |       CAST(n * sxy - sx * sy AS DOUBLE) /
        |         (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |          sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
        |FROM g""".stripMargin,

    "q137_pareto_revenue" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |              AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT *, row_number() OVER (ORDER BY cents DESC, o_custkey) AS rnk,
        |         count(*) OVER () AS n
        |  FROM rev),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |         CAST(sum(CASE WHEN rnk * 10 <= n THEN 1 ELSE 0 END) AS BIGINT)
        |           AS top_decile_n,
        |         CAST(sum(CASE WHEN rnk * 10 <= n THEN cents ELSE 0 END)
        |              AS BIGINT) AS top_cents,
        |         CAST(sum(cents) AS BIGINT) AS total_cents
        |  FROM r)
        |SELECT *, (top_cents * 1000000) // total_cents AS share_micro
        |FROM a""".stripMargin,

    "q138_conversion_latency" ->
      """WITH u AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
        |           AS first_signup,
        |         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        |           AS first_purchase
        |  FROM events GROUP BY 1),
        |l AS (
        |  SELECT (first_purchase - first_signup) // 3600000000 AS latency_h
        |  FROM u
        |  WHERE first_signup IS NOT NULL
        |    AND first_purchase >= first_signup)
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |       min(latency_h) AS min_h, max(latency_h) AS max_h,
        |       quantile_cont(latency_h, 0.5) AS median_h
        |FROM l""".stripMargin,

    "q146_chi_cells" ->
      """WITH c AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
        |  FROM documents GROUP BY 1, 2)
        |SELECT lang, source, obs,
        |       CAST(sum(obs) OVER (PARTITION BY lang) AS BIGINT) AS row_tot,
        |       CAST(sum(obs) OVER (PARTITION BY source) AS BIGINT) AS col_tot,
        |       CAST(sum(obs) OVER () AS BIGINT) AS n,
        |       CAST(obs * sum(obs) OVER ()
        |            - sum(obs) OVER (PARTITION BY lang)
        |              * sum(obs) OVER (PARTITION BY source)
        |            AS BIGINT) AS dev
        |FROM c""".stripMargin,

    "q147_autocorr" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT n, lag(n) OVER (ORDER BY d) AS prev FROM daily),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(sum(prev) AS BIGINT) AS sx,
        |         CAST(sum(n) AS BIGINT) AS sy,
        |         CAST(sum(prev * n) AS BIGINT) AS sxy,
        |         CAST(sum(prev * prev) AS BIGINT) AS sxx,
        |         CAST(sum(n * n) AS BIGINT) AS syy
        |  FROM p WHERE prev IS NOT NULL)
        |SELECT n_pairs, sx, sy, sxy, sxx, syy,
        |       CAST(n_pairs * sxy - sx * sy AS BIGINT) AS num,
        |       CAST(n_pairs * sxx - sx * sx AS BIGINT) AS den_x,
        |       CAST(n_pairs * syy - sy * sy AS BIGINT) AS den_y
        |FROM s""".stripMargin,

    "q148_benford" ->
      """WITH d AS (
        |  SELECT substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |                     AS VARCHAR), 1, 1) AS digit,
        |         CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT digit, n_orders,
        |       CAST((1000 * n_orders) // sum(n_orders) OVER () AS BIGINT)
        |         AS permille
        |FROM d""".stripMargin,

    "q151_l_diversity" ->
      """WITH e AS (
        |  SELECT CAST(ts AS DATE) AS event_date, c_mktsegment AS segment,
        |         event_type
        |  FROM events JOIN customer ON user_id = c_custkey)
        |SELECT event_date, segment, CAST(count(*) AS BIGINT) AS group_size,
        |       CAST(count(DISTINCT event_type) AS BIGINT) AS l_div,
        |       count(DISTINCT event_type) < 3 AS below_l
        |FROM e GROUP BY 1, 2""".stripMargin,

    "q152_weekday_mix" ->
      """WITH c AS (
        |  SELECT CAST(isodow(CAST(ts AS DATE)) - 1 AS BIGINT) AS dow,
        |         event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT dow, event_type, n,
        |       CAST(sum(n) OVER (PARTITION BY dow) AS BIGINT) AS dow_total,
        |       CAST((1000 * n) // sum(n) OVER (PARTITION BY dow) AS BIGINT)
        |         AS permille
        |FROM c""".stripMargin,

    "q153_rrf_fusion" ->
      """WITH a AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |              AS BIGINT) AS rev_cents,
        |         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |  FROM lineitem GROUP BY 1),
        |r AS (
        |  SELECT l_partkey,
        |         CAST(row_number() OVER (ORDER BY rev_cents DESC, l_partkey)
        |              AS BIGINT) AS rank_rev,
        |         CAST(row_number() OVER (ORDER BY n_orders DESC, l_partkey)
        |              AS BIGINT) AS rank_ord
        |  FROM a)
        |SELECT l_partkey, rank_rev, rank_ord,
        |       1e0 / (60 + rank_rev) + 1e0 / (60 + rank_ord) AS rrf
        |FROM r ORDER BY rrf DESC, l_partkey LIMIT 20""".stripMargin,

    // the oracle counts the same triangle set via the naive id-ordered
    // three-way edge join (a < b < c, each triangle once)
    "q154_triangles" ->
      """WITH po AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM po x JOIN po y ON x.o = y.o AND x.p < y.p),
        |tr AS (
        |  SELECT e1.a, e1.b, e2.b AS c
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |       JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |n AS (
        |  SELECT a AS node FROM tr
        |  UNION ALL SELECT b FROM tr
        |  UNION ALL SELECT c FROM tr)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM n GROUP BY 1 ORDER BY 2 DESC, 1 ASC LIMIT 10""".stripMargin,

    "q156_skyline" ->
      """WITH a AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |              AS BIGINT) AS rev_cents,
        |         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey, rev_cents, n_orders
        |FROM a x
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM a y
        |  WHERE y.rev_cents >= x.rev_cents AND y.n_orders >= x.n_orders
        |    AND (y.rev_cents > x.rev_cents OR y.n_orders > x.n_orders))""".stripMargin,

    "q157_basket_rules" ->
      """WITH po AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |tot AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM po),
        |item AS (SELECT p, CAST(count(*) AS BIGINT) AS n_item FROM po
        |         GROUP BY 1),
        |pr AS (
        |  SELECT x.p AS pa, y.p AS pb, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM po x JOIN po y ON x.o = y.o AND x.p < y.p
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |rules AS (
        |  SELECT pa AS ante, pb AS cons, n_ab FROM pr
        |  UNION ALL SELECT pb, pa, n_ab FROM pr)
        |SELECT ante, cons, n_ab, ia.n_item AS n_ante, ic.n_item AS n_cons,
        |       tot.n AS n,
        |       CAST((1000000 * n_ab) // tot.n AS BIGINT) AS support_micro,
        |       CAST((1000000 * n_ab) // ia.n_item AS BIGINT) AS conf_micro,
        |       CAST((1000000 * n_ab * tot.n) // (ia.n_item * ic.n_item)
        |            AS BIGINT) AS lift_micro
        |FROM rules JOIN item ia ON rules.ante = ia.p
        |     JOIN item ic ON rules.cons = ic.p
        |     CROSS JOIN tot""".stripMargin,

    "q158_shipping_priority" ->
      """SELECT l_orderkey,
        |       CAST(o_orderdate AS DATE) AS order_date,
        |       o_orderpriority,
        |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |                * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_micro
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < DATE '1997-07-01'
        |  AND l_shipdate > DATE '1997-07-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_micro DESC, l_orderkey
        |LIMIT 10""".stripMargin,

    "q159_local_supplier_volume" ->
      """SELECT n_name,
        |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |                * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0
        |         AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |             AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01'
        |  AND o_orderdate < DATE '1997-01-01'
        |GROUP BY 1""".stripMargin,

    "q160_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |                * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_micro
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= DATE '1996-10-01'
        |  AND o_orderdate < DATE '1997-01-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue_micro DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q161_promo_revenue" ->
      """WITH g AS (
        |  SELECT
        |    CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |          THEN CAST(floor(l_extendedprice * (1.0 - l_discount)
        |               * 10000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS promo_micro,
        |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |         * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS total_micro
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= DATE '1997-03-01'
        |    AND l_shipdate < DATE '1997-04-01')
        |SELECT promo_micro, total_micro,
        |       CAST(promo_micro AS DOUBLE) * 100.0
        |         / CAST(total_micro AS DOUBLE) AS promo_share
        |FROM g""".stripMargin,

    "q162_nation_volume" ->
      """SELECT sn.n_name AS supp_nation,
        |       cn.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |                * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_micro
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE sn.n_name IN ('NATION_3', 'NATION_7')
        |  AND cn.n_name IN ('NATION_3', 'NATION_7')
        |  AND sn.n_name <> cn.n_name
        |  AND l_shipdate >= DATE '1996-01-01'
        |  AND l_shipdate < DATE '1998-01-01'
        |GROUP BY 1, 2, 3""".stripMargin,

    "q163_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(sum(CASE WHEN n2.n_name = 'NATION_5'
        |         THEN CAST(floor(l_extendedprice * (1.0 - l_discount)
        |              * 10000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
        |         AS nation_micro,
        |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |            * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS total_micro,
        |       (CAST(sum(CASE WHEN n2.n_name = 'NATION_5'
        |          THEN CAST(floor(l_extendedprice * (1.0 - l_discount)
        |               * 10000 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
        |        * 1000000)
        |       // CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |            * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS share_ppm
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type LIKE 'STANDARD%'
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01'
        |  AND o_orderdate < DATE '1998-01-01'
        |GROUP BY 1""".stripMargin,

    "q164_small_qty_revenue" ->
      """WITH b AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#23'),
        |s AS (
        |  SELECT l_partkey AS sp_partkey,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM b GROUP BY 1),
        |f AS (
        |  SELECT CAST(sum(CAST(floor(l_extendedprice * 10000 + 0.5)
        |           AS BIGINT)) AS BIGINT) AS total_micro
        |  FROM b JOIN s ON l_partkey = sp_partkey
        |  WHERE CAST(l_quantity AS BIGINT) * 5 * cnt < sum_qty)
        |SELECT total_micro, total_micro // 7 AS avg_yearly_micro FROM f""".stripMargin,

    "q165_disjunct_revenue" ->
      """SELECT CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |            * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_micro,
        |       CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |         AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |         AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
        |         AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q166_idle_customers" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        |  FROM customer),
        |p AS (
        |  SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_cents,
        |         CAST(count(*) AS BIGINT) AS n_pos
        |  FROM c WHERE bal_cents > 0)
        |SELECT n_name,
        |       CAST(count(*) AS BIGINT) AS n_cust,
        |       CAST(sum(bal_cents) AS BIGINT) AS total_cents
        |FROM c JOIN nation ON c_nationkey = n_nationkey, p
        |WHERE bal_cents * n_pos > sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= DATE '2000-01-01')
        |GROUP BY 1""".stripMargin,

    "q185_cheapest_supplier" ->
      """WITH rs AS (
        |  SELECT s_suppkey, s_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'AMERICA'),
        |agg AS (
        |  SELECT p_partkey, p_name, s_suppkey, s_name,
        |         CAST(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT))
        |           AS BIGINT) AS sum_micro,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_size = 15
        |  JOIN rs ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2, 3, 4),
        |rk AS (
        |  SELECT *, sum_micro // sum_qty AS unit_micro,
        |         row_number() OVER (PARTITION BY p_partkey
        |           ORDER BY sum_micro // sum_qty ASC, s_suppkey ASC) AS rk
        |  FROM agg WHERE sum_qty > 0)
        |SELECT p_partkey, p_name, s_suppkey, s_name, unit_micro
        |FROM rk WHERE rk = 1""".stripMargin,

    "q186_late_order_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= DATE '1997-01-01'
        |  AND o_orderdate < DATE '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1""".stripMargin,
  )
}
