package graft

import graft.functions.ExactAgg
import graft.operators._
import graft.sources.CsvSource
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import SparkEntryShared._

/** relational/OLAP analytics queries, part 3 of 3 (SURVEY §2.6) — one `queries` entry per SURVEY §2 item, with its
  * DuckDB oracle twin in `oracleSql`. Moved verbatim from the
  * single-file SparkEntry in round 6; SparkEntry concatenates
  * the per-family maps, so names/plans/oracles are unchanged.
  */
private[graft] object SparkEntryAnalytics3 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.6 — quantile treatment effects (round 5: q115's mean lift
    // widened to the DISTRIBUTION — the A/B delta at Q1/median/Q3, the
    // "did the treatment move the tail or just the middle?" readout.
    // Exact despite interpolation: quartile positions are dyadic, so
    // 4·quantile is an exact double on integer cents (the q290
    // argument) — every ×4 quantile and every delta is a
    // hash-identical BIGINT. Variant = user parity, like q115/q287
    "q292_quantile_effects" -> ((s, dir) => {
      val e = events(s, dir).filter(col("value").isNotNull)
        .select((col("user_id") % 2 === 0).as("is_a"),
          graft.functions.ExactAgg.cents(col("value")).as("cents"))
      val byV = e.groupBy(col("is_a"))
        .agg(count(lit(1)).as("n"),
          (percentile(col("cents"), lit(0.25)) * 4).cast("long").as("q1"),
          (percentile(col("cents"), lit(0.5)) * 4).cast("long").as("q2"),
          (percentile(col("cents"), lit(0.75)) * 4).cast("long").as("q3"))
      val a = byV.filter(col("is_a"))
        .select(col("n").as("n_a"), col("q1").as("a1"),
          col("q2").as("a2"), col("q3").as("a3"))
      val b = byV.filter(!col("is_a"))
        .select(col("n").as("n_b"), col("q1").as("b1"),
          col("q2").as("b2"), col("q3").as("b3"))
      a.crossJoin(b) // 1×1
        .select(expr("stack(3," +
          " 250, a1, b1, a1 - b1," +
          " 500, a2, b2, a2 - b2," +
          " 750, a3, b3, a3 - b3" +
          ") AS (quantile_permille, a_x4, b_x4, effect_x4)"))
    }),

    // §2.6 — FIRST-touch attribution (round 5: completing the
    // attribution triad — q117 credits the LAST touch, q182 splits
    // LINEARLY, this credits the user's first-ever touch (the
    // acquisition-channel view, classically unbounded); q117's exact
    // window machinery with first() in place of last()
    "q293_first_touch" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      events(s, dir)
        .withColumn("ft_type",
          first(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("channel", coalesce(col("ft_type"), lit("unattributed")))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_conversions"),
          sum(expr("CAST((CASE WHEN abs(value) <= 1.7976931348623157E308 " +
            "THEN floor(value * 100 + 0.5) END) AS BIGINT)")).as("cents"))
    }),

    // §2.6 — per-nation revenue Gini (round 5: q184's global scalar
    // made a GROUPED report — within-nation customer inequality, the
    // drill-down that says whether concentration is global or local.
    // Same exact formula G = (2Σ(i·xᵢ) − (n+1)Σx)/(n·Σx) with the rank
    // window PARTITIONED by nation over the customer aggregate; permille
    // (not micro) is the int64 headroom at 10× rows
    "q288_gini_by_nation" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byC = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nation"), col("o_custkey"))
        .agg(sum(ExactAgg.cents(col("o_totalprice"))).as("x"))
      val w = Window.partitionBy(col("nation"))
        .orderBy(col("x").asc, col("o_custkey").asc)
      byC.withColumn("i", row_number().over(w).cast("long"))
        .groupBy(col("nation"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("i") * col("x")).as("six"))
        .select(col("nation"), col("n"),
          expr("(1000 * (2 * six - (n + 1) * sx)) div (n * sx)")
            .as("gini_permille"))
    }),

    // §2.6 — Hoover (Robin Hood) index per the same frame (round 5: the
    // "share of revenue that would have to move to equalize customers"
    // — the transfer-interpretable inequality measure beside Gini/HHI.
    // Deviations work on ppm-floored shares (the q271 headroom trick):
    // hoover_ppm = Σ|n·share_ppm − 1e6| div (2n), deterministic and
    // identical in both engines
    "q289_hoover_index" -> ((s, dir) => {
      val byC = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(ExactAgg.cents(col("o_totalprice"))).as("c"))
      val tot = byC.agg(sum(col("c")).as("total"),
        count(lit(1)).as("n"))
      byC.crossJoin(broadcast(tot))
        .select(col("n"),
          abs(col("n") * expr("(1000000 * c) div total") - lit(1000000L))
            .as("dev"))
        .groupBy(col("n")).agg(sum(col("dev")).as("dev_sum"))
        .select(col("n"),
          expr("dev_sum div (2 * n)").as("hoover_ppm"))
    }),

    // §2.6 — quartile coefficient of dispersion (round 5: the robust
    // relative-spread measure (Q3−Q1)/(Q3+Q1) per market segment on
    // order totals — EXACT despite interpolation because quartile
    // positions are dyadic: 4·quantile = 3a+b (or a+3b) is an exact
    // double on integer cents in BOTH engines, so the ×4 quartiles are
    // hash-identical BIGINTs and the coefficient is one integer
    // permille division
    "q290_quartile_dispersion" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"),
          ExactAgg.cents(col("o_totalprice")).as("cents"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          (percentile(col("cents"), lit(0.25)) * 4).cast("long")
            .as("q1_x4"),
          (percentile(col("cents"), lit(0.75)) * 4).cast("long")
            .as("q3_x4"))
        .withColumn("qcd_permille",
          expr("(1000 * (q3_x4 - q1_x4)) div (q3_x4 + q1_x4)"))
    }),

    // §2.6 — sample-ratio-mismatch guardrail (round 5: the
    // experimentation health check run before ANY A/B readout — per
    // day, the user-parity variant counts and the exact chi-square
    // numerator (n_a − n_b)² against the 4·(n_a+n_b) bound (≈ |z| > 2
    // under the 50/50 null, cross-multiplied so no division); a
    // triggered day means assignment is broken and q115's lift numbers
    // are meaningless — the guardrail BEFORE the test
    "q287_srm_guardrail" -> ((s, dir) => {
      events(s, dir)
        .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
        .groupBy(col("d"))
        .agg(
          sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("n_b"))
        .withColumn("dev2", (col("n_a") - col("n_b"))
          * (col("n_a") - col("n_b")))
        .withColumn("srm_flag",
          col("dev2") > lit(4L) * (col("n_a") + col("n_b")))
    }),

    // §2.6 — ACF correlogram (round 5: q147's lag-1 autocorrelation
    // widened to the lags-1..10 PROFILE — the correlogram an ARIMA
    // order selection reads. A ×10 lag fan-out on the bounded day frame
    // (each lag's pairs via one shared sorted window pass, the lag
    // domain a broadcast 10-row frame), per-lag exact integer moments
    // and the q147 cross-multiplied numerator/denominators; the one
    // deterministic double at the end
    "q283_correlogram" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
        .withColumn("i", row_number()
          .over(Window.orderBy(col("d"))).cast("long"))
        .localCheckpoint() // both sides of the lag self-join
      val lags = s.range(1, 11).select(col("id").as("lag"))
      daily.as("a").crossJoin(broadcast(lags))
        .join(daily.as("b"), col("b.i") === col("a.i") + col("lag"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("a.n")).as("sx"), sum(col("b.n")).as("sy"),
          sum(col("a.n") * col("b.n")).as("sxy"),
          sum(col("a.n") * col("a.n")).as("sxx"),
          sum(col("b.n") * col("b.n")).as("syy"))
        .select(col("lag"), col("n_pairs"),
          (col("n_pairs") * col("sxy") - col("sx") * col("sy")).as("num"),
          expr("CAST(n_pairs * sxy - sx * sy AS DOUBLE)" +
            " / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))" +
            " * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)))").as("acf"))
    }),

    // §2.6 — return-rate trend (round 5: the product-quality time
    // series — per order quarter, returned-line revenue share in exact
    // permille; the temporal view of q160's returned-item snapshot,
    // feeding the forecast/changepoint family. One conditional
    // aggregate over the lineitem⋈orders join, quarter from exact
    // date_trunc on both engines
    "q281_return_rate_trend" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(date_trunc("quarter", col("o_orderdate")).cast("date")
          .as("q"))
        .agg(
          sum(ExactAgg.cents(
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("total_cents"),
          sum(when(col("l_returnflag") === "R",
            ExactAgg.cents(
              col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .otherwise(0L)).as("returned_cents"))
        .withColumn("return_share_permille",
          expr("(1000 * returned_cents) div total_cents"))
    }),

    // §2.6 — longest per-user silence (round 5: the dormancy depth
    // behind q180's reactivation screen — each user's LONGEST gap
    // between consecutive events in seconds, top-20 by gap; one
    // per-user lag window + max, exact epoch-second arithmetic,
    // full tie-break (gap desc, user asc) so the cut is deterministic
    "q282_longest_silence" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"))
        .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .groupBy(col("user_id"))
        .agg(max(col("gap_us")).as("max_gap_us"),
          count(lit(1)).as("n_gaps"))
        .orderBy(col("max_gap_us").desc, col("user_id").asc)
        .limit(20)
    }),

    // §2.6 — rolling-band anomaly flags (round 5: the Bollinger-style
    // volatility breakout detector on daily revenue — a day is flagged
    // when it leaves the ±2σ band of the TRAILING 7-day window, and the
    // whole test stays EXACT integer arithmetic because the band check
    // cross-multiplies instead of rooting: |x − S/7| > 2σ ⟺
    // (7x − S)² > 4·(7Q − S²) with S = Σx, Q = Σx² over the window.
    // Trailing (not centered) so the flag is computable on arrival day;
    // first 6 days have no full window and drop out identically
    "q278_rolling_band_anomaly" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("d")).rowsBetween(-7, -1)
      events(s, dir).filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(graft.functions.ExactAgg.cents(col("value"))).as("x"))
        .withColumn("nw", count(lit(1)).over(w))
        .withColumn("s", sum(col("x")).over(w))
        .withColumn("q", sum(col("x") * col("x")).over(w))
        .filter(col("nw") === 7) // full trailing window only
        .select(col("d"), col("x"), col("s"),
          ((col("x") * 7 - col("s")) * (col("x") * 7 - col("s"))).as("dev2_x49"),
          (lit(4L) * (col("q") * 7 - col("s") * col("s"))).as("band2_x49"))
        .withColumn("is_anomaly", col("dev2_x49") > col("band2_x49"))
    }),

    // §2.6 — one-sample KS uniformity test (round 5: "is traffic
    // uniform across the day?" — the empirical CDF of event
    // minute-of-day against the THEORETICAL uniform CDF, the one-sample
    // complement of q218/q223's two-sample machinery. Exact by
    // cross-multiplication: at minute m with cumulative count c,
    // D·(n·1440) = max |1440·c − n·(m+1)| — all BIGINTs on the bounded
    // |minutes| frame; the report row carries the argmax minute with
    // earliest tie-break
    "q279_ks_uniformity" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byMin = events(s, dir)
        .select(((hour(col("ts")) * 60) + minute(col("ts")))
          .cast("long").as("m"))
        .groupBy(col("m")).agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("m"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byMin
        .withColumn("cum", sum(col("c")).over(w))
        .crossJoin(broadcast(byMin.agg(sum(col("c")).as("n"))))
        .select(col("m"), col("cum"), col("n"),
          abs(col("cum") * 1440 - col("n") * (col("m") + 1))
            .as("d_scaled"))
        .orderBy(col("d_scaled").desc, col("m").asc)
        .limit(1)
    }),

    // §2.6 — Kendall's tau-b between two daily series (round 5: the
    // rank-association test between volume and revenue — concordant /
    // discordant / tied pair counts, ALL exact integers from the
    // bounded day frame's self-join (|days|² pairs — a frame, not the
    // fact table). Distinct from Spearman q172 (rank Pearson) and
    // Mann-Kendall q215 (Kendall vs time); tau-b's denominator needs
    // sqrt, so the output carries the exact counts and the one
    // deterministic double
    "q277_kendall_tau" -> ((s, dir) => {
      val daily = events(s, dir).filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("x"),
          sum(graft.functions.ExactAgg.cents(col("value"))).as("y"))
        .localCheckpoint() // both sides of the bounded pair join
      val pairs = daily.as("a").join(daily.as("b"),
          col("a.d") < col("b.d"))
        .select((col("a.x") - col("b.x")).as("dx"),
          (col("a.y") - col("b.y")).as("dy"))
      pairs.agg(
          count(lit(1)).as("n_pairs"),
          // count(when(...)) not sum(when(...)): identical on any
          // non-empty pair set, but an EMPTY one (empty events, or a
          // single-day calendar with no cross-day pairs) must report
          // ZERO pair counts, not NULL — sum over empty is NULL on
          // both engines while the DuckDB oracle's count FILTER is 0
          // (adversarial sweep r9; pinned in EmptyInputSpec)
          count(when(col("dx") * col("dy") > 0, lit(1))).as("concordant"),
          count(when(col("dx") * col("dy") < 0, lit(1))).as("discordant"),
          // tau-b convention: n1/n2 count ALL pairs tied in that
          // variable (both-tied pairs count in each)
          count(when(col("dx") === 0, lit(1))).as("ties_x"),
          count(when(col("dy") === 0, lit(1))).as("ties_y"))
        .withColumn("tau_b",
          // nullif: 0 pairs (or all-tied) makes the denominator 0 —
          // ANSI div throws where the contract is NULL (undefined tau)
          expr("CAST(concordant - discordant AS DOUBLE)" +
            " / nullif(sqrt(CAST(n_pairs - ties_x AS DOUBLE))" +
            " * sqrt(CAST(n_pairs - ties_y AS DOUBLE)), 0.0)"))
    }),

    // §2.6 — new-vs-repeat revenue mix (round 5: the loyalty trend —
    // per order year, revenue split by whether the order is the
    // customer's FIRST-ever vs a repeat, with the repeat share in exact
    // permille; the acquisition-vs-retention read behind q67/q180. One
    // per-customer min-date window, then a year-grain conditional
    // aggregate — first orders on the min DATE all count as first (a
    // same-day tie is genuinely the first day)
    "q273_new_vs_repeat" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders")
        .withColumn("first_date", min(col("o_orderdate"))
          .over(Window.partitionBy(col("o_custkey"))))
      o.groupBy(year(col("o_orderdate")).cast("long").as("y"))
        .agg(
          sum(when(col("o_orderdate") === col("first_date"),
            ExactAgg.cents(col("o_totalprice"))).otherwise(0L))
            .as("new_cents"),
          sum(when(col("o_orderdate") =!= col("first_date"),
            ExactAgg.cents(col("o_totalprice"))).otherwise(0L))
            .as("repeat_cents"))
        .withColumn("repeat_share_permille",
          expr("(1000 * repeat_cents) div (new_cents + repeat_cents)"))
    }),

    // §2.6 — relative price dispersion (round 5: the coefficient of
    // variation per part type — stddev/mean of unit retail prices from
    // EXACT integer moments (n, Σx, Σx²), with the one IEEE sqrt and
    // division at the end (q237's convention: correctly-rounded double
    // ops over exact integers hash-match across engines). Population
    // variance via the cross-multiplied form n·Σx² − (Σx)²
    "q274_price_dispersion" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_type"),
          ExactAgg.cents(col("p_retailprice")).as("x"))
        .groupBy(col("p_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("p_type"), col("n"),
          expr("sx div n").as("mean_cents"),
          expr("sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)" +
            " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))" +
            " / CAST(sx AS DOUBLE)").as("cv"))
    }),

    // §2.6 — maximum drawdown (round 5: the finance-style worst
    // peak-to-trough fall of the cumulative daily revenue series — one
    // cumulative-sum window, one cumulative-max window over it, and the
    // argmax row of (peak − value), all exact integer cents on the
    // bounded day frame with earliest-day tie-break
    "q275_max_drawdown" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir).filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(graft.functions.ExactAgg.cents(col("value"))).as("cents"))
        .withColumn("cum_cents", sum(col("cents")).over(w))
        .withColumn("peak_cents", max(col("cum_cents")).over(w))
        .withColumn("drawdown_cents", col("peak_cents") - col("cum_cents"))
        .orderBy(col("drawdown_cents").desc, col("d").asc)
        .limit(1)
        .select(col("d"), col("cum_cents"), col("peak_cents"),
          col("drawdown_cents"))
    }),

    // §2.6 — revenue concentration HHI (round 5: the antitrust-style
    // Herfindahl index over customer revenue shares, the square-law
    // companion to q184's Gini and q137's Pareto — HHI = Σ share_i².
    // total² (and even 1e6·c²) overflow int64 at catalog scale, so each
    // customer's share floors to ppm FIRST and the squares sum from
    // there: hhi_ppm = (Σ share_ppm²) div 1e6 — floor-per-customer, but
    // DETERMINISTIC and identical in both engines, with bias bounded by
    // ~2·n_customers·max_share ppm² (sub-ppm here; documented, not
    // hidden)
    "q271_revenue_hhi" -> ((s, dir) => {
      val byC = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(ExactAgg.cents(col("o_totalprice"))).as("c"))
      val tot = byC.agg(sum(col("c")).as("total"),
        count(lit(1)).as("n_customers"))
      byC.crossJoin(broadcast(tot))
        .select(col("n_customers"), col("total"),
          expr("(1000000 * c) div total").as("share_ppm"))
        .groupBy(col("n_customers"), col("total"))
        .agg(sum(col("share_ppm") * col("share_ppm")).as("sq_sum"))
        .select(col("n_customers"), col("total"),
          expr("sq_sum div 1000000").as("hhi_ppm"))
    }),

    // §2.6 — Simpson's-paradox screen (round 5: nations where the
    // within-nation quantity↔price association runs AGAINST the pooled
    // direction — the aggregation-reversal audit that decides whether a
    // pooled correlation is even meaningful. Only the SIGN of the
    // covariance numerator n·Σxy − Σx·Σy is needed, which is exact
    // BIGINT arithmetic (no sqrt, no variance): one conditional-sum
    // pass at nation grain + a 1-row pooled broadcast; prices in whole
    // dollars for int64 headroom at 10× rows
    "q272_simpsons_flip" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey").as("nation"),
          floor(col("l_quantity") + lit(0.5)).cast("long").as("x"),
          expr("CAST(floor(l_extendedprice + 0.5) AS BIGINT)").as("y"))
      val g = li.groupBy(col("nation"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"))
        .withColumn("group_cov_num",
          col("n") * col("sxy") - col("sx") * col("sy"))
      val pooled = g.agg(sum(col("n")).as("pn"), sum(col("sx")).as("psx"),
          sum(col("sy")).as("psy"), sum(col("sxy")).as("psxy"))
        .select((col("pn") * col("psxy") - col("psx") * col("psy"))
          .as("pooled_cov_num"))
      g.crossJoin(broadcast(pooled))
        .select(col("nation"), col("n"), col("group_cov_num"),
          col("pooled_cov_num"),
          (signum(col("group_cov_num")) =!= signum(col("pooled_cov_num")))
            .as("sign_flips"))
    }),

    // §2.6 — k-hop neighborhood with minimum hop labels (round 5: the
    // bounded BFS the graph family lacked between single-edge joins and
    // full components — "every part within 2 co-purchase hops of the
    // seed set, labeled by its closest distance". Each hop is one
    // edge⋈frontier equi-join + distinct; the min-hop label is a union
    // + min aggregate, so a node reached at several depths keeps the
    // closest (the BFS invariant), all exact
    "q269_khop_neighborhood" -> ((s, dir) => {
      val edges = Graph.symmetricCoOccurrenceEdges(t(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))
        .localCheckpoint() // both hop joins read it
      val seeds = edges.select(col("src").as("node")).distinct()
        .filter(col("node") < 10)
      def expand(frontier: DataFrame): DataFrame = edges
        .join(frontier.select(col("node").as("src")), Seq("src"))
        .select(col("dst").as("node")).distinct()
      val h1 = expand(seeds)
      val h2 = expand(h1)
      seeds.select(col("node"), lit(0L).as("hop"))
        .unionByName(h1.select(col("node"), lit(1L).as("hop")))
        .unionByName(h2.select(col("node"), lit(2L).as("hop")))
        .groupBy(col("node")).agg(min(col("hop")).as("hop"))
    }),

    // §2.6 — frequency-weighted median (round 5: the weighted-percentile
    // primitive — per brand, the median retail price PER SHIPPED UNIT
    // (each line weighted by its quantity), via the engine's native
    // frequency argument so the fact table is never row-expanded; the
    // oracle row-expands with generate_series and must agree. Doubled-
    // median trick (q74's family): 2·median = a+b is exactly integral
    // on integer cents, so the output is hash-exact despite the
    // interpolated midpoint
    "q267_weighted_median" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"),
            ExactAgg.cents(col("p_retailprice")).as("retail_cents"))),
          col("l_partkey") === col("p_partkey"))
        .withColumn("qty", floor(col("l_quantity") + lit(0.5)).cast("long"))
      li.groupBy(col("p_brand"))
        .agg(sum(col("qty")).as("total_units"),
          (percentile(col("retail_cents"), lit(0.5), col("qty")) * 2)
            .cast("long").as("med2_cents"))
    }),

    // §2.6 — community modularity (round 5: the quality score FOR q248's
    // label-propagation partition — Newman's Q over the co-purchase
    // graph, kept exact by clearing denominators: with E2 = symmetric
    // edge rows (2m), Q·E2² = Σ_c (E2·intra_c − d_c²), all BIGINTs; the
    // permille view divides once (permille not micro — at 10× rows the
    // micro numerator crosses int64). Same per-round machinery as q248,
    // then two label joins onto the edge frame and one community-grain
    // aggregate
    "q268_modularity" -> ((s, dir) => {
      // round 13: checkpoint the RAW edge build once (feeds LPA rounds,
      // degrees, intra, e2), then re-establish hash(dst) IN-PLAN above
      // it — the checkpoint erases partitioning (LogicalRDD reports
      // Unknown under AQE), so the repartition puts it back where every
      // consumer can see it, and AQE's stage cache materializes that
      // one exchange once however many consumers reference it.
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val edges = Graph.symmetricCoOccurrenceEdges(t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))
        .localCheckpoint()
        // REPARTITION_BY_NUM width (scale-adaptive): AQE-coalescing-
        // exempt — see labelPropagation's comment
        .repartition(parts, col("dst")) // shared by LPA rounds+intra+deg
      val labels = Graph.labelPropagation(edges, 3)
      // degree via groupBy(dst): the edge set is SYMMETRIC ((s,d) present
      // iff (d,s) is), so per-node dst-counts equal src-counts exactly —
      // and the dst grouping reuses the repartition above, no exchange
      val deg = edges.groupBy(col("dst").as("node"))
        .agg(count(lit(1)).as("deg"))
      val dC = deg.join(labels, Seq("node"))
        .groupBy(col("label")).agg(sum(col("deg")).as("d_c"))
      val intra = edges
        // SHUFFLE_HASH: node-sized label attach onto edge rows — not
        // broadcastable at 100 TB node counts, and the hint spares the
        // driver round-trips (the LPA-round lesson, round 12). dst side
        // joins FIRST: the edge frame is hash(dst) from the repartition
        // above, so this join adds no edge exchange; only the src-side
        // attach re-shuffles edge rows, once.
        .join(labels.select(col("node").as("dst"), col("label").as("ld"))
          .hint("shuffle_hash"), Seq("dst"))
        .join(labels.select(col("node").as("src"), col("label").as("ls"))
          .hint("shuffle_hash"), Seq("src"))
        .filter(col("ls") === col("ld"))
        .groupBy(col("ls").as("label")).agg(count(lit(1)).as("intra_c"))
      val e2 = edges.agg(count(lit(1)).as("e2"))
      dC.join(intra, Seq("label"), "left")
        .withColumn("intra_c", coalesce(col("intra_c"), lit(0L)))
        .crossJoin(broadcast(e2))
        .agg(max(col("e2")).as("e2"),
          count(lit(1)).as("n_communities"),
          sum(col("e2") * col("intra_c") - col("d_c") * col("d_c"))
            .as("q_scaled"))
        .withColumn("q_permille",
          expr("(1000 * q_scaled) div (e2 * e2)"))
    }),

    // §2.6 — year-over-year growth report (round 5: revenue per order
    // year with the YoY delta in exact permille — the elementary trend
    // report under q89's fitted slope; one year-grain aggregate, one lag
    // on the bounded year frame, cross-multiplied permille (years with
    // no predecessor emit NULL growth, identically in both engines)
    "q265_yoy_growth" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byY = t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"))
        .agg(sum(ExactAgg.cents(col("o_totalprice"))).as("cents"))
      byY
        .withColumn("prev_cents", lag(col("cents"), 1)
          .over(Window.orderBy(col("y"))))
        .select(col("y"), col("cents"), col("prev_cents"),
          expr("(1000 * (cents - prev_cents)) div prev_cents")
            .as("yoy_permille"))
    }),

    // §2.6 — change-contribution decomposition (round 5: the "why did
    // revenue move" answer — the last full year's delta vs the year
    // before, split by customer nation: each nation's exact delta cents
    // and its share of the TOTAL move in permille (shares can exceed
    // 1000 or go negative when nations move against the trend — that IS
    // the insight). Nation dim broadcasts; two conditional sums in one
    // fact pass; the decomposition identity Σ nation deltas = total
    // delta holds exactly in integer cents
    "q266_change_contribution" -> ((s, dir) => {
      val (y1, y2) = (2000, 2001)
      val cust = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))
      val byNation = t(s, dir, "orders")
        .filter(year(col("o_orderdate")).isin(y1, y2))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(
          sum(when(year(col("o_orderdate")) === y1,
            ExactAgg.cents(col("o_totalprice"))).otherwise(0L))
            .as("cents_y1"),
          sum(when(year(col("o_orderdate")) === y2,
            ExactAgg.cents(col("o_totalprice"))).otherwise(0L))
            .as("cents_y2"))
        .withColumn("delta_cents", col("cents_y2") - col("cents_y1"))
      val tot = byNation.agg(sum(col("delta_cents")).as("total_delta"))
      byNation.crossJoin(broadcast(tot))
        .select(col("nation"), col("cents_y1"), col("cents_y2"),
          col("delta_cents"),
          expr("(1000 * delta_cents) div total_delta")
            .as("share_of_move_permille"))
    }),

    // §2.6 — growth accounting (round 5: the product-analytics quad —
    // per week, how many active users are NEW (first week ever),
    // RETAINED (active the week before), RESURRECTED (returning after a
    // gap), and how many CHURNED out of the previous week (previous
    // actives − retained). Week = Monday-anchored epoch-day div 7
    // (identical integers both engines); per-user lag over the
    // (user, week) distinct frame, then a week-grain rollup joined to
    // its own lag — everything after the distinct is user-week grain
    "q258_growth_accounting" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val uw = events(s, dir)
        .select(col("user_id"),
          (datediff(to_date(col("ts")), lit("1970-01-05").cast("date"))
            .cast("long") / 7).cast("long").as("wk"))
        .distinct()
      val lagged = uw.withColumn("prev_wk",
        lag(col("wk"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("wk"))))
      val byWk = lagged.groupBy(col("wk"))
        .agg(count(lit(1)).as("actives"),
          count(when(col("prev_wk").isNull, 1)).as("new_users"),
          count(when(col("prev_wk") === col("wk") - 1, 1)).as("retained"),
          count(when(col("prev_wk").isNotNull &&
            col("prev_wk") < col("wk") - 1, 1)).as("resurrected"))
      val w = Window.orderBy(col("wk")) // bounded week frame
      byWk
        .withColumn("prev_actives", lag(col("actives"), 1).over(w))
        .withColumn("churned",
          when(col("prev_actives").isNull, 0L)
            .otherwise(col("prev_actives") - col("retained")))
        .select(col("wk"), col("actives"), col("new_users"),
          col("retained"), col("resurrected"), col("churned"))
    }),

    // §2.6 — DAU/WAU stickiness (round 5: the engagement-intensity
    // ratio — per week, mean daily actives over weekly actives in exact
    // permille: (1000·Σ_day dau) div (n_days·wau). Two distinct-count
    // grains from one scan; the permille cross-multiplies so no
    // division happens before the final bounded frame
    "q259_stickiness" -> ((s, dir) => {
      // NULL is not a user (the q250 audience contract): the
      // distinct+count(*) pipeline would count the NULL row as an
      // active user while count(DISTINCT user_id) skips it (r9 sweep)
      val base = events(s, dir).filter(col("user_id").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .withColumn("wk",
          (datediff(col("d"), lit("1970-01-05").cast("date"))
            .cast("long") / 7).cast("long"))
      val daily = base.select(col("wk"), col("d"), col("user_id")).distinct()
        .groupBy(col("wk"), col("d")).agg(count(lit(1)).as("dau"))
        .groupBy(col("wk"))
        .agg(sum(col("dau")).as("dau_sum"), count(lit(1)).as("n_days"))
      val weekly = base.select(col("wk"), col("user_id")).distinct()
        .groupBy(col("wk")).agg(count(lit(1)).as("wau"))
      daily.join(weekly, Seq("wk"))
        .select(col("wk"), col("n_days"), col("dau_sum"), col("wau"),
          expr("(1000 * dau_sum) div (n_days * wau)")
            .as("stickiness_permille"))
    }),

    // §2.6 — Kaplan–Meier customer survival curve (round 5: the
    // censoring-aware churn analysis a naive "share still active"
    // cannot do — tenure = first→last order days, customers whose last
    // order falls within 30 days of the dataset horizon are CENSORED
    // (still at risk, not churned), and the survivor function is the
    // K-M product limit S_t = S_{t-1}·(r_t − d_t)/r_t over event
    // tenures. The product is an inherently sequential recurrence —
    // q173's bounded-fold pattern over the ≤|tenure days| aggregate
    // frame, in exact integer micros so the recursive-CTE oracle twin is
    // bit-identical; risk sets come from one cumulative window on the
    // same frame
    "q238_survival_curve" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders")
      val horizon = o.agg(max(to_date(col("o_orderdate"))).as("h"))
      val ten = o.groupBy(col("o_custkey"))
        .agg(to_date(min(col("o_orderdate"))).as("f"),
          to_date(max(col("o_orderdate"))).as("l"))
        .crossJoin(broadcast(horizon))
        .select(datediff(col("l"), col("f")).cast("long").as("tenure"),
          (datediff(col("h"), col("l")) > 30).as("churned"))
      val byT = ten.groupBy(col("tenure"))
        .agg(count(lit(1)).as("n_t"),
          sum(when(col("churned"), 1L).otherwise(0L)).as("d_t"))
      val tot = byT.agg(sum(col("n_t")).as("n"))
      val w = Window.orderBy(col("tenure"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val risk = byT.crossJoin(broadcast(tot))
        .withColumn("left_by_t", sum(col("n_t")).over(w))
        .select(col("tenure"), col("n_t"), col("d_t"),
          (col("n") - col("left_by_t") + col("n_t")).as("at_risk"))
      risk.agg(sort_array(collect_list(struct(col("tenure"), col("n_t"),
          col("d_t"), col("at_risk")))).as("a"))
        .select(explode(expr(
          """aggregate(a,
            |  cast(array() as array<struct<tenure:bigint,n_t:bigint,
            |    d_t:bigint,at_risk:bigint,surv_micro:bigint>>),
            |  (acc, x) -> concat(acc, array(named_struct(
            |    'tenure', x.tenure, 'n_t', x.n_t, 'd_t', x.d_t,
            |    'at_risk', x.at_risk,
            |    'surv_micro',
            |      (CASE WHEN size(acc) = 0 THEN 1000000
            |        ELSE element_at(acc, -1).surv_micro END
            |       * (x.at_risk - x.d_t)) div x.at_risk))))""".stripMargin))
          .as("r"))
        .select(col("r.tenure").as("tenure"), col("r.n_t").as("n_t"),
          col("r.d_t").as("d_t"), col("r.at_risk").as("at_risk"),
          col("r.surv_micro").as("surv_micro"))
    }),

    // §2.6 — binary-segmentation changepoints (round 5: q143's CUSUM
    // argmax recursed one level — the global level-shift day splits the
    // series, then each side runs the same exact-integer statistic under
    // a segment-partitioned window, yielding up to three candidate
    // shifts ranked by their own deviations. All windows ride the
    // bounded |days| aggregate frame; the level-1 split broadcasts as a
    // 1-row frame; ties break to the earliest day so the recursion is a
    // pure function of the data
    "q235_binary_segmentation" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint() // consumed by both levels
      val w = Window.orderBy(col("d"))
      val sc = daily
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("s_i", sum(col("n")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = sc.groupBy().agg(max(col("i")).as("nd"), sum(col("n")).as("tt"))
      val l1 = sc.crossJoin(broadcast(tot))
        .select(col("d"),
          abs(col("nd") * col("s_i") - col("i") * col("tt")).as("stat_scaled"))
        .orderBy(col("stat_scaled").desc, col("d").asc)
        .limit(1)
        .localCheckpoint() // feeds the output AND the level-2 split
      val seg = daily.crossJoin(broadcast(l1.select(col("d").as("cp1"))))
        .withColumn("segment",
          when(col("d") <= col("cp1"), "left").otherwise("right"))
      val w2 = Window.partitionBy(col("segment")).orderBy(col("d"))
      val sc2 = seg
        .withColumn("i", row_number().over(w2).cast("long"))
        .withColumn("s_i", sum(col("n")).over(
          w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot2 = sc2.groupBy(col("segment"))
        .agg(max(col("i")).as("nd"), sum(col("n")).as("tt"))
      val rk = Window.partitionBy(col("segment"))
        .orderBy(col("stat_scaled").desc, col("d").asc)
      val l2 = sc2.join(broadcast(tot2), Seq("segment"))
        .select(col("segment"), col("d"),
          abs(col("nd") * col("s_i") - col("i") * col("tt")).as("stat_scaled"))
        .withColumn("r", row_number().over(rk))
        .filter(col("r") === 1)
        .select(lit(2L).as("level"), col("segment"), col("d").as("cp_date"),
          col("stat_scaled"))
      l1.select(lit(1L).as("level"), lit("all").as("segment"),
          col("d").as("cp_date"), col("stat_scaled"))
        .unionByName(l2)
    }),

    // §2.6 — Lorenz curve of customer revenue (round 5: the
    // full-distribution decile table behind q184's Gini scalar — revenue
    // deciles of the customer aggregate with exact cumulative cents and
    // share permille, the "what share do the bottom k own" read-off.
    // Deciles come from an ntile over the CUSTOMER AGGREGATE (q137's
    // documented exemption), every sum an exact BIGINT
    "q236_lorenz_curve" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cust = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))")
          .as("cents"))
      val dw = Window.orderBy(col("cents").asc, col("o_custkey").asc)
      val dec = cust.withColumn("decile", ntile(10).over(dw).cast("long"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("dec_cents"))
      val cw = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dec
        .withColumn("cum_cents", sum(col("dec_cents")).over(cw))
        .crossJoin(broadcast(dec.groupBy().agg(sum(col("dec_cents")).as("t"))))
        .select(col("decile"), col("n_cust"), col("dec_cents"),
          col("cum_cents"),
          expr("(1000 * cum_cents) div t").as("cum_share_permille"))
    }),

    // §2.6 — 3-itemset support mining (round 5: the Apriori step above
    // q157's 2-itemset rules — top part TRIPLES co-purchased in one
    // order. Triples expand MAP-SIDE from each order's sorted distinct
    // basket via nested sequence-transforms (C(k,3) of the BOUNDED
    // basket, q183's measured cost frame), so the shuffle carries
    // (triple, partial count) — never triple rows; the oracle takes the
    // independent three-way self-join formulation. Top-15 by support
    // with a full (p1, p2, p3) tie-break
    "q233_triple_itemsets" -> ((s, dir) => {
      val baskets = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
        .filter(size(col("items")) >= 3)
      val triples = expr(
        """flatten(flatten(transform(sequence(1, size(items) - 2), i ->
          |  transform(sequence(i + 1, size(items) - 1), j ->
          |    transform(sequence(j + 1, CAST(size(items) AS BIGINT)), k ->
          |      struct(element_at(items, CAST(i AS INT)) AS p1,
          |             element_at(items, CAST(j AS INT)) AS p2,
          |             element_at(items, CAST(k AS INT)) AS p3))))))
          |""".stripMargin)
      baskets.select(explode(triples).as("t"))
        .select(col("t.p1"), col("t.p2"), col("t.p3"))
        .groupBy(col("p1"), col("p2"), col("p3"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .orderBy(col("support").desc, col("p1").asc, col("p2").asc,
          col("p3").asc)
        .limit(15)
    }),

    // §2.6 — SQL-facade gate (round 5: the operator library driven
    // end-to-end THROUGH `spark.sql` over GraftSql's `graft_<query>`
    // views — per language, how many dedup-exact keepers survive and how
    // many of them are low-stopword docs, joining two registered
    // operator views to a base table inside one SQL statement. This puts
    // the BI-style interface itself (view registration, cross-view
    // Catalyst planning) into the driver's correctness gate; the oracle
    // restates BOTH operators' semantics from first principles in SQL
    "q234_sql_facade" -> ((s, dir) => {
      GraftSql.registerOperators(s, dir,
        only = Set("q18_dedup_exact", "q15_quality_score"))
      s.sql(
        """SELECT d.lang,
          |       CAST(count(*) AS BIGINT) AS n_keepers,
          |       CAST(sum(CASE WHEN q.stopword_ratio < 0.05
          |                     THEN 1 ELSE 0 END) AS BIGINT)
          |         AS n_low_stopword
          |FROM graft_q18_dedup_exact k
          |JOIN documents d ON k.doc_id = d.doc_id
          |JOIN graft_q15_quality_score q ON q.doc_id = k.doc_id
          |GROUP BY d.lang""".stripMargin)
    }),

    // §2.6 — rank-biased overlap between two rankings (round 5: Webber
    // et al.'s top-weighted ranking-agreement metric — the eval-harness
    // complement of q153's RRF fusion: where RRF COMBINES the revenue
    // and breadth rankings, RBO MEASURES how much they agree, weighting
    // depth d by (1−p)·p^(d−1). Truncated at depth 20 with p = 0.9;
    // the geometric weights are build-time literals shared with the
    // oracle, per-depth terms integer-div once, and the ranks rank the
    // PART AGGREGATE (bounded catalog, q137's documented exemption).
    // Output: the per-depth agreement curve with the cumulative RBO
    "q231_rbo_rankings" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val agg = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(expr("sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))")
          .as("cents"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .localCheckpoint() // one aggregate pass feeds both rankings
      val ra = agg.withColumn("ra", row_number().over(
          Window.orderBy(col("cents").desc, col("l_partkey").asc)))
        .filter(col("ra") <= 20).select(col("l_partkey"), col("ra"))
      val rb = agg.withColumn("rb", row_number().over(
          Window.orderBy(col("n_orders").desc, col("l_partkey").asc)))
        .filter(col("rb") <= 20).select(col("l_partkey"), col("rb"))
      // a part contributes to overlap at every depth >= max(ra, rb)
      val m = ra.join(rb, Seq("l_partkey"))
        .select(greatest(col("ra"), col("rb")).as("m"))
      val depths = RboWeightsMicro.zipWithIndex
        .map { case (w, i) => ((i + 1).toLong, w) }.toDF("d", "w_micro")
      depths.join(m, col("m") <= col("d"), "left")
        .groupBy(col("d"), col("w_micro"))
        .agg(sum(when(col("m").isNotNull, 1L).otherwise(0L)).as("overlap"))
        .withColumn("term_micro", expr("(w_micro * overlap) div d"))
        .withColumn("rbo_cum_micro", sum(col("term_micro")).over(
          Window.orderBy(col("d"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }),

    // §2.6 — threshold-trimmed mean (round 5: the robust central
    // tendency beside q74's median+MAD — per order priority, the mean of
    // totalprice cents within the exact interpolated [p10, p90] band;
    // thresholds from ONE bounded percentile aggregate broadcast back
    // (q62's two-scan pattern — never a per-group rank window over the
    // fact table), the trimmed mean an exact integer div. Spark
    // `percentile` ≡ DuckDB `quantile_cont` bit-for-bit on integral
    // inputs (q37/q138's established bridge)
    "q226_trimmed_mean" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderpriority").as("priority"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      val th = o.groupBy(col("priority")).agg(
        expr("percentile(cents, 0.1)").as("lo"),
        expr("percentile(cents, 0.9)").as("hi"))
      o.join(broadcast(th), Seq("priority"))
        .filter(col("cents") >= col("lo") && col("cents") <= col("hi"))
        .groupBy(col("priority"))
        .agg(count(lit(1)).as("n_kept"), sum(col("cents")).as("sum_cents"))
        .withColumn("trimmed_mean_cents", expr("sum_cents div n_kept"))
    }),

    // §2.6 — Fano-factor burstiness screen (round 5: variance-to-mean of
    // each event type's daily volume — Poisson arrivals read ~1, bursty
    // feeds read >1, metronomic bots read <1; the dispersion complement
    // of q85's spike flags and q147's autocorrelation. The three sums
    // (n, Σc, Σc²) are exact BIGINTs over the bounded day×type frame, the
    // factor the exact integer micro-ratio (10⁶·(n·Σc² − (Σc)²)) div (n·Σc)
    // — no doubles anywhere. Headroom: daily counts ≤ ~10⁵ even at
    // cluster scale keep 10⁶·n·Σc² far under 2⁶³
    "q227_fano_burstiness" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), sum(col("c")).as("s1"),
          sum(col("c") * col("c")).as("s2"))
        .withColumn("fano_micro",
          expr("(1000000 * (n_days * s2 - s1 * s1)) div (n_days * s1)"))
    }),

    "q223_ks_matrix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = t(s, dir, "documents")
        .groupBy(col("source"), col("n_chars").as("x"))
        .agg(count(lit(1)).as("c"))
      val grid = counts.select(col("x")).distinct()
        .crossJoin(counts.select(col("source")).distinct())
      val filled = grid.join(counts, Seq("source", "x"), "left")
        .select(col("source"), col("x"),
          coalesce(col("c"), lit(0L)).as("c0"))
      val cum = Window.partitionBy(col("source")).orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cdf = filled
        .withColumn("cd", sum(col("c0")).over(cum))
        .withColumn("n", sum(col("c0")).over(
          Window.partitionBy(col("source"))))
        .select(col("source"), col("x"), col("cd"), col("n"))
      cdf.as("a").join(cdf.as("b"),
          col("a.x") === col("b.x") && col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b"),
          abs(col("b.n") * col("a.cd") - col("a.n") * col("b.cd")).as("d"))
        .groupBy(col("src_a"), col("src_b"), col("n_a"), col("n_b"))
        .agg(max(col("d")).as("d_scaled"))
        .withColumn("d_permille",
          expr("(1000 * d_scaled) div (n_a * n_b)"))
    }),

    // §2.6 — Kolmogorov–Smirnov distance between two sources' length
    // distributions (round 5): the nonparametric two-sample drift test
    // next to the chi-square cells (q146, categorical) and the TV drift
    // matrix (q201, mix shares) — KS catches SHAPE drift in a numeric
    // feature. D is kept as the EXACT integer max |n_b·C_a(x) − n_a·
    // C_b(x)| over the observed support (scaled by n_a·n_b, no division
    // ever happens), argmax tie-broken by the smallest x; everything
    // after the per-source length aggregate runs on the bounded
    // |distinct lengths| frame
    "q218_ks_lengths" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Quality.ksScaled(
        docs.filter(col("source") === "src0").select(col("n_chars").as("x")),
        docs.filter(col("source") === "src1").select(col("n_chars").as("x")))
    }),

    // §2.6 — Mann-Kendall trend test on daily volumes (round 5): the
    // classic NONPARAMETRIC monotone-trend detector — S = Σ_{i<j}
    // sign(n_j − n_i) over the day series, with the exact tie-corrected
    // 18·Var(S) = n(n−1)(2n+5) − Σ t(t−1)(2t+5); complements CUSUM
    // (q143: single level shift) and autocorrelation (q147: momentum)
    // with a distribution-free drift verdict. ALL integers — sign via
    // CASE, never signum doubles — so the statistic is hash-exact; the
    // pair join runs on the bounded |days| aggregate frame, never events
    "q215_mann_kendall" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("d"))
        .agg(count(lit(1)).as("n"))
      val sgn = when(col("b.n") > col("a.n"), 1L)
        .when(col("b.n") < col("a.n"), -1L).otherwise(0L)
      val pairs = daily.as("a").join(daily.as("b"),
          col("a.d") < col("b.d"))
        .agg(count(lit(1)).as("n_pairs"), sum(sgn).as("s_stat"))
      val ties = daily.groupBy(col("n")).agg(count(lit(1)).as("t"))
        .agg(sum(col("t")).as("n_days"),
          sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
            .as("tie_term"))
      pairs.crossJoin(broadcast(ties))
        .select(col("n_days"), col("n_pairs"), col("s_stat"),
          (col("n_days") * (col("n_days") - 1) * (lit(2) * col("n_days") + 5)
            - col("tie_term")).as("var18"))
    }),

    // §2.6 — Theil–Sen slope of daily volumes (round 5): the robust
    // trend ESTIMATE next to q215's trend TEST — median of all pairwise
    // slopes, outlier-immune where the least-squares line (q136's
    // moments) is not. Each slope micro-rounds identically on both
    // engines BEFORE ranking, the median is the deterministic lower
    // middle element under a (slope, day-pair) total order; the pair
    // stage is the bounded |days|² aggregate frame
    "q216_theil_sen" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("d"))
        .agg(count(lit(1)).as("n"))
      val slopes = daily.as("a").join(daily.as("b"),
          col("a.d") < col("b.d"))
        .select(col("a.d").as("d1"), col("b.d").as("d2"),
          floor((col("b.n") - col("a.n")) * lit(1000000L)
            / (col("b.d") - col("a.d")) + 0.5).cast("long")
            .as("slope_micro"))
      // bounded frame: the single-partition window is the documented
      // aggregate-frame exemption (q82 class)
      val w = Window.orderBy(col("slope_micro"), col("d1"), col("d2"))
      slopes
        .withColumn("r", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
        .filter(col("r") === ((col("cnt") + 1) / 2).cast("long"))
        .select(col("cnt").as("n_pairs"),
          col("slope_micro").as("median_slope_micro"))
    }),

    // §2.6 — robust rolling trend (round 5): 7-day CENTERED rolling
    // MEDIAN of daily event volume (rank statistic over a RANGE frame —
    // outlier-immune where q90's rolling SUM is not) plus the residual;
    // 2×-scaled integers keep the even-count median exact; the window
    // rides the bounded |days| aggregate frame. Note the frame is the
    // bounded sliding kind — not the shrinking-frame O(n²) trap
    "q199_rolling_median_trend" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir)
        .groupBy((unix_micros(col("ts")) / lit(86400000000L)).cast("long")
          .as("day_ord"))
        .agg(count(lit(1)).as("n"))
      daily
        .withColumn("trend2",
          (percentile(col("n"), lit(0.5)).over(
            Window.orderBy(col("day_ord")).rangeBetween(-3, 3)) * 2)
            .cast("long"))
        .select(col("day_ord"), col("n"), col("trend2"),
          (col("n") * 2 - col("trend2")).as("resid2"))
    }),

    // §2.6 — customer-lifetime-value cohort matrix (round 5): customers
    // cohorted by FIRST order month, revenue and active-customer counts
    // per (cohort_month, months_since) — the LTV triangle, q67's
    // retention shape upgraded with exact-cent revenue; one custkey
    // shuffle derives cohorts, the join back rides the same key, the
    // matrix aggregate is bounded by months²
    "q200_ltv_cohorts" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
            .cast("long").as("m_ord"),
          ExactAgg.cents(col("o_totalprice")).as("cents"))
      val cohort = ord.groupBy(col("o_custkey"))
        .agg(min(col("m_ord")).as("cohort_ord"))
      ord.join(cohort, Seq("o_custkey"))
        .groupBy(col("cohort_ord"),
          (col("m_ord") - col("cohort_ord")).as("months_since"))
        .agg(countDistinct(col("o_custkey")).as("n_active"),
          sum(col("cents")).as("revenue_cents"))
    }),

    // §2.6 — neighborhood-overlap link scores (round 5): common-neighbor
    // counts and exact integer-micro Jaccard overlap for every
    // co-purchase edge with a shared neighbor — the link-prediction /
    // edge-strength feature; common counts ARE triangles-per-edge, so the
    // operator reuses the m·√m oriented-wedge machinery and never
    // expands a hub neighborhood; oracle recounts via the naive
    // adjacency join
    "q194_link_scores" -> ((s, dir) => {
      val edges = Graph.coOccurrenceEdges(t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))
      Graph.linkScores(edges)
    }),

    // §2.6 — weekday-residual volume anomaly screen (round 5): each day's
    // event volume vs its WEEKDAY median, flagged when the deviation beats
    // 2× the weekday's MAD — seasonality-aware outlier detection that
    // composes q152's weekday profile with q74's robust dispersion. All
    // compares run on 2×-scaled integers (an even-count median is a .5 —
    // doubling keeps it integral), computed over the bounded |days| frame;
    // weekday 0=Monday on both engines (Spark weekday() ≡ isodow−1)
    "q195_weekday_anomaly" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val stats = daily
        .groupBy(weekday(col("day")).cast("long").as("wd"))
        .agg((percentile(col("n"), lit(0.5)) * 2).cast("long").as("med2"))
      val dev = daily
        .join(broadcast(stats), weekday(col("day")).cast("long") === col("wd"))
        .withColumn("dev2", abs(col("n") * 2 - col("med2")))
      val mad = dev.groupBy(col("wd").as("mwd"))
        .agg((percentile(col("dev2"), lit(0.5)) * 2).cast("long").as("mad4"))
      // dev2 is 2·|dev|, mad4 is 4·MAD: dev > 2·MAD ⟺ dev2 > mad4
      dev.join(broadcast(mad), col("wd") === col("mwd"))
        .filter(col("dev2") > col("mad4"))
        .select(col("day"), col("wd"), col("n"), col("med2"), col("dev2"),
          col("mad4"))
    }),

    // §2.6 — Spearman rank correlation, daily volume vs daily revenue
    // (round 4): rank windows over the bounded |days| frame with a date
    // tie-break (a deterministic function of the data); Σd² exact BIGINT,
    // rho's doubles mirror the oracle's expression structure exactly
    "q172_spearman_daily" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir).filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n_events"),
          sum(ExactAgg.cents(col("value"))).as("cents"))
      daily
        .withColumn("ra", row_number()
          .over(Window.orderBy(col("n_events"), col("d"))).cast("long"))
        .withColumn("rb", row_number()
          .over(Window.orderBy(col("cents"), col("d"))).cast("long"))
        .agg(count(lit(1)).as("n"),
          sum((col("ra") - col("rb")) * (col("ra") - col("rb"))).as("sum_d2"))
        .select(col("n"), col("sum_d2"),
          // nullif: n = 1 (single-day calendar) makes n(n²−1) = 0 and
          // the ANSI double division throws; rho is undefined → NULL
          (lit(1.0) - (lit(6.0) * col("sum_d2").cast("double")) /
            nullif((col("n") * (col("n") * col("n") - 1)).cast("double"),
              lit(0.0))).as("rho"))
    }),

    // §2.6 — integer EMA over the day-grain series (round 4): the
    // inherently-sequential recurrence runs as ONE aggregate() fold over
    // the bounded |days| frame (collected AFTER aggregation, never raw
    // rows); exact integer arithmetic so the DuckDB recursive-CTE twin
    // is bit-identical. Alpha = 20/100
    "q173_ema_daily" -> ((s, dir) => {
      val daily = events(s, dir).filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(ExactAgg.cents(col("value"))).as("cents"))
      daily.agg(sort_array(collect_list(struct(col("d"), col("cents"))))
          .as("a"))
        .select(explode(expr(
          """aggregate(a,
            |  cast(array() as array<struct<d:date,cents:bigint,ema_cents:bigint>>),
            |  (acc, x) -> concat(acc, array(named_struct(
            |    'd', x.d, 'cents', x.cents,
            |    'ema_cents', CASE WHEN size(acc) = 0 THEN x.cents
            |      ELSE (20 * x.cents + 80 * element_at(acc, -1).ema_cents) div 100
            |      END))))""".stripMargin)).as("r"))
        .select(col("r.d").as("d"), col("r.cents").as("cents"),
          col("r.ema_cents").as("ema_cents"))
    }),

    // §2.6 — k-core decomposition (round 4): 6 synchronized peel rounds
    // toward the 80-core of the co-purchase graph (fixpoint at round 5
    // for this data, so the 6-round definition IS the k-core here);
    // each round is one degree aggregate + one surviving-endpoint
    // restriction over edge rows, checkpointed — never node×node
    "q174_kcore" -> ((s, dir) => {
      val edges = Graph.symmetricCoOccurrenceEdges(t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))
      Graph.kCoreSurvivors(edges, k = 80, rounds = 6)
    }),

    // §2.6 — capacity-clamped backlog curve (round 4): the NON-LINEAR
    // recurrence backlog_i = max(0, backlog_{i-1} + inflow_i − capacity)
    // that no window can express — q173's bounded-fold pattern with a
    // clamp; capacity is the exact integer mean daily inflow (1-row
    // broadcast), every step exact, recursive-CTE oracle twin
    "q178_backlog_curve" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(sum(ExactAgg.cents(col("o_totalprice"))).as("cents"))
      val cap = daily.agg(expr("sum(cents) div count(*)").as("cap"))
      daily.crossJoin(broadcast(cap))
        .agg(sort_array(collect_list(struct(col("d"), col("cents")))).as("a"),
          first(col("cap")).as("cap"))
        .select(col("cap"), explode(expr(
          """aggregate(a,
            |  cast(array() as array<struct<d:date,cents:bigint,backlog:bigint>>),
            |  (acc, x) -> concat(acc, array(named_struct(
            |    'd', x.d, 'cents', x.cents,
            |    'backlog', greatest(0L,
            |      CASE WHEN size(acc) = 0 THEN 0L
            |           ELSE element_at(acc, -1).backlog END
            |      + x.cents - cap)))))""".stripMargin)).as("r"))
        .select(col("r.d").as("d"), col("r.cents").as("cents"),
          col("cap"), col("r.backlog").as("backlog"))
    }),

    // §2.6 — hierarchical percent-of-total (round 4): nation revenue with
    // its ppm share WITHIN its region and the region's ppm share of the
    // grand total — two window levels over the 25-row nation aggregate
    // (bounded frames), all shares exact integer divisions
    "q179_share_hierarchy" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val rev = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(ExactAgg.scaledLong(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000))
          .as("rev_micro"))
      rev
        .withColumn("region_micro",
          sum(col("rev_micro")).over(Window.partitionBy(col("r_name"))))
        .withColumn("total_micro", sum(col("rev_micro")).over(Window.partitionBy()))
        // ppm numerators overflow int64 at ~9.2e12 micro-revenue (hit at
        // sf0.1 — the round-5 bench caught it); route the ×1e6 through
        // exact DECIMAL(38,0) and come back to BIGINT after the divide
        // (the quotient is ≤ 1e6). The oracle's HUGEINT twin is the same
        // exact-integer widening
        .select(col("r_name"), col("n_name"), col("rev_micro"),
          expr("""CAST((CAST(rev_micro AS DECIMAL(38,0)) * 1000000)
                 | div region_micro AS BIGINT)""".stripMargin)
            .as("nation_in_region_ppm"),
          expr("""CAST((CAST(region_micro AS DECIMAL(38,0)) * 1000000)
                 | div total_micro AS BIGINT)""".stripMargin)
            .as("region_of_total_ppm"))
    }),

    // §2.6 — dormant-customer reactivation screen (round 4): users whose
    // purchase history contains a ≥7-day gap followed by another
    // purchase (7 days because the synthetic timeline is 150 days with
    // max purchase gap 18 — a production screen would use ≥30); one
    // user_id shuffle carries the lag window and the rollup, gaps in
    // exact whole days from epoch-micros
    "q180_reactivation" -> ((s, dir) => {
      val p = events(s, dir).filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id"))
      p.withColumn("gap_days",
          expr("(ts_us - lag(ts_us) over (partition by user_id order by ts_us, event_id)) div 86400000000"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"),
          count(when(col("gap_days") >= 7L, 1)).as("n_reactivations"),
          max(col("gap_days")).as("max_gap_days"))
        .filter(col("n_reactivations") >= 1L)
    }),

    // §2.6 — inter-event gap histogram on LOG-SPACED integer buckets
    // (round 4): bucket = bit length of the gap seconds — the exact
    // integer stand-in for log₂ binning (q99's binary-digit trick turned
    // into a histogram); one user window + a ≤40-key aggregate
    "q181_gap_histogram" -> ((s, dir) => {
      events(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"))
        .withColumn("gap_s",
          expr("(ts_us - lag(ts_us) over (partition by user_id order by ts_us, event_id)) div 1000000"))
        .filter(col("gap_s").isNotNull)
        .withColumn("bucket", length(bin(col("gap_s"))).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap_s")).as("min_gap_s"),
          max(col("gap_s")).as("max_gap_s"))
    }),

    // §2.6 — multi-touch LINEAR attribution (round 4): every purchase's
    // cents split EQUALLY across its preceding touches within a 7-day
    // lookback — the equal-credit counterpart of q117's last-touch.
    // Credits are exact integer micro-cents with the largest-remainder
    // cell going to the most RECENT touches, so per-purchase credits sum
    // exactly to the purchase; one user shuffle carries the
    // nearest-following-purchase carry window, one (user, purchase)
    // shuffle the split
    "q182_linear_attribution" -> ((s, dir) =>
      Events.linearAttribution(events(s, dir),
        lookbackUs = 7L * 86400L * 1000000L, conv = "purchase")),

    // §2.6 — basket-size profile (round 4): the distribution of distinct
    // parts per order, each size row carrying its C(k,2) pair volume —
    // the exact cost predictor for every basket-pair operator here
    // (q80/q154/q157); two bounded aggregates, nothing corpus-wide after
    // the order-grain reduce
    "q183_basket_profile" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_partkey")).as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_orders"))
        .select(col("k"), col("n_orders"),
          expr("k * (k - 1) div 2 * n_orders").as("pair_volume"))),

    // §2.6 — Gini coefficient of customer revenue concentration
    // (round 4): G = (2·Σ(i·xᵢ) − (n+1)·Σx) / (n·Σx) over the ascending
    // customer aggregate — numerator and denominator exact BIGINTs, one
    // double division at the end; the global rank runs on the CUSTOMER
    // AGGREGATE (q137's documented exemption), never order rows
    "q184_gini_revenue" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(ExactAgg.cents(col("o_totalprice"))).as("cents"))
        .withColumn("i", row_number()
          .over(Window.orderBy(col("cents"), col("o_custkey"))).cast("long"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          sum(col("i") * col("cents")).as("weighted_sum"))
        .select(col("n"), col("sum_cents"), col("weighted_sum"),
          ((lit(2.0) * col("weighted_sum").cast("double") -
            (col("n") + 1).cast("double") * col("sum_cents").cast("double")) /
            (col("n").cast("double") * col("sum_cents").cast("double")))
            .as("gini"))
    }),

    // §2.6 — A/B lift with Welch's t-statistic (variant = user parity):
    // ONE conditional-aggregate shuffle; means/variances derive from
    // exact integer (n, Σcents, Σcents²) so the doubles appear only in
    // the final closed-form — identical expression structure both sides,
    // and sqrt (unlike log) is IEEE correctly-rounded, so hash-exact
    "q115_ab_welch" -> ((s, dir) => {
      def side(p: Int, nm: String) = Seq(
        sum(when(col("user_id") % 2 === p, 1L)).as(s"n_$nm"),
        sum(when(col("user_id") % 2 === p, col("cents"))).as(s"sx_$nm"),
        sum(when(col("user_id") % 2 === p, col("cents") * col("cents")))
          .as(s"sxx_$nm"))
      val aggs = side(1, "a") ++ side(0, "b")
      def mean(nm: String) = col(s"sx_$nm").cast("double") / col(s"n_$nm")
      def vr(nm: String) =
        (col(s"sxx_$nm").cast("double") -
          col(s"sx_$nm").cast("double") * col(s"sx_$nm") / col(s"n_$nm")) /
          (col(s"n_$nm") - 1)
      events(s, dir).filter(col("value").isNotNull)
        .select(col("event_type"), col("user_id"),
          // kernel, not inline floor/cast: the non-finite quarantine
          // (ExactAgg.scaledLong) is what keeps a NaN/Inf row from
          // killing the job under ANSI (adversarial sweep r9)
          graft.functions.ExactAgg.cents(col("value")).as("cents"))
        .groupBy(col("event_type"))
        .agg(aggs.head, aggs.tail: _*)
        .filter(col("n_a") > 1 && col("n_b") > 1)
        .withColumn("se", sqrt(vr("a") / col("n_a") + vr("b") / col("n_b")))
        .filter(col("se") > 0)
        .select(col("event_type"), col("n_a"), col("n_b"),
          ((mean("a") - mean("b")) / col("se")).as("t_stat"))
    }),

    // §2.6 — DOULION approximate triangles (round 8, the graph family's
    // 100× arm): deterministic md5 edge sampling at p = 1/4, exact
    // oriented-wedge count on the sparsified graph, unbiased ·64 rescale.
    // Wedge volume (the scratch that DNF'd exact q154 at sf10 on one VM)
    // drops ~p² = 1/16; the md5 determinism keeps the estimate full-hash
    // oracle-able — the oracle replays the same sample and recounts via
    // the naive id-ordered 3-way join
    "q326_triangles_doulion" -> ((s, dir) => {
      val edges = Graph.coOccurrenceEdges(t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))
      Graph.triangleCountsApprox(edges, Seq("0", "1", "2", "3"))
        .orderBy(col("est_triangles").desc, col("node").asc)
        .limit(10)
    }),

    // §2.6 — sampled common-neighbor link scores (round 8): q194's
    // estimate-grade twin on the same md5-sparsified graph — exact
    // common counts among surviving edges, ·16 (1/p²) unbiased rescale;
    // wedge scratch drops ~p², the q194-at-100× safety valve
    "q327_link_scores_sampled" -> ((s, dir) => {
      val edges = Graph.coOccurrenceEdges(t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))
      Graph.linkScoresApprox(edges, Seq("0", "1", "2", "3"))
    }),

    // §2.6 — DOULION accuracy instrument (round 9, VERDICT r8 item 4):
    // q326 ships the SCRATCH half of the sampling trade (measured at
    // sf10); this query measures the ACCURACY half so a 100 TB caller
    // can pick p by target error instead of folklore. One p-sweep over
    // keepHex sizes k ∈ {1,2,4,8} (p = k/16) on the same co-purchase
    // graph: per arm, the sampled global triangle count S, the unbiased
    // estimate S·(16/k)³, the EXACT count (affordable at verify scale),
    // the measured |est−exact| relative error in micros, and TWO error
    // scales: (a) `rel_bound_micro`, the folklore 1/sqrt(T·p³) binomial
    // bound the q326 docstring used to cite, and (b) `stderr_tri`, the
    // FULL published variance (Tsourakakis et al., KDD'09) including
    // the shared-edge covariance term this sweep proved dominant here —
    // Var(T̂) = T·(1−p³)/p³ + 2r·(1−p)/p with r = Σ_edges C(t_e, 2)
    // (pairs of triangles sharing an edge; t_e = per-edge triangle
    // count = linkScores' common). On this co-purchase graph r ≈ 65·T,
    // so the binomial bound understates the error ~5–30x and the k=8
    // arm sits at 10 binomial σ but only −2.4 FULL σ. Both variance
    // terms divide by powers of 2 only (k, k³), so each is EXACT in
    // IEEE before the single final sqrt — the whole sweep is
    // md5-deterministic and full-hash replayable by the DuckDB oracle.
    // At 100 TB the caller plugs est and the SAMPLED r̂ into the same
    // formula; here exact T and r make the instrument itself exact.
    "q330_doulion_accuracy" -> ((s, dir) => {
      val edges = Graph.coOccurrenceEdges(t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))
      // round 12 (optimization): the six counting arms used to run SIX
      // independent wedge enumerations (exact, linkScores, and one per
      // sampled k). ONE oriented enumeration now serves them all: the
      // triangle SET is orientation-invariant, the md5 edge sampling is
      // NESTED across arms ("0" ⊂ "01" ⊂ "0123" ⊂ "01234567"), so a
      // triangle survives arm k iff the MAX first-hex-digit of its three
      // id-ordered edges is < k, and both Σ-aggregates decompose over
      // the per-edge incidence frame: exact_tri = Σ t_e div 3,
      // r = Σ C(t_e, 2), sampled_tri(k) = Σ c_e(k) div 3. Verified
      // bit-identical per arm at sf0.01 before the rewrite.
      val dg = (u: Column, v: Column) =>
        conv(substring(md5(concat(u.cast("string"), lit(":"),
          v.cast("string"))), 1, 1), 16, 10).cast("long")
      val inc = Graph.orientedTriangles(edges)
        .withColumn("m", greatest(
          dg(least(col("apex"), col("x")), greatest(col("apex"), col("x"))),
          dg(least(col("apex"), col("y")), greatest(col("apex"), col("y"))),
          dg(least(col("x"), col("y")), greatest(col("x"), col("y")))))
        .select(col("m"), explode(array(
          struct(least(col("apex"), col("x")).as("ea"),
            greatest(col("apex"), col("x")).as("eb")),
          struct(least(col("apex"), col("y")).as("ea"),
            greatest(col("apex"), col("y")).as("eb")),
          struct(least(col("x"), col("y")).as("ea"),
            greatest(col("x"), col("y")).as("eb")))).as("e"))
      val scalars = inc
        .groupBy(col("e"))
        .agg(count(lit(1)).as("t_e"),
          count(when(col("m") < 1, 1)).as("c1"),
          count(when(col("m") < 2, 1)).as("c2"),
          count(when(col("m") < 4, 1)).as("c4"),
          count(when(col("m") < 8, 1)).as("c8"))
        .agg(expr("coalesce(sum(t_e), 0) div 3").as("exact_tri"),
          expr("coalesce(sum(t_e * (t_e - 1) div 2), 0)").as("r"),
          expr("coalesce(sum(c1), 0) div 3").as("s1"),
          expr("coalesce(sum(c2), 0) div 3").as("s2"),
          expr("coalesce(sum(c4), 0) div 3").as("s4"),
          expr("coalesce(sum(c8), 0) div 3").as("s8"))
      val arms = scalars.select(explode(array(
          struct(lit(1L).as("keep_hex"), col("s1").as("sampled_tri")),
          struct(lit(2L).as("keep_hex"), col("s2").as("sampled_tri")),
          struct(lit(4L).as("keep_hex"), col("s4").as("sampled_tri")),
          struct(lit(8L).as("keep_hex"), col("s8").as("sampled_tri"))))
          .as("arm"), col("exact_tri"), col("r"))
        .select(col("arm.keep_hex").as("keep_hex"),
          col("arm.sampled_tri").as("sampled_tri"),
          expr("arm.sampled_tri * 4096 div " +
            "(arm.keep_hex * arm.keep_hex * arm.keep_hex)").as("est_tri"),
          col("exact_tri"), col("r"))
      arms
        .withColumn("err_micro",
          expr("abs(est_tri - exact_tri) * 1000000 div nullif(exact_tri, 0)"))
        .withColumn("stderr_tri",
          // Var = T(4096−k³)/k³ + 2r(16−k)/k; k and k³ are powers of 2,
          // so both divisions are exact in IEEE — one rounding at each
          // multiply past 2^53, one at the +, one at the sqrt, identical
          // on both engines. Casts moved BEFORE the constant multiplies
          // (ADVICE r11): exact_tri·4096 / 2·r·16 in Long wrap silently
          // in Spark and raise in DuckDB on an extreme-scale graph; the
          // double multiply rounds instead — same IEEE result on both
          expr("sqrt(CAST(exact_tri AS DOUBLE)" +
            " * (4096 - keep_hex*keep_hex*keep_hex)" +
            " / (keep_hex*keep_hex*keep_hex)" +
            " + 2.0 * CAST(r AS DOUBLE) * (16 - keep_hex) / keep_hex)"))
        .withColumn("rel_bound_micro",
          expr("CAST(floor(64000000 / nullif(sqrt(CAST(est_tri AS DOUBLE) " +
            "* (keep_hex*keep_hex*keep_hex)), 0.0)) AS BIGINT)"))
        .drop("r")
        .orderBy(col("keep_hex"))
    }),

    // §2.6 — arms-only DOULION error model (round 11, VERDICT r10 item
    // 6): q330 is the PILOT-scale accuracy instrument — it recomputes
    // the exact triangle count T and the exact shared-edge term
    // r = Σ_e C(t_e, 2) per sweep, so it inherits the exact arm's
    // single-VM scale wall (q154's 78 GB wedge scratch DNF at sf10).
    // This is the instrument a 100 TB caller can actually run: every
    // quantity derives from the SAMPLE alone. Per arm k (p = k/16), one
    // sampled per-edge common-count frame yields BOTH plug-ins —
    //   sampled_tri = Σ c_e div 3       (each sampled triangle credits
    //                                    its 3 surviving edges),
    //   est_tri     = sampled_tri · (16/k)³  (the DOULION estimator),
    //   r_hat       = Σ C(c_e, 2) · (16/k)⁵  (a pair of distinct
    //     triangles sharing edge e involves e plus 4 OTHER distinct
    //     edges — two triangles sharing two edges would coincide — so
    //     each such pair survives md5 edge sampling with probability p⁵
    //     and the (1/p)⁵ rescale is unbiased),
    // and the full KDD'09 plug-in stderr is
    //   sqrt(est_tri·(4096−k³)/k³ + 2·r_hat·(16−k)/k)
    // — the same closed form q330 evaluates with exact T and r, with
    // the estimates substituted. Arms k ∈ {1,2,4}: sampling at p ≥ 1/2
    // saves < 4× scratch, which is not the regime sampling exists for
    // (and the k=8 arm's wedge volume is ~1/4 of the exact arm's — the
    // very wall this variant removes). All divisors are powers of 2, so
    // every term is IEEE-exact before the single final sqrt: the whole
    // sweep is md5-deterministic and full-hash replayable by DuckDB.
    "q334_doulion_errmodel" -> ((s, dir) => {
      // round 12 (optimization): the three sampled arms used to run
      // three SEQUENTIAL wedge enumerations over the DISK_ONLY-
      // checkpointed full edge frame (the r11 OOM adjudication). The
      // arms are NESTED ("0" ⊂ "01" ⊂ "0123"), so ONE enumeration of
      // the k=4 sample now serves all three: a k=4 triangle belongs to
      // arm k iff the max first-hex-digit of its three edges is < k,
      // and per-edge c_e(k) (the arm's common_sampled) is the count of
      // its incident triangles with m < k. One pipeline, strictly
      // smaller than the old k=4 arm alone (which re-derived degrees
      // and wedges from scratch), so the sf10 8 g heap headroom only
      // improves; the full-edge checkpoint is gone (the sampled frame
      // is the only one re-read). Verified bit-identical per arm at
      // sf0.01 before the rewrite.
      val edges = Graph.coOccurrenceEdges(t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))
      val sampled = Graph.sampleEdges(edges, Seq("0", "1", "2", "3"))
        .localCheckpoint()
      val dg = (u: Column, v: Column) =>
        conv(substring(md5(concat(u.cast("string"), lit(":"),
          v.cast("string"))), 1, 1), 16, 10).cast("long")
      val inc = Graph.orientedTriangles(sampled)
        .withColumn("m", greatest(
          dg(least(col("apex"), col("x")), greatest(col("apex"), col("x"))),
          dg(least(col("apex"), col("y")), greatest(col("apex"), col("y"))),
          dg(least(col("x"), col("y")), greatest(col("x"), col("y")))))
        .select(col("m"), explode(array(
          struct(least(col("apex"), col("x")).as("ea"),
            greatest(col("apex"), col("x")).as("eb")),
          struct(least(col("apex"), col("y")).as("ea"),
            greatest(col("apex"), col("y")).as("eb")),
          struct(least(col("x"), col("y")).as("ea"),
            greatest(col("x"), col("y")).as("eb")))).as("e"))
      val scalars = inc
        .groupBy(col("e"))
        .agg(count(when(col("m") < 1, 1)).as("c1"),
          count(when(col("m") < 2, 1)).as("c2"),
          count(lit(1)).as("c4"))
        .agg(expr("coalesce(sum(c1), 0) div 3").as("s1"),
          expr("coalesce(sum(c1 * (c1 - 1) div 2), 0)").as("rc2_1"),
          expr("coalesce(sum(c2), 0) div 3").as("s2"),
          expr("coalesce(sum(c2 * (c2 - 1) div 2), 0)").as("rc2_2"),
          expr("coalesce(sum(c4), 0) div 3").as("s4"),
          expr("coalesce(sum(c4 * (c4 - 1) div 2), 0)").as("rc2_4"))
      val arms = scalars.select(explode(array(
          struct(lit(1L).as("keep_hex"), col("s1").as("sampled_tri"),
            col("rc2_1").as("rc2")),
          struct(lit(2L).as("keep_hex"), col("s2").as("sampled_tri"),
            col("rc2_2").as("rc2")),
          struct(lit(4L).as("keep_hex"), col("s4").as("sampled_tri"),
            col("rc2_4").as("rc2")))).as("arm"))
        .select(col("arm.keep_hex").as("keep_hex"),
          col("arm.sampled_tri").as("sampled_tri"), col("arm.rc2").as("rc2"))
      arms
        .select(col("keep_hex"), col("sampled_tri"),
          expr("sampled_tri * 4096 div (keep_hex*keep_hex*keep_hex)")
            .as("est_tri"),
          // overflow-safe EXACT integral rescale (ADVICE r11): the naive
          // rc2 * 2^20 wraps silently in Spark (and raises in DuckDB) at
          // rc2 >= 2^43 — reachable on an extreme-scale graph while the
          // final r_hat still fits. With rc2 = q·k⁵ + s (0 <= s < k⁵),
          // rc2·2^20 div k⁵ = q·2^20 + s·2^20 div k⁵ exactly (k⁵ divides
          // q·k⁵·2^20), and s·2^20 < k⁵·2^20 <= 2^30 never overflows —
          // the result now overflows only when r_hat itself does
          expr("(rc2 div (keep_hex*keep_hex*keep_hex*keep_hex*keep_hex))" +
            " * 1048576 + ((rc2 % (keep_hex*keep_hex*keep_hex*keep_hex" +
            "*keep_hex)) * 1048576) div (keep_hex*keep_hex*keep_hex" +
            "*keep_hex*keep_hex)").as("r_hat"))
        .withColumn("stderr_tri",
          // NULL, not 0, when the arm sampled nothing (VERDICT r11 item
          // 4): sampled_tri = 0 means "no signal at this sampling rate",
          // not "zero error" — a k=1 arm of a sparse graph must not read
          // as perfectly estimated. Both double multiplies cast FIRST
          // (ADVICE r11): est_tri·(4096−k³) in Long wraps at ~2^51; in
          // IEEE it rounds past 2^53 instead — identical on both engines
          expr("CASE WHEN sampled_tri = 0 THEN NULL ELSE " +
            "sqrt(CAST(est_tri AS DOUBLE) * (4096 - keep_hex*keep_hex" +
            "*keep_hex) / (keep_hex*keep_hex*keep_hex)" +
            " + 2.0 * CAST(r_hat AS DOUBLE) * (16 - keep_hex) / keep_hex)" +
            " END"))
        .orderBy(col("keep_hex"))
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q292_quantile_effects" ->
      """WITH e AS (
        |  SELECT user_id % 2 = 0 AS is_a,
        |         CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |v AS (
        |  SELECT is_a,
        |         CAST(quantile_cont(cents, 0.25) * 4 AS BIGINT) AS q1,
        |         CAST(quantile_cont(cents, 0.5) * 4 AS BIGINT) AS q2,
        |         CAST(quantile_cont(cents, 0.75) * 4 AS BIGINT) AS q3
        |  FROM e GROUP BY 1),
        |j AS (
        |  SELECT a.q1 AS a1, a.q2 AS a2, a.q3 AS a3,
        |         b.q1 AS b1, b.q2 AS b2, b.q3 AS b3
        |  FROM v a JOIN v b ON a.is_a AND NOT b.is_a)
        |SELECT CAST(250 AS INT) AS quantile_permille, a1 AS a_x4,
        |       b1 AS b_x4, a1 - b1 AS effect_x4 FROM j
        |UNION ALL
        |SELECT 500, a2, b2, a2 - b2 FROM j
        |UNION ALL
        |SELECT 750, a3, b3, a3 - b3 FROM j""".stripMargin,

    "q293_first_touch" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |  FROM events),
        |t AS (
        |  SELECT *,
        |    first_value(CASE WHEN event_type <> 'purchase'
        |                THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS ft_type
        |  FROM e)
        |SELECT coalesce(ft_type, 'unattributed') AS channel,
        |       CAST(count(*) AS BIGINT) AS n_conversions,
        |       CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT)
        |         AS cents
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1""".stripMargin,

    "q288_gini_by_nation" ->
      """WITH byc AS (
        |  SELECT c_nationkey AS nation, o_custkey,
        |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT nation, x,
        |         CAST(row_number() OVER (PARTITION BY nation
        |           ORDER BY x ASC, o_custkey ASC) AS BIGINT) AS i
        |  FROM byc)
        |SELECT nation, CAST(count(*) AS BIGINT) AS n,
        |       (1000 * (2 * CAST(sum(i * x) AS BIGINT)
        |         - (CAST(count(*) AS BIGINT) + 1)
        |           * CAST(sum(x) AS BIGINT)))
        |         // (CAST(count(*) AS BIGINT) * CAST(sum(x) AS BIGINT))
        |         AS gini_permille
        |FROM r GROUP BY 1""".stripMargin,

    "q289_hoover_index" ->
      """WITH byc AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total,
        |               CAST(count(*) AS BIGINT) AS n FROM byc)
        |SELECT n,
        |       CAST(sum(abs(n * ((1000000 * c) // total) - 1000000))
        |         AS BIGINT) // (2 * n) AS hoover_ppm
        |FROM byc CROSS JOIN tot
        |GROUP BY 1""".stripMargin,

    "q290_quartile_dispersion" ->
      """WITH x AS (
        |  SELECT c_mktsegment,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |       CAST(quantile_cont(cents, 0.25) * 4 AS BIGINT) AS q1_x4,
        |       CAST(quantile_cont(cents, 0.75) * 4 AS BIGINT) AS q3_x4,
        |       (1000 * (CAST(quantile_cont(cents, 0.75) * 4 AS BIGINT)
        |         - CAST(quantile_cont(cents, 0.25) * 4 AS BIGINT)))
        |         // (CAST(quantile_cont(cents, 0.75) * 4 AS BIGINT)
        |           + CAST(quantile_cont(cents, 0.25) * 4 AS BIGINT))
        |         AS qcd_permille
        |FROM x GROUP BY 1""".stripMargin,

    "q287_srm_guardrail" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        |g AS (
        |  SELECT d,
        |         CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT)
        |           AS n_a,
        |         CAST(count(*) FILTER (WHERE user_id % 2 = 1) AS BIGINT)
        |           AS n_b
        |  FROM du GROUP BY 1)
        |SELECT d, n_a, n_b,
        |       (n_a - n_b) * (n_a - n_b) AS dev2,
        |       (n_a - n_b) * (n_a - n_b) > 4 * (n_a + n_b) AS srm_flag
        |FROM g""".stripMargin,

    "q283_correlogram" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |idx AS (SELECT n,
        |               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        |        FROM daily),
        |lags AS (SELECT CAST(unnest(generate_series(1, 10)) AS BIGINT)
        |           AS lag),
        |m AS (
        |  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(sum(a.n) AS BIGINT) AS sx,
        |         CAST(sum(b.n) AS BIGINT) AS sy,
        |         CAST(sum(a.n * b.n) AS BIGINT) AS sxy,
        |         CAST(sum(a.n * a.n) AS BIGINT) AS sxx,
        |         CAST(sum(b.n * b.n) AS BIGINT) AS syy
        |  FROM idx a CROSS JOIN lags JOIN idx b ON b.i = a.i + lag
        |  GROUP BY 1)
        |SELECT lag, n_pairs,
        |       n_pairs * sxy - sx * sy AS num,
        |       CAST(n_pairs * sxy - sx * sy AS DOUBLE)
        |         / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
        |          * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))) AS acf
        |FROM m""".stripMargin,

    "q281_return_rate_trend" ->
      """SELECT CAST(date_trunc('quarter', CAST(o_orderdate AS DATE))
        |         AS DATE) AS q,
        |       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |         * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents,
        |       CAST(sum(CASE WHEN l_returnflag = 'R'
        |         THEN CAST(floor(l_extendedprice * (1.0 - l_discount)
        |           * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
        |         AS returned_cents,
        |       (1000 * CAST(sum(CASE WHEN l_returnflag = 'R'
        |         THEN CAST(floor(l_extendedprice * (1.0 - l_discount)
        |           * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT))
        |         // CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |           * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS return_share_permille
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "q282_longest_silence" ->
      """WITH g AS (
        |  SELECT user_id,
        |         epoch_us(ts) - lag(epoch_us(ts))
        |           OVER (PARTITION BY user_id
        |                 ORDER BY epoch_us(ts), event_id) AS gap_us
        |  FROM events)
        |SELECT user_id, CAST(max(gap_us) AS BIGINT) AS max_gap_us,
        |       CAST(count(*) AS BIGINT) AS n_gaps
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY 1
        |ORDER BY max_gap_us DESC, user_id ASC
        |LIMIT 20""".stripMargin,

    "q278_rolling_band_anomaly" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT)
        |           AS x
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |w AS (
        |  SELECT d, x,
        |         CAST(count(*) OVER tw AS BIGINT) AS nw,
        |         CAST(sum(x) OVER tw AS BIGINT) AS s,
        |         CAST(sum(x * x) OVER tw AS BIGINT) AS q
        |  FROM daily
        |  WINDOW tw AS (ORDER BY d ROWS BETWEEN 7 PRECEDING
        |                AND 1 PRECEDING))
        |SELECT d, x, s,
        |       (x * 7 - s) * (x * 7 - s) AS dev2_x49,
        |       4 * (q * 7 - s * s) AS band2_x49,
        |       (x * 7 - s) * (x * 7 - s) > 4 * (q * 7 - s * s)
        |         AS is_anomaly
        |FROM w WHERE nw = 7""".stripMargin,

    "q279_ks_uniformity" ->
      """WITH bymin AS (
        |  SELECT CAST(hour(ts) * 60 + minute(ts) AS BIGINT) AS m,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |cum AS (
        |  SELECT m,
        |         CAST(sum(c) OVER (ORDER BY m
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum,
        |         CAST((SELECT sum(c) FROM bymin) AS BIGINT) AS n
        |  FROM bymin)
        |SELECT m, cum, n, abs(cum * 1440 - n * (m + 1)) AS d_scaled
        |FROM cum
        |ORDER BY d_scaled DESC, m ASC
        |LIMIT 1""".stripMargin,

    "q277_kendall_tau" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x,
        |         CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT)
        |           AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |pairs AS (
        |  SELECT a.x - b.x AS dx, a.y - b.y AS dy
        |  FROM daily a JOIN daily b ON a.d < b.d),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(count(*) FILTER (WHERE dx * dy > 0) AS BIGINT)
        |           AS concordant,
        |         CAST(count(*) FILTER (WHERE dx * dy < 0) AS BIGINT)
        |           AS discordant,
        |         CAST(count(*) FILTER (WHERE dx = 0) AS BIGINT) AS ties_x,
        |         CAST(count(*) FILTER (WHERE dy = 0) AS BIGINT) AS ties_y
        |  FROM pairs)
        |SELECT n_pairs, concordant, discordant, ties_x, ties_y,
        |       CAST(concordant - discordant AS DOUBLE)
        |         / (sqrt(CAST(n_pairs - ties_x AS DOUBLE))
        |          * sqrt(CAST(n_pairs - ties_y AS DOUBLE))) AS tau_b
        |FROM agg""".stripMargin,

    "q273_new_vs_repeat" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate, o_totalprice,
        |         min(o_orderdate) OVER (PARTITION BY o_custkey)
        |           AS first_date
        |  FROM orders)
        |SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS y,
        |       CAST(sum(CASE WHEN o_orderdate = first_date
        |         THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |         ELSE 0 END) AS BIGINT) AS new_cents,
        |       CAST(sum(CASE WHEN o_orderdate <> first_date
        |         THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |         ELSE 0 END) AS BIGINT) AS repeat_cents,
        |       (1000 * CAST(sum(CASE WHEN o_orderdate <> first_date
        |         THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |         ELSE 0 END) AS BIGINT))
        |         // CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
        |         AS BIGINT)) AS BIGINT) AS repeat_share_permille
        |FROM o GROUP BY 1""".stripMargin,

    "q274_price_dispersion" ->
      """WITH x AS (
        |  SELECT p_type,
        |         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS x
        |  FROM part),
        |m AS (
        |  SELECT p_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM x GROUP BY 1)
        |SELECT p_type, n, sx // n AS mean_cents,
        |       sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         / CAST(sx AS DOUBLE) AS cv
        |FROM m""".stripMargin,

    "q275_max_drawdown" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |c AS (
        |  SELECT d,
        |         CAST(sum(cents) OVER (ORDER BY d
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum_cents
        |  FROM daily),
        |p AS (
        |  SELECT d, cum_cents,
        |         CAST(max(cum_cents) OVER (ORDER BY d
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS peak_cents
        |  FROM c)
        |SELECT d, cum_cents, peak_cents,
        |       peak_cents - cum_cents AS drawdown_cents
        |FROM p
        |ORDER BY drawdown_cents DESC, d ASC
        |LIMIT 1""".stripMargin,

    "q271_revenue_hhi" ->
      """WITH byc AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total,
        |               CAST(count(*) AS BIGINT) AS n_customers FROM byc)
        |SELECT n_customers, total,
        |       CAST(sum(((1000000 * c) // total) * ((1000000 * c) // total))
        |         AS BIGINT) // 1000000 AS hhi_ppm
        |FROM byc CROSS JOIN tot
        |GROUP BY 1, 2""".stripMargin,

    "q272_simpsons_flip" ->
      """WITH li AS (
        |  SELECT s_nationkey AS nation,
        |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
        |         CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
        |g AS (
        |  SELECT nation, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM li GROUP BY 1),
        |p AS (
        |  SELECT CAST(sum(n) AS BIGINT) * CAST(sum(sxy) AS BIGINT)
        |         - CAST(sum(sx) AS BIGINT) * CAST(sum(sy) AS BIGINT)
        |           AS pooled_cov_num
        |  FROM g)
        |SELECT nation, n,
        |       n * sxy - sx * sy AS group_cov_num,
        |       pooled_cov_num,
        |       sign(n * sxy - sx * sy) <> sign(pooled_cov_num)
        |         AS sign_flips
        |FROM g CROSS JOIN p""".stripMargin,

    "q269_khop_neighborhood" ->
      """WITH e AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |seeds AS (SELECT DISTINCT src AS node FROM e WHERE src < 10),
        |h1 AS (SELECT DISTINCT e.dst AS node
        |       FROM e JOIN seeds s ON e.src = s.node),
        |h2 AS (SELECT DISTINCT e.dst AS node
        |       FROM e JOIN h1 ON e.src = h1.node)
        |SELECT node, CAST(min(hop) AS BIGINT) AS hop FROM (
        |  SELECT node, 0 AS hop FROM seeds
        |  UNION ALL SELECT node, 1 FROM h1
        |  UNION ALL SELECT node, 2 FROM h2)
        |GROUP BY 1""".stripMargin,

    "q267_weighted_median" ->
      """WITH x AS (
        |  SELECT p_brand,
        |         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
        |           AS retail_cents,
        |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |expanded AS (
        |  SELECT p_brand, retail_cents
        |  FROM x, unnest(generate_series(1, qty)))
        |SELECT p_brand,
        |       (SELECT CAST(sum(qty) AS BIGINT) FROM x x2
        |        WHERE x2.p_brand = expanded.p_brand) AS total_units,
        |       CAST(quantile_cont(retail_cents, 0.5) * 2 AS BIGINT)
        |         AS med2_cents
        |FROM expanded GROUP BY 1""".stripMargin,

    "q268_modularity" ->
      s"""WITH ${lpaCtes(3)},
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
         |        FROM e GROUP BY 1),
         |dc AS (
         |  SELECT l.label, CAST(sum(d.deg) AS BIGINT) AS d_c
         |  FROM deg d JOIN l3 l ON d.node = l.node GROUP BY 1),
         |intra AS (
         |  SELECT ls.label, CAST(count(*) AS BIGINT) AS intra_c
         |  FROM e JOIN l3 ls ON e.src = ls.node
         |         JOIN l3 ld ON e.dst = ld.node
         |  WHERE ls.label = ld.label GROUP BY 1),
         |e2t AS (SELECT CAST(count(*) AS BIGINT) AS e2 FROM e),
         |agg AS (
         |  SELECT max(e2t.e2) AS e2,
         |         CAST(count(*) AS BIGINT) AS n_communities,
         |         CAST(sum(e2t.e2 * COALESCE(i.intra_c, 0)
         |           - dc.d_c * dc.d_c) AS BIGINT) AS q_scaled
         |  FROM dc LEFT JOIN intra i ON dc.label = i.label
         |  CROSS JOIN e2t)
         |SELECT e2, n_communities, q_scaled,
         |       (1000 * q_scaled) // (e2 * e2) AS q_permille
         |FROM agg""".stripMargin,

    "q265_yoy_growth" ->
      """WITH byy AS (
        |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS y,
        |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           AS BIGINT) AS cents
        |  FROM orders GROUP BY 1)
        |SELECT y, cents,
        |       lag(cents) OVER (ORDER BY y) AS prev_cents,
        |       (1000 * (cents - lag(cents) OVER (ORDER BY y)))
        |         // lag(cents) OVER (ORDER BY y) AS yoy_permille
        |FROM byy""".stripMargin,

    "q266_change_contribution" ->
      """WITH bynation AS (
        |  SELECT n_name AS nation,
        |         CAST(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 2000
        |           THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |           ELSE 0 END) AS BIGINT) AS cents_y1,
        |         CAST(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 2001
        |           THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |           ELSE 0 END) AS BIGINT) AS cents_y2
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE year(CAST(o_orderdate AS DATE)) IN (2000, 2001)
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(cents_y2 - cents_y1) AS BIGINT)
        |          AS total_delta FROM bynation)
        |SELECT nation, cents_y1, cents_y2,
        |       cents_y2 - cents_y1 AS delta_cents,
        |       (1000 * (cents_y2 - cents_y1)) // total_delta
        |         AS share_of_move_permille
        |FROM bynation CROSS JOIN tot""".stripMargin,

    "q258_growth_accounting" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id,
        |         CAST((CAST(ts AS DATE) - DATE '1970-01-05') // 7 AS BIGINT)
        |           AS wk
        |  FROM events),
        |lagged AS (
        |  SELECT user_id, wk,
        |         lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk
        |  FROM uw),
        |bywk AS (
        |  SELECT wk,
        |         CAST(count(*) AS BIGINT) AS actives,
        |         CAST(count(*) FILTER (WHERE prev_wk IS NULL) AS BIGINT)
        |           AS new_users,
        |         CAST(count(*) FILTER (WHERE prev_wk = wk - 1) AS BIGINT)
        |           AS retained,
        |         CAST(count(*) FILTER (WHERE prev_wk IS NOT NULL
        |           AND prev_wk < wk - 1) AS BIGINT) AS resurrected
        |  FROM lagged GROUP BY 1)
        |SELECT wk, actives, new_users, retained, resurrected,
        |       CASE WHEN lag(actives) OVER (ORDER BY wk) IS NULL THEN 0
        |            ELSE lag(actives) OVER (ORDER BY wk) - retained END
        |         AS churned
        |FROM bywk""".stripMargin,

    "q259_stickiness" ->
      """WITH base AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d,
        |         CAST((CAST(ts AS DATE) - DATE '1970-01-05') // 7 AS BIGINT)
        |           AS wk
        |  FROM events),
        |daily AS (
        |  SELECT wk, CAST(sum(dau) AS BIGINT) AS dau_sum,
        |         CAST(count(*) AS BIGINT) AS n_days
        |  FROM (SELECT wk, d, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |        FROM base GROUP BY 1, 2)
        |  GROUP BY 1),
        |weekly AS (
        |  SELECT wk, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |  FROM base GROUP BY 1)
        |SELECT wk, n_days, dau_sum, wau,
        |       (1000 * dau_sum) // (n_days * wau) AS stickiness_permille
        |FROM daily JOIN weekly USING (wk)""".stripMargin,

    "q238_survival_curve" ->
      """WITH RECURSIVE ten AS (
        |  SELECT CAST(date_diff('day', min(CAST(o_orderdate AS DATE)),
        |           max(CAST(o_orderdate AS DATE))) AS BIGINT) AS tenure,
        |         date_diff('day', max(CAST(o_orderdate AS DATE)),
        |           (SELECT max(CAST(o_orderdate AS DATE)) FROM orders)) > 30
        |           AS churned
        |  FROM orders GROUP BY o_custkey),
        |byt AS (
        |  SELECT tenure, CAST(count(*) AS BIGINT) AS n_t,
        |         CAST(count(*) FILTER (WHERE churned) AS BIGINT) AS d_t
        |  FROM ten GROUP BY 1),
        |risk AS (
        |  SELECT tenure, n_t, d_t,
        |         CAST((SELECT sum(n_t) FROM byt) - sum(n_t)
        |           OVER (ORDER BY tenure
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           + n_t AS BIGINT) AS at_risk,
        |         CAST(row_number() OVER (ORDER BY tenure) AS BIGINT) AS i
        |  FROM byt),
        |s AS (
        |  SELECT i, tenure, n_t, d_t, at_risk,
        |         (1000000 * (at_risk - d_t)) // at_risk AS surv_micro
        |  FROM risk WHERE i = 1
        |  UNION ALL
        |  SELECT r.i, r.tenure, r.n_t, r.d_t, r.at_risk,
        |         (s.surv_micro * (r.at_risk - r.d_t)) // r.at_risk
        |  FROM risk r JOIN s ON r.i = s.i + 1)
        |SELECT tenure, n_t, d_t, at_risk, surv_micro FROM s""".stripMargin,

    "q235_binary_segmentation" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |sc AS (
        |  SELECT d, n,
        |         CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
        |         CAST(sum(n) OVER (ORDER BY d
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS s_i
        |  FROM daily),
        |tot AS (SELECT CAST(max(i) AS BIGINT) AS nd,
        |               CAST(sum(n) AS BIGINT) AS tt FROM sc),
        |l1 AS (
        |  SELECT d, abs(nd * s_i - i * tt) AS stat_scaled
        |  FROM sc, tot
        |  ORDER BY stat_scaled DESC, d ASC LIMIT 1),
        |seg AS (
        |  SELECT daily.d, daily.n,
        |         CASE WHEN daily.d <= l1.d THEN 'left' ELSE 'right' END
        |           AS segment
        |  FROM daily, l1),
        |sc2 AS (
        |  SELECT segment, d, n,
        |         CAST(row_number() OVER (PARTITION BY segment ORDER BY d)
        |           AS BIGINT) AS i,
        |         CAST(sum(n) OVER (PARTITION BY segment ORDER BY d
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS s_i
        |  FROM seg),
        |tot2 AS (
        |  SELECT segment, CAST(max(i) AS BIGINT) AS nd,
        |         CAST(sum(n) AS BIGINT) AS tt
        |  FROM sc2 GROUP BY 1),
        |l2 AS (
        |  SELECT segment, d, stat_scaled FROM (
        |    SELECT sc2.segment, sc2.d,
        |           abs(tot2.nd * sc2.s_i - sc2.i * tot2.tt) AS stat_scaled,
        |           row_number() OVER (PARTITION BY sc2.segment
        |             ORDER BY abs(tot2.nd * sc2.s_i - sc2.i * tot2.tt) DESC,
        |                      sc2.d ASC) AS r
        |    FROM sc2 JOIN tot2 USING (segment))
        |  WHERE r = 1)
        |SELECT CAST(1 AS BIGINT) AS level, 'all' AS segment,
        |       d AS cp_date, stat_scaled FROM l1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), segment, d, stat_scaled FROM l2""".stripMargin,

    "q236_lorenz_curve" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |dec AS (
        |  SELECT CAST(ntile(10) OVER (ORDER BY cents ASC, o_custkey ASC)
        |           AS BIGINT) AS decile,
        |         cents
        |  FROM cust),
        |agg AS (
        |  SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
        |         CAST(sum(cents) AS BIGINT) AS dec_cents
        |  FROM dec GROUP BY 1),
        |tot AS (SELECT CAST(sum(dec_cents) AS BIGINT) AS t FROM agg)
        |SELECT decile, n_cust, dec_cents,
        |       CAST(sum(dec_cents) OVER (ORDER BY decile
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS cum_cents,
        |       (1000 * CAST(sum(dec_cents) OVER (ORDER BY decile
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT)) // t AS cum_share_permille
        |FROM agg, tot""".stripMargin,

    "q233_triple_itemsets" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
        |SELECT p1, p2, p3, support FROM (
        |  SELECT a.pk AS p1, b2.pk AS p2, c.pk AS p3,
        |         CAST(count(*) AS BIGINT) AS support
        |  FROM b a JOIN b b2 ON a.ok = b2.ok AND a.pk < b2.pk
        |           JOIN b c  ON a.ok = c.ok AND b2.pk < c.pk
        |  GROUP BY 1, 2, 3)
        |WHERE support >= 2
        |ORDER BY support DESC, p1, p2, p3 LIMIT 15""".stripMargin,

    "q234_sql_facade" ->
      s"""WITH keepers AS (
         |  SELECT min(doc_id) AS doc_id
         |  FROM (SELECT doc_id, md5($NormSql) AS fp FROM documents)
         |  GROUP BY fp),
         |quality AS (
         |  SELECT doc_id,
         |         CAST(len(list_filter($ToksSql,
         |              x -> list_contains(['the','a','of','to','in','is','and'], x))) AS DOUBLE)
         |           / len($ToksSql) AS stopword_ratio
         |  FROM documents)
         |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_keepers,
         |       CAST(count(*) FILTER (WHERE q.stopword_ratio < 0.05)
         |         AS BIGINT) AS n_low_stopword
         |FROM keepers k
         |JOIN documents d ON k.doc_id = d.doc_id
         |JOIN quality q ON q.doc_id = k.doc_id
         |GROUP BY 1""".stripMargin,

    "q231_rbo_rankings" -> {
      val valuesList = RboWeightsMicro.zipWithIndex
        .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(", ")
      s"""WITH agg AS (
         |  SELECT l_partkey,
         |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
         |           AS BIGINT)) AS BIGINT) AS cents,
         |         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
         |  FROM lineitem GROUP BY 1),
         |ra AS (
         |  SELECT l_partkey, ra FROM (
         |    SELECT l_partkey, row_number() OVER
         |      (ORDER BY cents DESC, l_partkey ASC) AS ra FROM agg)
         |  WHERE ra <= 20),
         |rb AS (
         |  SELECT l_partkey, rb FROM (
         |    SELECT l_partkey, row_number() OVER
         |      (ORDER BY n_orders DESC, l_partkey ASC) AS rb FROM agg)
         |  WHERE rb <= 20),
         |m AS (
         |  SELECT greatest(ra.ra, rb.rb) AS m
         |  FROM ra JOIN rb USING (l_partkey)),
         |w(d, w_micro) AS (VALUES $valuesList)
         |SELECT d, w_micro, overlap, term_micro,
         |       CAST(sum(term_micro) OVER (ORDER BY d
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |         AS BIGINT) AS rbo_cum_micro
         |FROM (
         |  SELECT CAST(w.d AS BIGINT) AS d,
         |         CAST(w.w_micro AS BIGINT) AS w_micro,
         |         CAST(count(m.m) AS BIGINT) AS overlap,
         |         (CAST(w.w_micro AS BIGINT) * count(m.m))
         |           // CAST(w.d AS BIGINT) AS term_micro
         |  FROM w LEFT JOIN m ON m.m <= w.d
         |  GROUP BY w.d, w.w_micro)""".stripMargin
    },

    "q226_trimmed_mean" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS priority,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |th AS (
        |  SELECT priority, quantile_cont(cents, 0.1) AS lo,
        |         quantile_cont(cents, 0.9) AS hi
        |  FROM o GROUP BY 1)
        |SELECT priority, CAST(count(*) AS BIGINT) AS n_kept,
        |       CAST(sum(cents) AS BIGINT) AS sum_cents,
        |       CAST(sum(cents) AS BIGINT) // CAST(count(*) AS BIGINT)
        |         AS trimmed_mean_cents
        |FROM o JOIN th USING (priority)
        |WHERE cents >= lo AND cents <= hi
        |GROUP BY 1""".stripMargin,

    "q227_fano_burstiness" ->
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, n_days, s1, s2,
        |       (1000000 * (n_days * s2 - s1 * s1)) // (n_days * s1)
        |         AS fano_micro
        |FROM (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(c) AS BIGINT) AS s1,
        |         CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM d GROUP BY 1)""".stripMargin,

    "q223_ks_matrix" ->
      """WITH counts AS (
        |  SELECT source, n_chars AS x, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |grid AS (
        |  SELECT s.source, v.x
        |  FROM (SELECT DISTINCT source FROM counts) s
        |  CROSS JOIN (SELECT DISTINCT x FROM counts) v),
        |filled AS (
        |  SELECT g.source, g.x, coalesce(c.c, 0) AS c0
        |  FROM grid g LEFT JOIN counts c
        |    ON g.source = c.source AND g.x = c.x),
        |cdf AS (
        |  SELECT source, x,
        |         CAST(sum(c0) OVER (PARTITION BY source ORDER BY x
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cd,
        |         CAST(sum(c0) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM filled)
        |SELECT src_a, src_b, n_a, n_b, d_scaled,
        |       (1000 * d_scaled) // (n_a * n_b) AS d_permille
        |FROM (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |         a.n AS n_a, b.n AS n_b,
        |         CAST(max(abs(b.n * a.cd - a.n * b.cd)) AS BIGINT)
        |           AS d_scaled
        |  FROM cdf a JOIN cdf b
        |    ON a.x = b.x AND a.source < b.source
        |  GROUP BY 1, 2, 3, 4)""".stripMargin,

    "q218_ks_lengths" ->
      """WITH a AS (
        |  SELECT n_chars AS x, CAST(count(*) AS BIGINT) AS ca
        |  FROM documents WHERE source = 'src0' GROUP BY 1),
        |b AS (
        |  SELECT n_chars AS x, CAST(count(*) AS BIGINT) AS cb
        |  FROM documents WHERE source = 'src1' GROUP BY 1),
        |merged AS (
        |  SELECT coalesce(a.x, b.x) AS x,
        |         coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        |  FROM a FULL OUTER JOIN b ON a.x = b.x),
        |scored AS (
        |  SELECT x,
        |         CAST(sum(ca) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
        |           PRECEDING AND CURRENT ROW) AS BIGINT) AS c1,
        |         CAST(sum(cb) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
        |           PRECEDING AND CURRENT ROW) AS BIGINT) AS c2,
        |         CAST(sum(ca) OVER () AS BIGINT) AS n_a,
        |         CAST(sum(cb) OVER () AS BIGINT) AS n_b
        |  FROM merged)
        |SELECT n_a, n_b, x AS x_at_max,
        |       CAST(abs(n_b * c1 - n_a * c2) AS BIGINT) AS d_scaled
        |FROM (SELECT *, row_number() OVER (
        |        ORDER BY abs(n_b * c1 - n_a * c2) DESC, x) AS r
        |      FROM scored)
        |WHERE r = 1""".stripMargin,

    "q215_mann_kendall" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS d,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |pairs AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(sum(CASE WHEN b.n > a.n THEN 1
        |                       WHEN b.n < a.n THEN -1 ELSE 0 END)
        |           AS BIGINT) AS s_stat
        |  FROM daily a JOIN daily b ON a.d < b.d),
        |ties AS (
        |  SELECT CAST(sum(t) AS BIGINT) AS n_days,
        |         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        |  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY n))
        |SELECT n_days, n_pairs, s_stat,
        |       CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
        |         AS BIGINT) AS var18
        |FROM pairs, ties""".stripMargin,

    "q216_theil_sen" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS d,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |slopes AS (
        |  SELECT a.d AS d1, b.d AS d2,
        |         CAST(floor((b.n - a.n) * 1000000 / (b.d - a.d) + 0.5)
        |           AS BIGINT) AS slope_micro
        |  FROM daily a JOIN daily b ON a.d < b.d),
        |ranked AS (
        |  SELECT slope_micro,
        |         CAST(row_number() OVER (ORDER BY slope_micro, d1, d2)
        |           AS BIGINT) AS r,
        |         CAST(count(*) OVER () AS BIGINT) AS cnt
        |  FROM slopes)
        |SELECT cnt AS n_pairs, slope_micro AS median_slope_micro
        |FROM ranked WHERE r = (cnt + 1) // 2""".stripMargin,

    "q199_rolling_median_trend" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day_ord,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT day_ord, n,
        |         CAST(quantile_cont(n, 0.5) OVER (
        |           ORDER BY day_ord
        |           RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) * 2 AS BIGINT)
        |           AS trend2
        |  FROM daily)
        |SELECT day_ord, n, trend2, n * 2 - trend2 AS resid2 FROM w""".stripMargin,

    "q200_ltv_cohorts" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
        |           AS m_ord,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |c AS (SELECT o_custkey, min(m_ord) AS cohort_ord FROM o GROUP BY 1)
        |SELECT cohort_ord, m_ord - cohort_ord AS months_since,
        |       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
        |       CAST(sum(cents) AS BIGINT) AS revenue_cents
        |FROM o JOIN c USING (o_custkey)
        |GROUP BY 1, 2""".stripMargin,

    "q194_link_scores" ->
      """WITH po AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM po x JOIN po y ON x.o = y.o AND x.p < y.p),
        |adj AS (SELECT a AS n, b AS m FROM e UNION ALL SELECT b, a FROM e),
        |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
        |cm AS (
        |  SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS common
        |  FROM e
        |  JOIN adj x ON x.n = e.a
        |  JOIN adj y ON y.n = e.b AND y.m = x.m
        |  GROUP BY 1, 2)
        |SELECT cm.a, cm.b, common,
        |       CAST(da.deg + db.deg - common AS BIGINT) AS union_size,
        |       (1000000 * common) // (da.deg + db.deg - common) AS jaccard_micro
        |FROM cm
        |JOIN deg da ON da.n = cm.a
        |JOIN deg db ON db.n = cm.b""".stripMargin,

    "q195_weekday_anomaly" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |st AS (
        |  SELECT isodow(day) - 1 AS wd,
        |         CAST(quantile_cont(n, 0.5) * 2 AS BIGINT) AS med2
        |  FROM daily GROUP BY 1),
        |dev AS (
        |  SELECT day, st.wd, n, med2, abs(n * 2 - med2) AS dev2
        |  FROM daily JOIN st ON isodow(day) - 1 = st.wd),
        |mad AS (
        |  SELECT wd, CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
        |  FROM dev GROUP BY 1)
        |SELECT day, CAST(dev.wd AS BIGINT) AS wd, n, med2, dev2, mad4
        |FROM dev JOIN mad USING (wd)
        |WHERE dev2 > mad4""".stripMargin,

    "q172_spearman_daily" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT CAST(row_number() OVER (ORDER BY n_events, d) AS BIGINT) AS ra,
        |         CAST(row_number() OVER (ORDER BY cents, d) AS BIGINT) AS rb
        |  FROM daily)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2,
        |       1.0 - (6.0 * CAST(sum((ra - rb) * (ra - rb)) AS DOUBLE)) /
        |         CAST(count(*) * (count(*) * count(*) - 1) AS DOUBLE) AS rho
        |FROM r""".stripMargin,

    "q173_ema_daily" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |idx AS (SELECT d, cents,
        |               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        |        FROM daily),
        |e AS (
        |  SELECT i, d, cents, cents AS ema_cents FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT idx.i, idx.d, idx.cents,
        |         (20 * idx.cents + 80 * e.ema_cents) // 100
        |  FROM idx JOIN e ON idx.i = e.i + 1)
        |SELECT d, cents, ema_cents FROM e""".stripMargin,

    "q174_kcore" -> kCoreOracleSql(80, 6),

    "q178_backlog_curve" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |              AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |cap AS (SELECT CAST(sum(cents) AS BIGINT) // count(*) AS cap
        |        FROM daily),
        |idx AS (SELECT d, cents,
        |               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        |        FROM daily),
        |e AS (
        |  SELECT i, d, cents,
        |         greatest(CAST(0 AS BIGINT), cents - cap.cap) AS backlog
        |  FROM idx, cap WHERE i = 1
        |  UNION ALL
        |  SELECT idx.i, idx.d, idx.cents,
        |         greatest(CAST(0 AS BIGINT),
        |                  e.backlog + idx.cents - (SELECT cap FROM cap))
        |  FROM idx JOIN e ON idx.i = e.i + 1)
        |SELECT d, cents, (SELECT cap FROM cap) AS cap, backlog FROM e""".stripMargin,

    "q179_share_hierarchy" ->
      """WITH rev AS (
        |  SELECT r_name, n_name,
        |         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |              * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS rev_micro
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2)
        |SELECT r_name, n_name, rev_micro,
        |       CAST((CAST(rev_micro AS HUGEINT) * 1000000)
        |         // CAST(sum(rev_micro) OVER (PARTITION BY r_name) AS BIGINT)
        |         AS BIGINT) AS nation_in_region_ppm,
        |       CAST((CAST(sum(rev_micro) OVER (PARTITION BY r_name) AS HUGEINT)
        |          * 1000000)
        |         // CAST(sum(rev_micro) OVER () AS BIGINT)
        |         AS BIGINT) AS region_of_total_ppm
        |FROM rev""".stripMargin,

    "q180_reactivation" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (
        |  SELECT user_id,
        |         (ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |                                   ORDER BY ts_us, event_id))
        |           // 86400000000 AS gap_days
        |  FROM p)
        |SELECT user_id,
        |       CAST(count(*) AS BIGINT) AS n_purchases,
        |       CAST(count(*) FILTER (WHERE gap_days >= 7) AS BIGINT)
        |         AS n_reactivations,
        |       CAST(max(gap_days) AS BIGINT) AS max_gap_days
        |FROM g GROUP BY 1
        |HAVING count(*) FILTER (WHERE gap_days >= 7) >= 1""".stripMargin,

    "q181_gap_histogram" ->
      """WITH g AS (
        |  SELECT (epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |            PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |           // 1000000 AS gap_s
        |  FROM events)
        |SELECT CAST(length(format('{:b}', gap_s)) AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_gaps,
        |       CAST(min(gap_s) AS BIGINT) AS min_gap_s,
        |       CAST(max(gap_s) AS BIGINT) AS max_gap_s
        |FROM g WHERE gap_s IS NOT NULL
        |GROUP BY 1""".stripMargin,

    "q182_linear_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
        |         CASE WHEN event_type = 'purchase'
        |              THEN CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT) END
        |           AS p_cents
        |  FROM events),
        |t AS (
        |  SELECT user_id, event_id, event_type, ts_us,
        |         last_value(CASE WHEN event_type = 'purchase'
        |             THEN struct_pack(p_us := ts_us, p_id := event_id,
        |                              cents := p_cents) END IGNORE NULLS)
        |           OVER (PARTITION BY user_id
        |                 ORDER BY ts_us DESC, event_id DESC
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS np
        |  FROM e),
        |tc AS (
        |  SELECT user_id, event_id, event_type, ts_us,
        |         np.p_id AS p_id, np.cents AS cents
        |  FROM t
        |  WHERE event_type <> 'purchase' AND np IS NOT NULL
        |    AND np.p_us - ts_us <= 604800000000
        |    AND np.cents IS NOT NULL),
        |c AS (
        |  SELECT event_type, cents,
        |         CAST(count(*) OVER (PARTITION BY user_id, p_id) AS BIGINT)
        |           AS n,
        |         CAST(row_number() OVER (PARTITION BY user_id, p_id
        |                ORDER BY ts_us DESC, event_id DESC) AS BIGINT) AS rk
        |  FROM tc)
        |SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS n_touches,
        |       CAST(sum((cents * 1000000) // n
        |                + CASE WHEN rk <= (cents * 1000000) % n
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS credit_micro
        |FROM c GROUP BY 1""".stripMargin,

    "q183_basket_profile" ->
      """WITH b AS (
        |  SELECT l_orderkey,
        |         CAST(count(DISTINCT l_partkey) AS BIGINT) AS k
        |  FROM lineitem GROUP BY 1)
        |SELECT k, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(k * (k - 1) // 2 * count(*) AS BIGINT) AS pair_volume
        |FROM b GROUP BY 1""".stripMargin,

    "q184_gini_revenue" ->
      """WITH c AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |              AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT cents,
        |         CAST(row_number() OVER (ORDER BY cents, o_custkey)
        |              AS BIGINT) AS i
        |  FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(cents) AS BIGINT) AS sum_cents,
        |       CAST(sum(i * cents) AS BIGINT) AS weighted_sum,
        |       (2.0 * CAST(sum(i * cents) AS DOUBLE)
        |          - CAST(count(*) + 1 AS DOUBLE) * CAST(sum(cents) AS DOUBLE))
        |         / (CAST(count(*) AS DOUBLE) * CAST(sum(cents) AS DOUBLE))
        |         AS gini
        |FROM r""".stripMargin,

    "q115_ab_welch" ->
      """WITH g AS (
        |  SELECT event_type,
        |         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_a,
        |         CAST(sum(CASE WHEN user_id % 2 = 1 THEN cents END) AS BIGINT) AS sx_a,
        |         CAST(sum(CASE WHEN user_id % 2 = 1 THEN cents * cents END) AS BIGINT) AS sxx_a,
        |         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 END) AS BIGINT) AS n_b,
        |         CAST(sum(CASE WHEN user_id % 2 = 0 THEN cents END) AS BIGINT) AS sx_b,
        |         CAST(sum(CASE WHEN user_id % 2 = 0 THEN cents * cents END) AS BIGINT) AS sxx_b
        |  FROM (SELECT event_type, user_id,
        |               CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT) AS cents
        |        FROM events WHERE value IS NOT NULL)
        |  GROUP BY 1),
        |x AS (
        |  SELECT *,
        |         sqrt(((CAST(sxx_a AS DOUBLE) - CAST(sx_a AS DOUBLE) * sx_a / n_a) / (n_a - 1)) / n_a
        |            + ((CAST(sxx_b AS DOUBLE) - CAST(sx_b AS DOUBLE) * sx_b / n_b) / (n_b - 1)) / n_b) AS se
        |  FROM g WHERE n_a > 1 AND n_b > 1)
        |SELECT event_type, n_a, n_b,
        |       (CAST(sx_a AS DOUBLE) / n_a - CAST(sx_b AS DOUBLE) / n_b) / se AS t_stat
        |FROM x WHERE se > 0""".stripMargin,

    // the oracle replays the md5 edge sample (q34 convention: identical
    // hex on both engines) and recounts the sampled triangles via the
    // naive id-ordered three-way join, then applies the same ·64 rescale
    "q326_triangles_doulion" ->
      """WITH po AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM po x JOIN po y ON x.o = y.o AND x.p < y.p),
        |e AS (
        |  SELECT a, b FROM e0
        |  WHERE substr(md5(CAST(a AS VARCHAR) || ':' || CAST(b AS VARCHAR)),
        |               1, 1) IN ('0', '1', '2', '3')),
        |tr AS (
        |  SELECT e1.a, e1.b, e2.b AS c
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |       JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |n AS (
        |  SELECT a AS node FROM tr
        |  UNION ALL SELECT b FROM tr
        |  UNION ALL SELECT c FROM tr)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_sampled,
        |       CAST(count(*) * 64 AS BIGINT) AS est_triangles
        |FROM n GROUP BY 1 ORDER BY 3 DESC, 1 ASC LIMIT 10""".stripMargin,

    "q327_link_scores_sampled" ->
      """WITH po AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM po x JOIN po y ON x.o = y.o AND x.p < y.p),
        |e AS (
        |  SELECT a, b FROM e0
        |  WHERE substr(md5(CAST(a AS VARCHAR) || ':' || CAST(b AS VARCHAR)),
        |               1, 1) IN ('0', '1', '2', '3')),
        |adj AS (SELECT a AS n, b AS m FROM e UNION ALL SELECT b, a FROM e),
        |cm AS (
        |  SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS common
        |  FROM e
        |  JOIN adj x ON x.n = e.a
        |  JOIN adj y ON y.n = e.b AND y.m = x.m
        |  GROUP BY 1, 2)
        |SELECT a, b, common AS common_sampled,
        |       CAST(common * 16 AS BIGINT) AS common_est
        |FROM cm""".stripMargin,

    "q330_doulion_accuracy" ->
      """WITH po AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b,
        |         substr(md5(CAST(x.p AS VARCHAR) || ':'
        |                    || CAST(y.p AS VARCHAR)), 1, 1) AS hx
        |  FROM po x JOIN po y ON x.o = y.o AND x.p < y.p),
        |ks AS (SELECT unnest([1, 2, 4, 8]) AS k),
        |hexes AS (
        |  SELECT k, h FROM ks,
        |    unnest(['0','1','2','3','4','5','6','7'][1:k]) AS u(h)),
        |e AS (
        |  SELECT hexes.k, e0.a, e0.b FROM e0 JOIN hexes ON e0.hx = hexes.h),
        |tr AS (
        |  SELECT e1.k, CAST(count(*) AS BIGINT) AS s
        |  FROM e e1 JOIN e e2 ON e2.k = e1.k AND e1.b = e2.a
        |       JOIN e e3 ON e3.k = e1.k AND e3.a = e1.a AND e3.b = e2.b
        |  GROUP BY 1),
        |arms AS (
        |  SELECT ks.k AS keep_hex, COALESCE(tr.s, 0) AS sampled_tri
        |  FROM ks LEFT JOIN tr ON tr.k = ks.k),
        |ex AS (
        |  SELECT CAST(count(*) AS BIGINT) AS exact_tri
        |  FROM e0 e1 JOIN e0 e2 ON e1.b = e2.a
        |       JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b),
        |adj AS (SELECT a AS n, b AS m FROM e0 UNION ALL SELECT b, a FROM e0),
        |cm AS (
        |  SELECT e0.a, e0.b, CAST(count(*) AS BIGINT) AS t_e
        |  FROM e0 JOIN adj x ON x.n = e0.a
        |          JOIN adj y ON y.n = e0.b AND y.m = x.m
        |  GROUP BY 1, 2),
        |sp AS (
        |  SELECT CAST(COALESCE(sum(t_e * (t_e - 1) // 2), 0) AS BIGINT) AS r
        |  FROM cm)
        |SELECT CAST(keep_hex AS BIGINT) AS keep_hex,
        |       CAST(sampled_tri AS BIGINT) AS sampled_tri,
        |       CAST((sampled_tri * 4096) // (keep_hex*keep_hex*keep_hex)
        |         AS BIGINT) AS est_tri,
        |       exact_tri,
        |       CAST(abs((sampled_tri * 4096) // (keep_hex*keep_hex*keep_hex)
        |              - exact_tri) * 1000000
        |            // nullif(exact_tri, 0) AS BIGINT) AS err_micro,
        |       sqrt(CAST(exact_tri AS DOUBLE)
        |              * (4096 - keep_hex*keep_hex*keep_hex)
        |              / (keep_hex*keep_hex*keep_hex)
        |            + 2.0 * CAST(r AS DOUBLE) * (16 - keep_hex) / keep_hex)
        |         AS stderr_tri,
        |       CAST(floor(64000000 / nullif(sqrt(
        |              CAST((sampled_tri * 4096)
        |                // (keep_hex*keep_hex*keep_hex) AS DOUBLE)
        |              * (keep_hex*keep_hex*keep_hex)), 0.0)) AS BIGINT)
        |         AS rel_bound_micro
        |FROM arms CROSS JOIN ex CROSS JOIN sp
        |ORDER BY keep_hex""".stripMargin,

    // arms-only error model: the oracle replays each arm's md5 edge
    // sample, recounts per-edge common neighbors on the sample (= the
    // sampled per-edge triangle counts), and applies the same integer
    // rescales + the identical power-of-2-exact stderr expression
    "q334_doulion_errmodel" ->
      """WITH po AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e0 AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b,
        |         substr(md5(CAST(x.p AS VARCHAR) || ':'
        |                    || CAST(y.p AS VARCHAR)), 1, 1) AS hx
        |  FROM po x JOIN po y ON x.o = y.o AND x.p < y.p),
        |ks AS (SELECT unnest([1, 2, 4]) AS k),
        |hexes AS (
        |  SELECT k, h FROM ks, unnest(['0','1','2','3'][1:k]) AS u(h)),
        |e AS (
        |  SELECT hexes.k, e0.a, e0.b FROM e0 JOIN hexes ON e0.hx = hexes.h),
        |adj AS (SELECT k, a AS n, b AS m FROM e
        |        UNION ALL SELECT k, b, a FROM e),
        |cm AS (
        |  SELECT e.k, e.a, e.b, CAST(count(*) AS BIGINT) AS c
        |  FROM e JOIN adj x ON x.k = e.k AND x.n = e.a
        |         JOIN adj y ON y.k = e.k AND y.n = e.b AND y.m = x.m
        |  GROUP BY 1, 2, 3),
        |agg AS (
        |  SELECT k, CAST(COALESCE(sum(c), 0) // 3 AS BIGINT) AS sampled_tri,
        |         CAST(COALESCE(sum(c * (c - 1) // 2), 0) AS BIGINT) AS rc2
        |  FROM cm GROUP BY 1),
        |arms AS (
        |  SELECT ks.k, COALESCE(agg.sampled_tri, 0) AS sampled_tri,
        |         COALESCE(agg.rc2, 0) AS rc2
        |  FROM ks LEFT JOIN agg ON agg.k = ks.k),
        |est AS (
        |  SELECT CAST(k AS BIGINT) AS keep_hex, sampled_tri,
        |         CAST(sampled_tri * 4096 // (k*k*k) AS BIGINT) AS est_tri,
        |         CAST((rc2 // (k*k*k*k*k)) * 1048576
        |              + ((rc2 % (k*k*k*k*k)) * 1048576) // (k*k*k*k*k)
        |           AS BIGINT) AS r_hat
        |  FROM arms)
        |SELECT keep_hex, sampled_tri, est_tri, r_hat,
        |       CASE WHEN sampled_tri = 0 THEN NULL ELSE
        |         sqrt(CAST(est_tri AS DOUBLE)
        |                * (4096 - keep_hex*keep_hex*keep_hex)
        |                / (keep_hex*keep_hex*keep_hex)
        |              + 2.0 * CAST(r_hat AS DOUBLE) * (16 - keep_hex)
        |                / keep_hex)
        |       END AS stderr_tri
        |FROM est ORDER BY keep_hex""".stripMargin,
  )
}
