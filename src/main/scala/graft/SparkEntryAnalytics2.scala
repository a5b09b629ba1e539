package graft

import graft.functions.ExactAgg
import graft.operators._
import graft.sources.CsvSource
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import SparkEntryShared._

/** relational/OLAP analytics queries, part 2 of 3 (SURVEY §2.6) — one `queries` entry per SURVEY §2 item, with its
  * DuckDB oracle twin in `oracleSql`. Moved verbatim from the
  * single-file SparkEntry in round 6; SparkEntry concatenates
  * the per-family maps, so names/plans/oracles are unchanged.
  */
private[graft] object SparkEntryAnalytics2 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.6 — TPC-H Q9 shape (round 5, adapted: no ps_supplycost, so cost
    // is 80% of the part's retail price per unit): per (supplier nation,
    // order year) profit on parts named "red …" — profit_micro =
    // Σ(revenue_micro − (4·retail_micro·qty) div 5), every term an exact
    // BIGINT (the div-5 cost rounding is identical in the oracle's //).
    // Name-filtered parts and supplier→nation broadcast; the only corpus
    // shuffle is lineitem⋈orders on orderkey for the year
    "q187_profit_by_nation" -> ((s, dir) => {
      val redParts = t(s, dir, "part")
        .filter(col("p_name").startsWith("red"))
        .select(col("p_partkey"),
          ExactAgg.scaledLong(col("p_retailprice"), 10000).as("retail_micro"))
      val supNat = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      t(s, dir, "lineitem")
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          (ExactAgg.scaledLong(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000) -
            expr("(4 * retail_micro * CAST(l_quantity AS BIGINT)) div 5"))
            .as("amount_micro"))
        .groupBy(col("nation"), col("o_year"))
        .agg(sum(col("amount_micro")).as("profit_micro"))
    }),

    // §2.6 — TPC-H Q11 shape (round 5, adapted: no partsupp, so the
    // "important stock" measure is revenue): parts whose revenue exceeds
    // 1.5× the MEAN part revenue — per-part exact-micro aggregate, the
    // global (total, count) a 1-row broadcast, the HAVING an exact
    // integer cross-multiplication (2·rev·n > 3·total). The mean-relative
    // threshold is scale-free: an absolute share cut (TPC-H's
    // 0.0001/SF) silently empties as the catalog grows
    "q188_concentrated_parts" -> ((s, dir) => {
      val perPart = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(ExactAgg.scaledLong(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000))
          .as("rev_micro"))
      perPart
        .crossJoin(broadcast(perPart.agg(
          sum(col("rev_micro")).as("total_micro"),
          count(lit(1)).as("n_parts"))))
        .filter(col("rev_micro") * 2 * col("n_parts") > col("total_micro") * 3)
        .select(col("l_partkey"), col("rev_micro"))
    }),

    // §2.6 — TPC-H Q12 shape (round 5, adapted: no l_shipmode, so lines
    // band by ship DELAY instead): for 1997 shipments, per delay band
    // (≤30 / 31–90 / >90 days after the order date), how many lines
    // belong to high- vs low-priority orders — Q12's two conditional
    // aggregates over one lineitem⋈orders shuffle, ≤3-row output
    "q189_delay_bands" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
          col("l_shipdate") < lit("1998-01-01").cast("date"))
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          when(datediff(col("l_shipdate"), col("o_orderdate")) <= 30, "0-30")
            .when(datediff(col("l_shipdate"), col("o_orderdate")) <= 90, "31-90")
            .otherwise("90+").as("delay_band"),
          col("o_orderpriority"))
        .groupBy(col("delay_band"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
    }),

    // §2.6 — TPC-H Q13 shape (round 5): the customer order-count
    // distribution — per order count c (including 0 via the left join),
    // how many customers placed exactly c orders. Two custkey-grain
    // shuffles, then a count-of-counts over the bounded count domain
    "q190_custorder_distribution" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_custkey"))
        .join(t(s, dir, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_custkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // §2.6 — TPC-H Q15 shape (round 5): the top supplier(s) by 1997Q1
    // revenue — supplier-grain exact-micro aggregate, then the max via an
    // unpartitioned window over the SUPPLIER AGGREGATE (bounded catalog,
    // q82's documented exemption), never over lineitem; emitting every
    // tied supplier exactly like Q15's view-max formulation
    "q191_top_supplier" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
          col("l_shipdate") < lit("1997-04-01").cast("date"))
        .groupBy(col("l_suppkey"))
        .agg(sum(ExactAgg.scaledLong(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000))
          .as("rev_micro"))
        .withColumn("max_micro", max(col("rev_micro")).over(Window.partitionBy()))
        .filter(col("rev_micro") === col("max_micro"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("rev_micro"))
    }),

    // §2.6 — TPC-H Q16 shape (round 5, adapted: supplier relationships
    // come from shipment history instead of partsupp): per (brand, type,
    // size) in a size list, how many DISTINCT suppliers shipped such
    // parts, excluding one brand and the PROMO type family — the distinct
    // collapses map-side before the count, part attrs broadcast
    "q192_supplier_variety" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#5" &&
          !col("p_type").startsWith("PROMO") &&
          col("p_size").isin(1, 9, 15, 22, 30, 44, 50))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey"))
        .distinct()
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(count(lit(1)).as("supplier_cnt"))
    }),

    // §2.6 — TPC-H Q20 shape (round 5, adapted: no partsupp availqty, so
    // the "excess share" screen is shipment dominance): suppliers who
    // shipped MORE THAN 2× THEIR FAIR SHARE of some red part's 1997+
    // volume (fair = p_qty / n_suppliers-of-part — a share-relative
    // threshold, since with this datagen's wide supplier fan-out an
    // absolute >50% cut is unreachable and would leave the arm vacuous) —
    // per (part, supplier) and per-part aggregates share one
    // partkey-grain frame, the threshold is the exact integer compare
    // ps_qty·n_sup > 2·p_qty, and the output rolls up to (supplier,
    // parts dominated) with the name attached by broadcast
    "q193_dominant_suppliers" -> ((s, dir) => {
      val red = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("date"))
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_name").startsWith("red")).select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("l_suppkey"),
          col("l_quantity").cast("long").as("qty"))
      val ps = red.groupBy(col("p_partkey"), col("l_suppkey"))
        .agg(sum(col("qty")).as("ps_qty"))
      val pTot = ps.groupBy(col("p_partkey"))
        .agg(sum(col("ps_qty")).as("p_qty"), count(lit(1)).as("n_sup"))
      ps.join(pTot, Seq("p_partkey"))
        .filter(col("ps_qty") * col("n_sup") > col("p_qty") * 2)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_parts_dominated"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_parts_dominated"))
    }),

    // §2.6 — Holt double-exponential smoothing (round 5): level AND trend
    // recurrences over the daily volume series (α=0.2, β=0.3 as exact
    // integer ratios) — the trend-aware upgrade of q173's EMA, forecasting
    // next = level + trend; the same bounded-fold pattern (sorted
    // aggregate of the |days| frame, sequential by definition), every
    // step exact integer `div` (Spark div ≡ DuckDB // — both truncate
    // toward zero, which matters here because trend goes NEGATIVE on
    // declining runs, unlike q173's all-positive EMA)
    "q202_holt_smoothing" -> ((s, dir) => {
      val daily = events(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      daily.agg(sort_array(collect_list(struct(col("d"), col("n")))).as("a"))
        .select(explode(expr(
          """aggregate(a,
            |  cast(array() as array<struct<d:date,n:bigint,level:bigint,trend:bigint>>),
            |  (acc, x) -> concat(acc, array(CASE WHEN size(acc) = 0
            |    THEN named_struct('d', x.d, 'n', x.n, 'level', x.n, 'trend', 0L)
            |    ELSE named_struct('d', x.d, 'n', x.n,
            |      'level', (2 * x.n + 8 * (element_at(acc, -1).level
            |                + element_at(acc, -1).trend)) div 10,
            |      'trend', (3 * ((2 * x.n + 8 * (element_at(acc, -1).level
            |                + element_at(acc, -1).trend)) div 10
            |                - element_at(acc, -1).level)
            |              + 7 * element_at(acc, -1).trend) div 10)
            |    END)))""".stripMargin)).as("r"))
        .select(col("r.d").as("d"), col("r.n").as("n"),
          col("r.level").as("level"), col("r.trend").as("trend"),
          (col("r.level") + col("r.trend")).as("forecast_next"))
    }),

    // §2.6 — sample-then-verify heavy hitters (round 5): the two-pass
    // scale pattern for "which keys dominate" when the key space is too
    // wide to aggregate exactly — pass 1 aggregates a 1/8 deterministic
    // hash sample (the q34 md5-prefix primitive, so both engines draw the
    // identical sample) into candidate keys, pass 2 recounts ONLY the
    // candidates exactly via a broadcast semi-join. The full-key-space
    // shuffle never happens; sample size bounds pass-1 state. On this
    // near-uniform datagen the prune is mild — on the zipf key sets the
    // pattern exists for, pass 1 discards almost everything
    "q204_heavy_hitters" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val lineHash = md5(concat(col("l_orderkey").cast("string"), lit("#"),
        col("l_linenumber").cast("string")))
      val cand = li
        .filter(substring(lineHash, 1, 1).isin("0", "1")) // 2/16 = 1/8
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("sc"))
        .filter(col("sc") >= 3)
        .select(col("l_partkey"))
      li.join(broadcast(cand), Seq("l_partkey"), "left_semi")
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_lines"))
        .filter(col("n_lines") >= 45)
    }),

    // §2.6 — one-step-ahead forecast backtest (round 5: the eval loop of
    // the forecasting family — each day's actual volume against the
    // PREVIOUS day's q173-style EMA as the one-step forecast, with exact
    // absolute errors and the final MAE; "how good is the smoother as a
    // predictor", answered with zero lookahead by construction. Same
    // bounded sorted-fold as q173, errors fold in the same pass
    "q241_forecast_backtest" -> ((s, dir) => {
      val daily = events(s, dir).filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(graft.functions.ExactAgg.cents(col("value"))).as("cents"))
      daily.agg(sort_array(collect_list(struct(col("d"), col("cents"))))
          .as("a"))
        .select(explode(expr(
          """aggregate(a,
            |  cast(array() as array<struct<d:date,cents:bigint,
            |    forecast_cents:bigint,abs_err:bigint,ema:bigint>>),
            |  (acc, x) -> concat(acc, array(named_struct(
            |    'd', x.d, 'cents', x.cents,
            |    'forecast_cents',
            |      CASE WHEN size(acc) = 0 THEN CAST(-1 AS BIGINT)
            |           ELSE element_at(acc, -1).ema END,
            |    'abs_err',
            |      CASE WHEN size(acc) = 0 THEN CAST(-1 AS BIGINT)
            |           ELSE abs(x.cents - element_at(acc, -1).ema) END,
            |    'ema',
            |      CASE WHEN size(acc) = 0 THEN x.cents
            |           ELSE (20 * x.cents + 80 * element_at(acc, -1).ema)
            |                  div 100 END))))""".stripMargin)).as("r"))
        .select(col("r.d").as("d"), col("r.cents").as("cents"),
          col("r.forecast_cents").as("forecast_cents"),
          col("r.abs_err").as("abs_err"))
        .filter(col("forecast_cents") >= 0) // day 1 has no forecast
    }),

    // §2.6 — t-closeness audit (round 5: the third leg of the privacy
    // family after k-anonymity q76 and l-diversity q151): per QI group
    // (market segment), the ordered Earth-Mover's Distance between the
    // group's sensitive-attribute distribution (nation, ordered by key)
    // and the global one — EMD = Σ_v |cum_g(v)/n_g − cum_all(v)/N| /
    // (m−1), kept exact by cross-multiplication: the per-value term is
    // |N·cum_g − n_g·cum_all| (a BIGINT), and the single normalization
    // happens once per group at PERMILLE scale (micro would overflow
    // int64 at n_g·N·1e6 ≈ 1e20 for million-customer groups — the scale
    // choice is the overflow headroom). Everything after the two
    // customer-grain aggregates runs on the |segments|×|nations| domain
    // grid (bounded), so the windows never touch corpus-grain data
    "q242_t_closeness" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // t-closeness runs over the DISCLOSED sensitive attribute: a NULL
      // nationkey is a suppressed value, not a distribution point — and
      // the cumulative-EMD window would otherwise place the NULL group
      // at opposite ends on the two engines (Spark orders NULLS FIRST
      // ascending, DuckDB NULLS LAST), shifting every partial sum (r9)
      val c = t(s, dir, "customer").filter(col("c_nationkey").isNotNull)
      val cells = c.groupBy(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("cnt"))
      val gl = c.groupBy(col("c_nationkey")).agg(count(lit(1)).as("g_cnt"))
      val segTot = c.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_g"))
      val tot = c.agg(count(lit(1)).as("n"),
        countDistinct(col("c_nationkey")).as("m"))
      val grid = segTot.crossJoin(broadcast(gl)) // bounded domain frame
        .join(broadcast(cells), Seq("c_mktsegment", "c_nationkey"), "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      val wg = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_nationkey"))
      grid
        .withColumn("cum_g", sum(col("cnt")).over(wg))
        .withColumn("cum_all", sum(col("g_cnt")).over(wg))
        .crossJoin(broadcast(tot)) // 1-row (N, m)
        .withColumn("term",
          abs(col("n") * col("cum_g") - col("n_g") * col("cum_all")))
        .groupBy(col("c_mktsegment"), col("n_g"), col("n"), col("m"))
        .agg(sum(col("term")).as("emd_num"))
        .select(col("c_mktsegment"), col("n_g"),
          expr("(1000 * emd_num) div (n_g * n * (m - 1))")
            .as("emd_permille"))
        .withColumn("exceeds_t", col("emd_permille") > 200)
    }),

    // §2.6 — Mann–Whitney U rank-sum test (round 5: the nonparametric
    // two-sample location test beside Welch q115 / KS q218 — "do src0 and
    // src1 docs differ in length?", answered from ranks so outliers can't
    // dominate). Ranks come from the VALUE-grain frame (group by length,
    // one cumulative window over ≤|distinct lengths| rows), with ties
    // taking the midrank; everything stays integer by carrying DOUBLED
    // ranks (min_rank + max_rank is exactly 2·midrank), so U is exact at
    // half-unit scale: u2_a = 2·R_A − n_a(n_a+1), u2_a + u2_b = 2·n_a·n_b
    "q243_mann_whitney" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
        .filter(col("source").isin("src0", "src1"))
        .select(col("source"), col("n_chars"))
      val byVal = d.groupBy(col("n_chars"))
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("source") === "src0", 1L).otherwise(0L)).as("cnt_a"))
      val w = Window.orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byVal
        .withColumn("cum", sum(col("cnt")).over(w)) // bounded value frame
        .withColumn("rank2", col("cum") - col("cnt") + 1 + col("cum"))
        .agg(sum(col("cnt_a")).as("n_a"),
          sum(col("cnt") - col("cnt_a")).as("n_b"),
          sum(col("cnt_a") * col("rank2")).as("r2_a"))
        .select(col("n_a"), col("n_b"),
          (col("r2_a") - col("n_a") * (col("n_a") + 1)).as("u2_a"))
        .withColumn("u2_b", lit(2L) * col("n_a") * col("n_b") - col("u2_a"))
        .withColumn("u2_min", least(col("u2_a"), col("u2_b")))
    }),

    // §2.6 — Holt linear-trend smoothing (round 5: q173's EMA grown a
    // trend state — level l_t = (α·x + (1−α)(l+b)) and trend
    // b_t = (β(l_t−l_prev) + (1−β)b_prev), α=0.2 β=0.1 as exact permille
    // weights over integer cents; the trend can go NEGATIVE, which is
    // safe because Spark's `div` and DuckDB's `//` both truncate toward
    // zero (verified), so the recurrences stay bit-identical). Same
    // bounded sorted-fold over the day-grain aggregate as the EMA family;
    // the last row also carries the h-step-ahead forecast l+h·b
    "q244_holt_trend" -> ((s, dir) => {
      val daily = events(s, dir).filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(graft.functions.ExactAgg.cents(col("value"))).as("cents"))
      daily.agg(sort_array(collect_list(struct(col("d"), col("cents"))))
          .as("a"))
        .select(explode(expr(
          """aggregate(a,
            |  cast(array() as array<struct<d:date,cents:bigint,
            |    level_cents:bigint,trend_cents:bigint>>),
            |  (acc, x) -> concat(acc, array(CASE WHEN size(acc) = 0
            |    THEN named_struct('d', x.d, 'cents', x.cents,
            |      'level_cents', x.cents, 'trend_cents', CAST(0 AS BIGINT))
            |    ELSE named_struct('d', x.d, 'cents', x.cents,
            |      'level_cents',
            |        (200 * x.cents + 800 * (element_at(acc, -1).level_cents
            |          + element_at(acc, -1).trend_cents)) div 1000,
            |      'trend_cents',
            |        (100 * ((200 * x.cents
            |            + 800 * (element_at(acc, -1).level_cents
            |              + element_at(acc, -1).trend_cents)) div 1000
            |          - element_at(acc, -1).level_cents)
            |         + 900 * element_at(acc, -1).trend_cents) div 1000)
            |    END)))""".stripMargin)).as("r"))
        .select(col("r.d").as("d"), col("r.cents").as("cents"),
          col("r.level_cents").as("level_cents"),
          col("r.trend_cents").as("trend_cents"))
        .withColumn("forecast_7d_cents",
          col("level_cents") + lit(7L) * col("trend_cents"))
    }),

    // §2.6 — forecast bake-off (round 5: q241's backtest generalized to
    // MODEL SELECTION — naive lag-1, seasonal-naive lag-7, and the α=0.2
    // EMA score the same daily series one-step-ahead, and the answer is
    // one MAE row per method over the days where ALL THREE are defined
    // (same eval window, or the comparison is meaningless). Lags are
    // windows on the bounded day frame; the EMA forecast is the q241
    // fold; errors stay exact integer cents and the mean divides once
    "q245_forecast_bakeoff" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir).filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(graft.functions.ExactAgg.cents(col("value"))).as("cents"))
      val ema = daily
        .agg(sort_array(collect_list(struct(col("d"), col("cents"))))
          .as("a"))
        .select(explode(expr(
          """aggregate(a,
            |  cast(array() as array<struct<d:date,cents:bigint,ema:bigint>>),
            |  (acc, x) -> concat(acc, array(named_struct(
            |    'd', x.d, 'cents', x.cents,
            |    'ema', CASE WHEN size(acc) = 0 THEN x.cents
            |      ELSE (20 * x.cents + 80 * element_at(acc, -1).ema)
            |        div 100 END))))""".stripMargin)).as("r"))
        .select(col("r.d").as("d"), col("r.cents").as("cents"),
          col("r.ema").as("ema"))
      val w = Window.orderBy(col("d")) // bounded day frame
      val lagged = ema
        .withColumn("f_naive", lag(col("cents"), 1).over(w))
        .withColumn("f_seasonal", lag(col("cents"), 7).over(w))
        .withColumn("f_ema", lag(col("ema"), 1).over(w))
        .filter(col("f_seasonal").isNotNull) // lag-7 defined ⇒ all defined
      lagged
        .select(expr("stack(3," +
          " 'naive_lag1', abs(cents - f_naive)," +
          " 'seasonal_lag7', abs(cents - f_seasonal)," +
          " 'ema_02', abs(cents - f_ema)) AS (method, abs_err)"))
        .groupBy(col("method"))
        .agg(count(lit(1)).as("n_days"),
          expr("sum(abs_err) div count(1)").as("mae_cents"))
    }),

    // §2.6 — degree assortativity of the co-purchase graph (round 5: do
    // popular parts co-occur with popular parts (assortative, r > 0) or
    // with niche ones (hub-and-spoke, r < 0)? — the one-number structure
    // diagnostic that says whether q110/q154/q174's graph family runs on
    // a social-style or a star-style topology). Pearson r over the edge
    // endpoint degree pairs: the six moments are EXACT BIGINTs from one
    // edge⋈degree⋈degree pass, cast to double only inside the final
    // closed form — identical operand order in both engines, and IEEE
    // sqrt/mul/div are correctly rounded, so even the double is
    // hash-comparable. Degrees join back by key (two broadcast-or-shuffle
    // equi-joins on the node key), never a matrix
    "q247_assortativity" -> ((s, dir) => {
      val edges = Graph.symmetricCoOccurrenceEdges(t(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))
        .localCheckpoint() // feeds the degree aggregate AND the moment pass
      val deg = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
      edges
        .join(deg.select(col("node").as("src"), col("deg").as("dx")), Seq("src"))
        .join(deg.select(col("node").as("dst"), col("deg").as("dy")), Seq("dst"))
        .agg(count(lit(1)).as("m"),
          sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
          sum(col("dx") * col("dy")).as("sxy"),
          sum(col("dx") * col("dx")).as("sxx"),
          sum(col("dy") * col("dy")).as("syy"))
        .select(col("m"), col("sxy"),
          expr("(CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)" +
            " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
            " / (sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)" +
            " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))" +
            " * sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)" +
            " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))")
            .as("assortativity"))
    }),

    // §2.6 — label-propagation communities (round 5: the community
    // SCREEN over the co-purchase graph, beside q45's exact connected
    // components (which merge everything touching) and q174's k-core
    // (which keeps only the dense core) — LPA finds the majority-vote
    // clusters in between. Synchronous schedule + smallest-label
    // tie-break = deterministic, 3 fixed rounds like q110's rank loop;
    // per round one dst-key join, one (node,label) count, one per-node
    // argmax window — linear in |E|
    "q248_label_propagation" -> ((s, dir) => {
      // round 13: the checkpoint cuts lineage at the point of maximum
      // reuse (the raw edge build), and LPA re-establishes hash(dst)
      // IN-PLAN above it — its rounds are checkpoint-free and reuse
      // that one repartition (a fully checkpoint-free variant measured
      // flat: the duplicated edge-build subplans cost more in planning
      // than the stage cache saves)
      val edges = Graph.symmetricCoOccurrenceEdges(t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))
        .localCheckpoint()
      Graph.labelPropagation(edges, 3)
    }),

    // §2.6 — sketch SET ALGEBRA: audience overlap between every event-type
    // pair (round 5: q41's single-sketch contract extended to the union /
    // intersection operations a sketch layer actually serves — "how many
    // users did A and B share?" answered from per-type HLL sketches via
    // register-wise union + inclusion-exclusion, WITHOUT rescanning the
    // fact table per pair). One corpus pass builds |types| sketches and
    // exact counts; one user-grain self-join on user_id (fan-out bounded
    // by the type count per user) gives the exact pair intersections the
    // contract checks against; the pair stage is the bounded |types|²
    // grid. Oracle pattern: exact values + literal-TRUE bounds, like q41
    // — the intersect bound scales with |A|+|B| because inclusion-
    // exclusion compounds the union's relative error
    "q250_audience_overlap" -> ((s, dir) => {
      val rsd = 0.05
      val du = events(s, dir)
        .select(col("event_type"), col("user_id")).distinct()
        .localCheckpoint() // feeds the sketch pass AND the exact pair pass
      val sk = events(s, dir).groupBy(col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("hll"),
          countDistinct(col("user_id")).as("exact"))
      val inter = du.as("x").join(du.as("y"),
          col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("type_a"),
          col("y.event_type").as("type_b"))
        .agg(count(lit(1)).as("exact_intersect"))
      sk.as("a").join(sk.as("b"), col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"),
          col("a.exact").as("exact_a"), col("b.exact").as("exact_b"),
          col("a.hll").as("hll_a"), col("b.hll").as("hll_b"))
        .join(inter, Seq("type_a", "type_b"), "left")
        .withColumn("exact_intersect",
          coalesce(col("exact_intersect"), lit(0L)))
        .withColumn("exact_union",
          col("exact_a") + col("exact_b") - col("exact_intersect"))
        .withColumn("est_union",
          hll_sketch_estimate(hll_union(col("hll_a"), col("hll_b"))))
        .withColumn("est_intersect",
          hll_sketch_estimate(col("hll_a"))
            + hll_sketch_estimate(col("hll_b")) - col("est_union"))
        .select(col("type_a"), col("type_b"), col("exact_a"),
          col("exact_b"), col("exact_union"), col("exact_intersect"),
          (abs(col("est_union") - col("exact_union"))
            <= lit(3 * rsd) * col("exact_union")).as("union_in_bound"),
          (abs(col("est_intersect") - col("exact_intersect"))
            <= lit(3 * rsd) * (col("exact_a") + col("exact_b")))
            .as("intersect_in_bound"))
    }),

    // §2.6 — additive seasonal decomposition (round 5: the classic
    // trend + weekday-seasonal + residual split of the daily revenue
    // series, the STL-shaped view behind q152's weekday mix and the
    // forecast family — trend is the CENTERED 7-day mean (defined only
    // where the window is full, the textbook edge rule), seasonal is the
    // per-weekday mean of the detrended series, residual is what's left.
    // Weekday comes from an epoch-anchored day-mod-7 (identical integer
    // arithmetic in both engines — the engines' dayofweek() conventions
    // differ, so neither is used); every division is an exact integer
    // div on the bounded day frame
    "q252_seasonal_decompose" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir).filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(graft.functions.ExactAgg.cents(col("value"))).as("cents"))
      val w = Window.orderBy(col("d")) // bounded day frame
      val tw = w.rowsBetween(-3, 3)
      val trended = daily
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("nd", count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("trend_cents",
          when(col("i") >= 4 && col("i") <= col("nd") - 3,
            expr("sum(cents) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING" +
              " AND 3 FOLLOWING) div 7")))
        .withColumn("wd",
          pmod(datediff(col("d"), lit("1970-01-05").cast("date")), lit(7)))
      val seasonal = trended.filter(col("trend_cents").isNotNull)
        .groupBy(col("wd"))
        .agg(expr("sum(cents - trend_cents) div count(1)")
          .as("seasonal_cents"))
      trended.filter(col("trend_cents").isNotNull)
        .join(broadcast(seasonal), Seq("wd")) // 7-row weekday profile
        .select(col("d"), col("cents"), col("trend_cents"),
          col("seasonal_cents"),
          (col("cents") - col("trend_cents") - col("seasonal_cents"))
            .as("residual_cents"))
    }),

    // §2.6 — Wald–Wolfowitz runs test (round 5: "is the daily series'
    // up/down pattern random, trending, or oscillating?" — the
    // nonparametric randomness screen beside q147's autocorrelation and
    // q215's Mann-Kendall. Moves binarize deterministically (diff > 0 is
    // up, diff ≤ 0 is down), runs count sign CHANGES through one lag
    // window on the bounded day frame, and the null-expected run count
    // 2·n1·n2/(n1+n2) + 1 comes out in exact integer micros by
    // cross-multiplication
    "q253_runs_test" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir).filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(graft.functions.ExactAgg.cents(col("value"))).as("cents"))
      val w = Window.orderBy(col("d"))
      daily
        .withColumn("diff", col("cents") - lag(col("cents"), 1).over(w))
        .filter(col("diff").isNotNull)
        .withColumn("up", (col("diff") > 0).cast("long"))
        .withColumn("chg",
          when(lag(col("up"), 1).over(w).isNull, 0L)
            .otherwise((col("up") =!= lag(col("up"), 1).over(w)).cast("long")))
        .agg(sum(col("up")).as("n_up"),
          sum(lit(1L) - col("up")).as("n_down"),
          (sum(col("chg")) + 1).as("n_runs"))
        .withColumn("exp_runs_micro",
          expr("(2000000 * n_up * n_down) div (n_up + n_down) + 1000000"))
    }),

    // §2.6 — ABC inventory classification (round 5: the operations
    // classic behind q137's Pareto scalar — every part classed A/B/C by
    // cumulative revenue share (A ≤ 80%, B ≤ 95%, C rest), exact by
    // cross-multiplication (5·cum ≤ 4·total, 20·cum ≤ 19·total); the
    // rank/cumsum window runs over the part AGGREGATE under q137's
    // documented exemption, ties broken by partkey
    "q261_abc_classification" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val rev = t(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("p_partkey"))
        .agg(sum(ExactAgg.cents(
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_cents"))
      val w = Window.orderBy(col("revenue_cents").desc, col("p_partkey"))
      rev
        .withColumn("cum_cents", sum(col("revenue_cents")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total_cents", sum(col("revenue_cents")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("p_partkey"), col("revenue_cents"),
          when(col("cum_cents") * 5 <= col("total_cents") * 4, "A")
            .when(col("cum_cents") * 20 <= col("total_cents") * 19, "B")
            .otherwise("C").as("abc_class"))
    }),

    // §2.6 — calendar seasonal index (round 5: month-of-year demand
    // index over the SEVEN-year order history — per calendar month, the
    // mean per-month-instance revenue against the overall mean, exact
    // at permille scale by cross-multiplication (permille not micro: at
    // 10× rows the micro numerator cents·N·1e6 would overflow int64 —
    // the same headroom choice as q242). Partial calendar coverage
    // (the last year ends mid-year) is handled by normalizing each
    // month by ITS instance count, not an assumed year count
    "q262_seasonal_index" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(month(col("o_orderdate")).cast("long").as("m"),
          year(col("o_orderdate")).cast("long").as("y"),
          ExactAgg.cents(col("o_totalprice")).as("cents"))
      val byM = o.groupBy(col("m"))
        .agg(sum(col("cents")).as("cents_m"),
          countDistinct(col("y")).as("n_m"))
      val tot = byM.agg(sum(col("cents_m")).as("total"),
        sum(col("n_m")).as("n_total"))
      byM.crossJoin(broadcast(tot)) // 1-row totals over the 12-row frame
        .select(col("m"), col("cents_m"), col("n_m"),
          expr("(1000 * cents_m * n_total) div (n_m * total)")
            .as("index_permille"))
    }),

    // §2.6 — customer-value segment migration (round 5: q113's monetary
    // quartiles computed per PERIOD (orders split at the seven-year
    // midpoint) and crossed into the migration matrix — who moved up,
    // who lapsed, who arrived; the lifecycle report behind retention
    // planning. Quartiles are ntile-4 over each period's customer
    // AGGREGATE (q137's exemption, (monetary desc, custkey) total
    // order); customers absent from a period carry quartile 0 via the
    // full outer join, so arrivals and lapses are first-class cells
    "q263_segment_migration" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cut = lit("1998-06-01").cast("date")
      val o = t(s, dir, "orders")
      def quartiles(df: DataFrame, alias: String): DataFrame = {
        val agg = df.groupBy(col("o_custkey"))
          .agg(sum(ExactAgg.cents(col("o_totalprice"))).as("monetary"))
        agg.withColumn(alias, ntile(4).over(
          Window.orderBy(col("monetary").desc, col("o_custkey")))
          .cast("long"))
          .select(col("o_custkey"), col(alias))
      }
      val early = quartiles(o.filter(col("o_orderdate") < cut), "q_early")
      val late = quartiles(o.filter(col("o_orderdate") >= cut), "q_late")
      early.join(late, Seq("o_custkey"), "full_outer")
        .groupBy(coalesce(col("q_early"), lit(0L)).as("q_early"),
          coalesce(col("q_late"), lit(0L)).as("q_late"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    // §2.6 — weekly ARPU trend (round 5: revenue per active user per
    // week in exact integer cents — the normalization that separates
    // "more users" growth from "more value per user" growth; one
    // (week, user) distinct + one revenue aggregate joined on the
    // bounded week frame
    "q316_weekly_arpu" -> ((s, dir) => {
      val e = events(s, dir).filter(col("value").isNotNull)
        .withColumn("wk",
          expr("datediff(to_date(ts), DATE '1970-01-05') div 7")
            .cast("long"))
      val rev = e.groupBy(col("wk"))
        .agg(sum(graft.functions.ExactAgg.cents(col("value"))).as("cents"))
      // actives are IDENTIFIED users (count(DISTINCT user_id) skips
      // NULL); revenue keeps unattributed events — they are still
      // revenue. The distinct+count(*) form must filter NULL explicitly
      // to say the same thing (r9 sweep; the q250 audience contract)
      val act = e.filter(col("user_id").isNotNull)
        .select(col("wk"), col("user_id")).distinct()
        .groupBy(col("wk")).agg(count(lit(1)).as("actives"))
      rev.join(act, Seq("wk"))
        .select(col("wk"), col("actives"), col("cents"),
          expr("cents div actives").as("arpu_cents"))
    }),

    // §2.6 — basket-size trend (round 5: yearly mean distinct parts per
    // order at exact milli scale — is basket breadth widening?; the
    // temporal view of q183's static profile. One order-grain reduce +
    // a bounded year rollup
    "q317_basket_trend" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
          col("l_orderkey"))
        .agg(countDistinct(col("l_partkey")).as("k"))
        .groupBy(col("y"))
        .agg(count(lit(1)).as("n_orders"), sum(col("k")).as("total_k"))
        .withColumn("mean_k_milli",
          expr("(1000 * total_k) div n_orders"))
    }),

    // §2.6 — brand loyalty index (round 5: per segment, the mean share
    // of a customer's line spend concentrated in their TOP brand — the
    // category-loyalty scalar behind q314's affinity matrix. Per-
    // customer shares floor once to permille (the deterministic-floor
    // convention), the argmax is a (spend desc, brand asc) window over
    // the bounded per-customer brand frame
    "q318_brand_loyalty" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cb = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("o_custkey"), col("p_brand"))
        .agg(sum(ExactAgg.scaledLong(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 100))
          .as("c"))
      val w = Window.partitionBy(col("o_custkey"))
      val top = cb
        .withColumn("tot", sum(col("c")).over(w))
        .withColumn("rk", row_number().over(
          w.orderBy(col("c").desc, col("p_brand").asc)))
        .filter(col("rk") === 1)
        .select(col("o_custkey"),
          expr("(1000 * c) div tot").as("top_share_pm"))
      top.join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          expr("sum(top_share_pm) div count(1)")
            .as("mean_loyalty_permille"))
    }),

    // §2.6 — customer tenure mix (round 5: revenue share by tenure band
    // (first-order-year cohort age at order time, bucketed 0 / 1-2 /
    // 3+ years) — the lifecycle-mix report that says whether revenue
    // rides on veterans or newcomers; one min-date window + a bounded
    // conditional aggregate with exact permille shares
    "q319_tenure_mix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders")
        .withColumn("first_y", year(min(col("o_orderdate"))
          .over(Window.partitionBy(col("o_custkey")))).cast("long"))
        .withColumn("age", year(col("o_orderdate")).cast("long")
          - col("first_y"))
        .withColumn("band",
          when(col("age") === 0, "year0")
            .when(col("age") <= 2, "year1_2").otherwise("year3plus"))
      val byB = o.groupBy(col("band"))
        .agg(count(lit(1)).as("n_orders"),
          sum(ExactAgg.cents(col("o_totalprice"))).as("cents"))
      val tot = byB.agg(sum(col("cents")).as("total"))
      byB.crossJoin(broadcast(tot))
        .select(col("band"), col("n_orders"), col("cents"),
          expr("(1000 * cents) div total").as("share_permille"))
    }),

    // §2.6 — discount depth by brand (round 5: mean effective discount
    // permille per brand, top-15 most discounted — where margin leaks
    // live; line-weighted exact integer means over the bounded brand
    // frame
    "q320_discount_depth" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"),
          sum(ExactAgg.scaledLong(col("l_discount"), 1000)).as("disc_pm_sum"))
        .withColumn("mean_discount_permille",
          expr("disc_pm_sum div n_lines"))
        .orderBy(col("mean_discount_permille").desc, col("p_brand").asc)
        .limit(15)
    }),

    // §2.6 — purchase-cadence momentum (round 5: are customers speeding
    // up or slowing down? — per customer with ≥ 4 orders, the mean
    // inter-order gap of the FIRST half of their gaps vs the SECOND
    // half, compared exactly by cross-multiplication (sum1·n2 vs
    // sum2·n1 — no division at all); the report counts accelerating /
    // steady / slowing customers per segment. The trend view of q126's
    // static cadence
    "q313_cadence_momentum" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val gaps = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
        .withColumn("gap",
          datediff(col("o_orderdate"),
            lag(col("o_orderdate"), 1).over(w)).cast("long"))
        .filter(col("gap").isNotNull)
        .withColumn("gi", row_number().over(w).cast("long"))
        .withColumn("ng", count(lit(1))
          .over(Window.partitionBy(col("o_custkey"))))
      val perC = gaps
        .withColumn("half", when(col("gi") * 2 <= col("ng"), 1).otherwise(2))
        .groupBy(col("o_custkey"))
        .agg(
          sum(when(col("half") === 1, col("gap")).otherwise(0L)).as("s1"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("half") === 2, col("gap")).otherwise(0L)).as("s2"),
          sum(when(col("half") === 2, 1L).otherwise(0L)).as("n2"))
        .filter(col("n1") >= 2 && col("n2") >= 2) // ≥ 4 gaps total
      perC
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(when(col("s2") * col("n1") < col("s1") * col("n2"), 1L)
            .otherwise(0L)).as("accelerating"),
          sum(when(col("s2") * col("n1") > col("s1") * col("n2"), 1L)
            .otherwise(0L)).as("slowing"))
        .withColumn("steady",
          col("n_customers") - col("accelerating") - col("slowing"))
    }),

    // §2.6 — brand affinity matrix (round 5: shared-customer counts for
    // every brand pair — the cross-sell planning view above q80's
    // part-pair recommendations; the (customer, brand) DISTINCT frame
    // self-joins on the customer with per-customer fan-out bounded by
    // |brands|, so the pair stage is customer-grain × C(25,2), never
    // order-grain
    "q314_brand_affinity" -> ((s, dir) => {
      // Round 12: a basket-collect + map-side pair-explode variant was
      // measured SLOWER here (2.0 -> 4.0 s sf0.1; near-25-brand sets
      // make the per-customer C(k,2) array allocation beat the join's
      // streaming cost — the q80/coPairs lesson at smaller k) and
      // reverted; the distinct + self-join stays.
      val cb = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("o_custkey"), col("p_brand")).distinct()
        .localCheckpoint() // both sides of the bounded pair join
      cb.as("a").join(cb.as("b"),
          col("a.o_custkey") === col("b.o_custkey") &&
          col("a.p_brand") < col("b.p_brand"))
        .groupBy(col("a.p_brand").as("brand_a"),
          col("b.p_brand").as("brand_b"))
        .agg(count(lit(1)).as("shared_customers"))
        .orderBy(col("shared_customers").desc,
          col("brand_a").asc, col("brand_b").asc)
        .limit(30)
    }),

    // §2.6 — month-cycle effect (round 5: mean order value by
    // day-of-month band (early 1-10 / mid 11-20 / late 21-31) — the
    // billing-cycle lens on order timing; one bounded conditional
    // aggregate, exact mean cents per band
    "q315_month_cycle" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(
          when(dayofmonth(col("o_orderdate")) <= 10, "early")
            .when(dayofmonth(col("o_orderdate")) <= 20, "mid")
            .otherwise("late").as("band"),
          ExactAgg.cents(col("o_totalprice")).as("cents"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("total_cents"))
        .withColumn("mean_cents", expr("total_cents div n_orders"))
    }),

    // §2.6 — Tukey-fence outlier days (round 5: the boxplot outlier
    // rule made EXACT — days outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR] of
    // daily revenue, with the whole test in integers: quartile
    // positions are dyadic so q1x4/q3x4 are exact BIGINTs (the q290
    // argument), and the fences clear the 1.5 factor at ×8 scale
    // (low_x8 = 2·q1x4 − 3·(q3x4−q1x4), test 8·cents < low_x8). The
    // robust complement of q278's ±2σ band
    "q310_tukey_outlier_days" -> ((s, dir) => {
      val daily = events(s, dir).filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(graft.functions.ExactAgg.cents(col("value"))).as("cents"))
      val q = daily.agg(
        (percentile(col("cents"), lit(0.25)) * 4).cast("long").as("q1x4"),
        (percentile(col("cents"), lit(0.75)) * 4).cast("long").as("q3x4"))
      daily.crossJoin(broadcast(q))
        .withColumn("low_x8",
          expr("2 * q1x4 - 3 * (q3x4 - q1x4)"))
        .withColumn("high_x8",
          expr("2 * q3x4 + 3 * (q3x4 - q1x4)"))
        .filter(col("cents") * 8 < col("low_x8") ||
          col("cents") * 8 > col("high_x8"))
        .select(col("d"), col("cents"), col("low_x8"), col("high_x8"),
          (col("cents") * 8 > col("high_x8")).as("is_high"))
    }),

    // §2.6 — rising parts screen (round 5: parts whose final-year
    // revenue share is at least DOUBLE their all-history share — the
    // emerging-product detector, cross-multiplied so the share
    // comparison is exact (c_last·total ≥ 2·c_all·total_last), with a
    // minimum final-year revenue floor so noise parts don't qualify.
    // Whole-dollar grain: the cross-multiplication c_last·total must
    // stay in int64 at 10× rows, and cents would not
    "q312_rising_parts" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"),
          (col("l_shipdate") >= lit("2000-11-05").cast("date"))
            .as("is_last"),
          ExactAgg.scaledLong(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")), 1)
            .as("dollars"))
      val byP = li.groupBy(col("l_partkey"))
        .agg(sum(col("dollars")).as("c_all"),
          sum(when(col("is_last"), col("dollars")).otherwise(0L))
            .as("c_last"))
      val tot = byP.agg(sum(col("c_all")).as("total"),
        sum(col("c_last")).as("total_last"))
      byP.crossJoin(broadcast(tot))
        .filter(col("c_last") >= 1000L && // ≥ $1000 in the final year
          col("c_last") * col("total") >= col("c_all") * col("total_last") * 2)
        .select(col("l_partkey"), col("c_all"), col("c_last"))
        .orderBy(col("c_last").desc, col("l_partkey").asc)
        .limit(20)
    }),

    // §2.6 — repeat-purchase rate per part (round 5: product loyalty —
    // of the customers who ever bought a part, the permille who bought
    // it in MORE THAN ONE order; the product-stickiness screen. One
    // (part, customer)-grain aggregate counting orders, then a
    // part-grain conditional rollup, top-20 among parts with ≥ 10
    // buyers so the rate is meaningful
    "q307_repeat_purchase" -> ((s, dir) => {
      val pc = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_partkey"), col("o_custkey"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"))
      pc.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_buyers"),
          sum(when(col("n_orders") >= 2, 1L).otherwise(0L))
            .as("repeat_buyers"))
        .filter(col("n_buyers") >= 10)
        .withColumn("repeat_permille",
          expr("(1000 * repeat_buyers) div n_buyers"))
        .orderBy(col("repeat_permille").desc, col("l_partkey").asc)
        .limit(20)
    }),

    // §2.6 — basket value by breadth (round 5: does basket BREADTH
    // drive basket VALUE? — mean order total by distinct-part count,
    // composing q183's size frame with exact money; two bounded
    // aggregates after the order-grain reduce
    "q308_basket_value_by_size" -> ((s, dir) => {
      val sizes = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_partkey")).as("k"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), ExactAgg.cents(col("o_totalprice"))
          .as("cents"))
        .join(sizes, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("cents")).as("total_cents"))
        .withColumn("mean_cents", expr("total_cents div n_orders"))
    }),

    // §2.6 — discount ladder (round 5: the pricing-analytics view — per
    // discount band (percent steps, a bounded domain), line volume,
    // mean quantity, and revenue share in exact permille: "what do we
    // get for each discount point?". One conditional fact aggregate on
    // the bounded band frame; the band key is exact integer percent
    "q309_discount_ladder" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(ExactAgg.scaledLong(col("l_discount"), 100).as("disc_pct"),
          floor(col("l_quantity") + lit(0.5)).cast("long").as("qty"),
          ExactAgg.scaledLong(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")), 100)
            .as("cents"))
      val tot = li.agg(sum(col("cents")).as("total"))
      li.groupBy(col("disc_pct"))
        .agg(count(lit(1)).as("n_lines"), sum(col("qty")).as("units"),
          sum(col("cents")).as("cents"))
        .crossJoin(broadcast(tot))
        .select(col("disc_pct"), col("n_lines"),
          expr("units div n_lines").as("mean_qty"),
          expr("(1000 * cents) div total").as("revenue_share_permille"))
    }),

    // §2.6 — dead-stock report (round 5: parts with NO shipment in the
    // final year of the history, with their locked-up retail value —
    // the inventory-aging screen; an anti-join against recent activity
    // (q31's shape with a date predicate) + a value rollup by brand, so
    // the report is bounded even though the detection is part-grain
    "q304_dead_stock" -> ((s, dir) => {
      val recent = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2000-11-04").cast("date"))
        .select(col("l_partkey")).distinct()
      t(s, dir, "part")
        .join(recent, col("p_partkey") === col("l_partkey"), "left_anti")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_dead_parts"),
          sum(ExactAgg.cents(col("p_retailprice"))).as("locked_cents"))
    }),

    // §2.6 — customer LTV curve (round 5: mean cumulative revenue at
    // tenure month m, averaged over customers OBSERVED at least m
    // months (the right-censoring-aware denominator — naive averaging
    // over all customers deflates the tail) — the lifetime-value curve
    // behind q238's survival and q67's retention. Months from exact
    // integer month arithmetic; per-customer cumulative sums on the
    // (customer, month) frame; the curve is a bounded offset aggregate
    "q305_ltv_curve" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders")
        .select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("mi"),
          ExactAgg.cents(col("o_totalprice")).as("cents"))
      val horizon = o.agg(max(col("mi")).as("h"))
      val perCM = o.groupBy(col("o_custkey"), col("mi"))
        .agg(sum(col("cents")).as("c"))
        .withColumn("first_mi", min(col("mi"))
          .over(Window.partitionBy(col("o_custkey"))))
        .withColumn("offset_m", col("mi") - col("first_mi"))
        .withColumn("cum_c", sum(col("c"))
          .over(Window.partitionBy(col("o_custkey")).orderBy(col("mi"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // a customer is OBSERVED at offset m iff first_mi + m <= horizon;
      // their cumulative value at m is the last cum at offset <= m —
      // carried forward over the dense offset frame
      val offsets = s.range(0, 24).select(col("id").as("m"))
      val custFirst = perCM.select(col("o_custkey"), col("first_mi"))
        .distinct()
      custFirst.crossJoin(broadcast(offsets))
        .crossJoin(broadcast(horizon))
        .filter(col("first_mi") + col("m") <= col("h"))
        .join(perCM.select(col("o_custkey"),
          col("offset_m"), col("cum_c")),
          Seq("o_custkey"))
        .filter(col("offset_m") <= col("m"))
        .groupBy(col("o_custkey"), col("m"))
        .agg(max_by(col("cum_c"), col("offset_m")).as("cum_at_m"))
        .groupBy(col("m"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cum_at_m")).as("total_cum_cents"))
        .withColumn("mean_ltv_cents",
          expr("total_cum_cents div n_customers"))
    }),

    // §2.6 — seasonal strength (round 5: q252's decomposition collapsed
    // to the one scalar a pipeline alerts on — the share of detrended
    // variation carried by the weekday pattern, SS_seasonal /
    // (SS_seasonal + SS_residual) in exact permille from integer
    // sums-of-squares; ≈0 means the weekday profile is noise, ≈1000
    // means the series IS its weekday pattern
    "q306_seasonal_strength" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir).filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(graft.functions.ExactAgg.cents(col("value"))).as("cents"))
      val w = Window.orderBy(col("d"))
      val trended = daily
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("nd", count(lit(1)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("trend_cents",
          when(col("i") >= 4 && col("i") <= col("nd") - 3,
            expr("sum(cents) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING" +
              " AND 3 FOLLOWING) div 7")))
        .withColumn("wd",
          pmod(datediff(col("d"), lit("1970-01-05").cast("date")), lit(7)))
        .filter(col("trend_cents").isNotNull)
        .withColumn("detr", col("cents") - col("trend_cents"))
      val seasonal = trended.groupBy(col("wd"))
        .agg(expr("sum(detr) div count(1)").as("s_wd"))
      trended.join(broadcast(seasonal), Seq("wd"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("s_wd") * col("s_wd")).as("ss_seasonal"),
          sum((col("detr") - col("s_wd")) * (col("detr") - col("s_wd")))
            .as("ss_residual"))
        .withColumn("strength_permille",
          expr("(1000 * ss_seasonal) div (ss_seasonal + ss_residual)"))
    }),

    // §2.6 — shipping-SLA attainment by priority (round 5: per order
    // priority, the share of lineitems shipped within 30 days of the
    // order date in exact permille — the operations SLA report that
    // turns q188's late-lines screen into a rate; one fact join + one
    // conditional aggregate on the bounded priority frame
    "q301_sla_attainment" -> ((s, dir) => {
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(datediff(col("l_shipdate"), col("o_orderdate")) <= 30,
            1L).otherwise(0L)).as("on_time"))
        .withColumn("sla_permille",
          expr("(1000 * on_time) div n_lines"))
    }),

    // §2.6 — supplier share volatility (round 5: the vendor-stability
    // screen — each supplier's quarterly revenue-share variance across
    // the history, top-15 most volatile; a supplier whose share swings
    // is a concentration risk a mean-share report hides. Shares floor
    // to ppm per (supplier, quarter) cell (the q271 convention), the
    // variance moments are exact BIGINTs over the bounded
    // supplier×quarter grid (dense: absent quarters are genuine zero
    // shares), one deterministic double at the end
    "q302_supplier_volatility" -> ((s, dir) => {
      val cell = t(s, dir, "lineitem")
        .select(col("l_suppkey"),
          date_trunc("quarter", col("l_shipdate")).cast("date").as("q"),
          ExactAgg.scaledLong(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")), 100)
            .as("cents"))
        .groupBy(col("l_suppkey"), col("q"))
        .agg(sum(col("cents")).as("c"))
      val qTot = cell.groupBy(col("q")).agg(sum(col("c")).as("n_q"))
      val sups = cell.select(col("l_suppkey")).distinct()
      sups.crossJoin(qTot) // dense bounded grid
        .join(cell, Seq("l_suppkey", "q"), "left")
        .withColumn("share_ppm",
          expr("(1000000 * coalesce(c, 0)) div n_q"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_quarters"),
          sum(col("share_ppm")).as("ss"),
          sum(col("share_ppm") * col("share_ppm")).as("ssq"))
        .withColumn("share_std_ppm",
          expr("sqrt((CAST(n_quarters AS DOUBLE) * CAST(ssq AS DOUBLE)" +
            " - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)))" +
            " / CAST(n_quarters AS DOUBLE)"))
        .orderBy(col("share_std_ppm").desc, col("l_suppkey").asc)
        .limit(15)
    }),

    // §2.6 — longest hot streak (round 5: the longest run of
    // consecutive above-median revenue days — gaps-and-islands over a
    // binary series whose threshold is the EXACT doubled median
    // (2·cents vs med2 compares integers, q74's convention); the
    // momentum complement of q64's activity streaks and q253's runs
    // test. All windows on the bounded day frame
    "q303_hot_streak" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = events(s, dir).filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(graft.functions.ExactAgg.cents(col("value"))).as("cents"))
      val med = daily.agg(
        (percentile(col("cents"), lit(0.5)) * 2).cast("long").as("med2"))
      val w = Window.orderBy(col("d"))
      daily.crossJoin(broadcast(med))
        .withColumn("hot", (col("cents") * 2 > col("med2")).cast("long"))
        .withColumn("grp",
          sum(when(col("hot") === 0, 1L).otherwise(0L)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("hot") === 1)
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("len"), min(col("d")).as("start_d"))
        .orderBy(col("len").desc, col("start_d").asc)
        .limit(3)
        .select(col("start_d"), col("len"))
    }),

    // §2.6 — time-decay attribution (round 5: the FIFTH and last member
    // of the attribution family — each touch's credit decays by half
    // per day of age at conversion, and with dyadic halving the weights
    // are EXACT integers: w = 2^(7 − age_days), age clamped to the
    // 7-day lookback, so Σw and the largest-remainder split stay pure
    // int64 arithmetic. Same touch frame; credit ∝ w/Σw with the
    // remainder to the most recent touches (they carry the weight)
    "q297_time_decay_attribution" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val touches = Events.touchFrame(events(s, dir),
        7L * 86400L * 1000000L, "purchase")
      val withW = touches
        .withColumn("age_days",
          expr("(p_us - ts_us) div 86400000000"))
        .withColumn("w", expr("CAST(1 AS BIGINT) << (7 - age_days)"))
      val wp = Window.partitionBy(col("user_id"), col("p_id"))
      withW
        .withColumn("sw", sum(col("w")).over(wp))
        .withColumn("rk", row_number().over(wp
          .orderBy(col("ts_us").desc, col("event_id").desc)).cast("long"))
        .withColumn("base", expr("(cents * 1000000 * w) div sw"))
        .withColumn("rem_total",
          expr("cents * 1000000 - sum(base) OVER" +
            " (PARTITION BY user_id, p_id)"))
        .withColumn("credit_micro",
          expr("base + CASE WHEN rk <= rem_total THEN 1 ELSE 0 END"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_touches"),
          sum(col("credit_micro")).as("credit_micro"))
    }),

    // §2.6 — weekly event-mix drift (round 5: the type-mix total-
    // variation distance of each week against the OVERALL mix, as a
    // time series feeding the changepoint family — "which week did the
    // product change?". Exact cross-multiplied TV at permille on the
    // bounded week×type grid; the dense grid left-join keeps zero cells
    // genuine zeros (a type absent in a week IS drift)
    "q298_weekly_mix_drift" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("event_type"),
          expr("datediff(to_date(ts), DATE '1970-01-05') div 7")
            .cast("long").as("wk"))
      val cell = e.groupBy(col("wk"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val wkTot = cell.groupBy(col("wk")).agg(sum(col("c")).as("n_w"))
      val tyTot = cell.groupBy(col("event_type")).agg(sum(col("c")).as("n_t"))
      val tot = cell.agg(sum(col("c")).as("n"))
      wkTot.crossJoin(broadcast(tyTot)) // dense bounded grid
        .join(cell, Seq("wk", "event_type"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("term", abs(col("c") * col("n") - col("n_w") * col("n_t")))
        .groupBy(col("wk"), col("n_w"), col("n"))
        .agg(sum(col("term")).as("tv_num"))
        .select(col("wk"), col("n_w"),
          expr("(1000 * tv_num) div (2 * n_w * n)").as("tv_permille"))
    }),

    // §2.6 — whale-order revenue share (round 5: per year, the share of
    // revenue carried by orders above 2× that year's mean order value —
    // the temporal concentration trend beside the static Gini/HHI/
    // Pareto family. The threshold is mean-relative (scale-free, the
    // q188 lesson) and the test cross-multiplies (cents·n > 2·total)
    // so everything is exact; two passes over the year-grain aggregate
    // frame plus one conditional re-aggregation
    "q299_whale_share" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .select(year(col("o_orderdate")).cast("long").as("y"),
          ExactAgg.cents(col("o_totalprice")).as("cents"))
      val yr = o.groupBy(col("y"))
        .agg(sum(col("cents")).as("total"), count(lit(1)).as("n"))
      o.join(broadcast(yr), Seq("y"))
        .groupBy(col("y"), col("total"), col("n"))
        .agg(
          sum(when(col("cents") * col("n") > col("total") * 2, col("cents"))
            .otherwise(0L)).as("whale_cents"),
          sum(when(col("cents") * col("n") > col("total") * 2, 1L)
            .otherwise(0L)).as("n_whales"))
        .select(col("y"), col("n"), col("n_whales"),
          expr("(1000 * whale_cents) div total").as("whale_share_permille"))
    }),

    // §2.6 — U-shaped (position-based) attribution (round 5: the fourth
    // member of the attribution family — 40% to the first touch, 40% to
    // the last, 20% split over the middles; exact integer micros with
    // deterministic remainder placement and per-conversion conservation
    // by construction (the div remainders fold into the middle pool).
    // Same touch-frame machinery as q182
    "q296_u_shaped_attribution" -> ((s, dir) =>
      Events.uShapedAttribution(events(s, dir),
        lookbackUs = 7L * 86400L * 1000000L, conv = "purchase")),

    // §2.6 — ratio-metric bias check (round 5: the experimentation
    // pitfall demo — purchases-per-click per variant computed BOTH ways:
    // the naive event-level ratio (Σp/Σc, weights heavy users) vs the
    // correct user-level mean of per-user ratios. Event-level milli is
    // exact; user-level floors each user's milli-ratio once (q271's
    // deterministic-floor convention) then takes the exact mean. When
    // the two disagree, every "conversion rate" dashboard on event
    // grain is silently user-weight-biased — that divergence is the
    // report
    "q294_ratio_metric_bias" -> ((s, dir) => {
      val perUser = events(s, dir)
        .groupBy((col("user_id") % 2 === 0).as("is_a"), col("user_id"))
        .agg(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("p"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("c"))
        .filter(col("c") > 0)
      perUser.groupBy(col("is_a"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("p")).as("total_p"), sum(col("c")).as("total_c"),
          sum(expr("(1000 * p) div c")).as("user_milli_sum"))
        .select(col("is_a"), col("n_users"),
          expr("(1000 * total_p) div total_c").as("event_level_milli"),
          expr("user_milli_sum div n_users").as("user_level_milli"))
    }),

    // §2.6 — burstiest users by inter-arrival CV (round 5: the
    // user-grain burstiness screen beside q227's per-type Fano — the
    // coefficient of variation of each user's inter-event gaps; CV ≈ 1
    // is Poisson, ≫ 1 is bursty sessions, ≪ 1 is metronomic botlike
    // traffic. Exact integer second-grain moments per user, one
    // deterministic sqrt; ≥ 20-gap support floor, top-20 with
    // deterministic tie-break
    "q291_interarrival_cv" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"))
        .withColumn("gap_s",
          expr("(ts_us - lag(ts_us, 1) OVER (PARTITION BY user_id" +
            " ORDER BY ts_us, event_id)) div 1000000"))
        .filter(col("gap_s").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"), sum(col("gap_s")).as("sg"),
          sum(col("gap_s") * col("gap_s")).as("sgg"))
        .filter(col("n_gaps") >= 20 && col("sg") > 0)
        .withColumn("cv",
          expr("sqrt(CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE)" +
            " - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))" +
            " / CAST(sg AS DOUBLE)"))
        .orderBy(col("cv").desc, col("user_id").asc)
        .limit(20)
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q187_profit_by_nation" ->
      """SELECT n_name AS nation,
        |       CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(sum(
        |         CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000 + 0.5)
        |           AS BIGINT)
        |         - (4 * CAST(floor(p_retailprice * 10000 + 0.5) AS BIGINT)
        |            * CAST(l_quantity AS BIGINT)) // 5) AS BIGINT)
        |         AS profit_micro
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2""".stripMargin,

    "q188_concentrated_parts" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |              * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS rev_micro
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(rev_micro) AS BIGINT) AS total_micro,
        |               CAST(count(*) AS BIGINT) AS n_parts FROM pp)
        |SELECT l_partkey, rev_micro
        |FROM pp, tot
        |WHERE rev_micro * 2 * n_parts > total_micro * 3""".stripMargin,

    "q189_delay_bands" ->
      """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
        |            THEN '0-30'
        |            WHEN date_diff('day', o_orderdate, l_shipdate) <= 90
        |            THEN '31-90'
        |            ELSE '90+' END AS delay_band,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= DATE '1997-01-01'
        |  AND l_shipdate < DATE '1998-01-01'
        |GROUP BY 1""".stripMargin,

    "q190_custorder_distribution" ->
      """WITH cc AS (
        |  SELECT c_custkey, CAST(count(o_custkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM cc GROUP BY 1""".stripMargin,

    "q191_top_supplier" ->
      """WITH r AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |              * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS rev_micro
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1997-01-01'
        |    AND l_shipdate < DATE '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, rev_micro
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_micro = (SELECT max(rev_micro) FROM r)""".stripMargin,

    "q192_supplier_variety" ->
      """SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 9, 15, 22, 30, 44, 50)
        |GROUP BY 1, 2, 3""".stripMargin,

    "q193_dominant_suppliers" ->
      """WITH red AS (
        |  SELECT p_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
        |  WHERE l_shipdate >= DATE '1997-01-01'),
        |ps AS (
        |  SELECT p_partkey, l_suppkey, CAST(sum(qty) AS BIGINT) AS ps_qty
        |  FROM red GROUP BY 1, 2),
        |pt AS (
        |  SELECT p_partkey, CAST(sum(ps_qty) AS BIGINT) AS p_qty,
        |         CAST(count(*) AS BIGINT) AS n_sup
        |  FROM ps GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |       CAST(count(*) AS BIGINT) AS n_parts_dominated
        |FROM ps JOIN pt USING (p_partkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE ps_qty * n_sup > p_qty * 2
        |GROUP BY 1, 2""".stripMargin,

    "q202_holt_smoothing" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |idx AS (SELECT d, n,
        |               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        |        FROM daily),
        |h AS (
        |  SELECT i, d, n, n AS level, CAST(0 AS BIGINT) AS trend
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT idx.i, idx.d, idx.n,
        |         (2 * idx.n + 8 * (h.level + h.trend)) // 10,
        |         (3 * ((2 * idx.n + 8 * (h.level + h.trend)) // 10 - h.level)
        |            + 7 * h.trend) // 10
        |  FROM idx JOIN h ON idx.i = h.i + 1)
        |SELECT d, n, level, trend, level + trend AS forecast_next
        |FROM h""".stripMargin,

    "q204_heavy_hitters" ->
      """WITH cand AS (
        |  SELECT l_partkey
        |  FROM lineitem
        |  WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '#'
        |          || CAST(l_linenumber AS VARCHAR)), 1, 1) IN ('0', '1')
        |  GROUP BY 1 HAVING count(*) >= 3)
        |SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem JOIN cand USING (l_partkey)
        |GROUP BY 1 HAVING count(*) >= 45""".stripMargin,

    "q241_forecast_backtest" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |idx AS (SELECT d, cents,
        |               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        |        FROM daily),
        |e AS (
        |  SELECT i, d, cents, CAST(-1 AS BIGINT) AS forecast_cents,
        |         CAST(-1 AS BIGINT) AS abs_err, cents AS ema
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT idx.i, idx.d, idx.cents, e.ema,
        |         abs(idx.cents - e.ema),
        |         (20 * idx.cents + 80 * e.ema) // 100
        |  FROM idx JOIN e ON idx.i = e.i + 1)
        |SELECT d, cents, forecast_cents, abs_err
        |FROM e WHERE forecast_cents >= 0""".stripMargin,

    "q242_t_closeness" ->
      """WITH cells AS (
        |  SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT * FROM customer WHERE c_nationkey IS NOT NULL) customer GROUP BY 1, 2),
        |gl AS (
        |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS g_cnt
        |  FROM (SELECT * FROM customer WHERE c_nationkey IS NOT NULL) customer GROUP BY 1),
        |segtot AS (
        |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_g
        |  FROM (SELECT * FROM customer WHERE c_nationkey IS NOT NULL) customer GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |               CAST(count(DISTINCT c_nationkey) AS BIGINT) AS m
        |        FROM (SELECT * FROM customer WHERE c_nationkey IS NOT NULL) customer),
        |grid AS (
        |  SELECT s.c_mktsegment, s.n_g, g.c_nationkey, g.g_cnt,
        |         COALESCE(c.cnt, 0) AS cnt
        |  FROM segtot s CROSS JOIN gl g
        |  LEFT JOIN cells c ON s.c_mktsegment = c.c_mktsegment
        |                   AND g.c_nationkey = c.c_nationkey),
        |cum AS (
        |  SELECT c_mktsegment, n_g,
        |         sum(cnt) OVER w AS cum_g, sum(g_cnt) OVER w AS cum_all
        |  FROM grid
        |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_nationkey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |agg AS (
        |  SELECT c_mktsegment, n_g,
        |         CAST(sum(abs(tot.n * cum_g - n_g * cum_all)) AS BIGINT)
        |           AS emd_num,
        |         max(tot.n) AS n, max(tot.m) AS m
        |  FROM cum CROSS JOIN tot GROUP BY 1, 2)
        |SELECT c_mktsegment, n_g,
        |       (1000 * emd_num) // (n_g * n * (m - 1)) AS emd_permille,
        |       (1000 * emd_num) // (n_g * n * (m - 1)) > 200 AS exceeds_t
        |FROM agg""".stripMargin,

    "q243_mann_whitney" ->
      """WITH d AS (
        |  SELECT source, n_chars FROM documents
        |  WHERE source IN ('src0', 'src1')),
        |byval AS (
        |  SELECT n_chars, CAST(count(*) AS BIGINT) AS cnt,
        |         CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT)
        |           AS cnt_a
        |  FROM d GROUP BY 1),
        |ranked AS (
        |  SELECT cnt, cnt_a,
        |         sum(cnt) OVER (ORDER BY n_chars
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM byval),
        |agg AS (
        |  SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,
        |         CAST(sum(cnt - cnt_a) AS BIGINT) AS n_b,
        |         CAST(sum(cnt_a * (cum - cnt + 1 + cum)) AS BIGINT) AS r2_a
        |  FROM ranked)
        |SELECT n_a, n_b,
        |       r2_a - n_a * (n_a + 1) AS u2_a,
        |       2 * n_a * n_b - (r2_a - n_a * (n_a + 1)) AS u2_b,
        |       least(r2_a - n_a * (n_a + 1),
        |             2 * n_a * n_b - (r2_a - n_a * (n_a + 1))) AS u2_min
        |FROM agg""".stripMargin,

    "q244_holt_trend" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |idx AS (SELECT d, cents,
        |               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        |        FROM daily),
        |h AS (
        |  SELECT i, d, cents, cents AS level_cents,
        |         CAST(0 AS BIGINT) AS trend_cents
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT idx.i, idx.d, idx.cents,
        |         (200 * idx.cents
        |           + 800 * (h.level_cents + h.trend_cents)) // 1000,
        |         (100 * ((200 * idx.cents
        |             + 800 * (h.level_cents + h.trend_cents)) // 1000
        |           - h.level_cents)
        |          + 900 * h.trend_cents) // 1000
        |  FROM idx JOIN h ON idx.i = h.i + 1)
        |SELECT d, cents, level_cents, trend_cents,
        |       level_cents + 7 * trend_cents AS forecast_7d_cents
        |FROM h""".stripMargin,

    "q245_forecast_bakeoff" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |idx AS (SELECT d, cents,
        |               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        |        FROM daily),
        |e AS (
        |  SELECT i, d, cents, cents AS ema FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT idx.i, idx.d, idx.cents, (20 * idx.cents + 80 * e.ema) // 100
        |  FROM idx JOIN e ON idx.i = e.i + 1),
        |lagged AS (
        |  SELECT cents,
        |         lag(cents, 1) OVER (ORDER BY d) AS f_naive,
        |         lag(cents, 7) OVER (ORDER BY d) AS f_seasonal,
        |         lag(ema, 1) OVER (ORDER BY d) AS f_ema
        |  FROM e),
        |m AS (
        |  SELECT 'naive_lag1' AS method, abs(cents - f_naive) AS abs_err
        |  FROM lagged WHERE f_seasonal IS NOT NULL
        |  UNION ALL
        |  SELECT 'seasonal_lag7', abs(cents - f_seasonal)
        |  FROM lagged WHERE f_seasonal IS NOT NULL
        |  UNION ALL
        |  SELECT 'ema_02', abs(cents - f_ema)
        |  FROM lagged WHERE f_seasonal IS NOT NULL)
        |SELECT method, CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(sum(abs_err) AS BIGINT) // CAST(count(*) AS BIGINT)
        |         AS mae_cents
        |FROM m GROUP BY 1""".stripMargin,

    "q247_assortativity" ->
      """WITH e AS (
        |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |d AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        |      FROM e GROUP BY 1),
        |mo AS (
        |  SELECT CAST(count(*) AS BIGINT) AS m,
        |         CAST(sum(dx.deg) AS BIGINT) AS sx,
        |         CAST(sum(dy.deg) AS BIGINT) AS sy,
        |         CAST(sum(dx.deg * dy.deg) AS BIGINT) AS sxy,
        |         CAST(sum(dx.deg * dx.deg) AS BIGINT) AS sxx,
        |         CAST(sum(dy.deg * dy.deg) AS BIGINT) AS syy
        |  FROM e JOIN d dx ON e.src = dx.node JOIN d dy ON e.dst = dy.node)
        |SELECT m, sxy,
        |       (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
        |         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |         AS assortativity
        |FROM mo""".stripMargin,

    "q248_label_propagation" -> lpaOracleSql(3),

    "q250_audience_overlap" ->
      """WITH du AS (
        |  -- NULL is not a user: Spark's count(DISTINCT user_id) skips
        |  -- NULL while count(*) over the distinct pairs counted it —
        |  -- the audience contract is identified users only (r9 sweep)
        |  SELECT DISTINCT event_type, user_id FROM events
        |  WHERE user_id IS NOT NULL),
        |ex AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS exact
        |  FROM du GROUP BY 1),
        |inter AS (
        |  SELECT x.event_type AS type_a, y.event_type AS type_b,
        |         CAST(count(*) AS BIGINT) AS exact_intersect
        |  FROM du x JOIN du y
        |    ON x.user_id = y.user_id AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |       a.exact AS exact_a, b.exact AS exact_b,
        |       a.exact + b.exact - COALESCE(i.exact_intersect, 0)
        |         AS exact_union,
        |       COALESCE(i.exact_intersect, 0) AS exact_intersect,
        |       TRUE AS union_in_bound,
        |       TRUE AS intersect_in_bound
        |FROM ex a JOIN ex b ON a.event_type < b.event_type
        |LEFT JOIN inter i
        |  ON i.type_a = a.event_type AND i.type_b = b.event_type""".stripMargin,

    "q252_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |tr AS (
        |  SELECT d, cents,
        |         CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
        |         CAST(count(*) OVER () AS BIGINT) AS nd,
        |         CAST(sum(cents) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
        |           AND 3 FOLLOWING) AS BIGINT) AS w7,
        |         CAST((d - DATE '1970-01-05') % 7 AS INTEGER) AS wd
        |  FROM daily),
        |td AS (
        |  SELECT d, cents, wd, w7 // 7 AS trend_cents
        |  FROM tr WHERE i >= 4 AND i <= nd - 3),
        |se AS (
        |  SELECT wd,
        |         CAST(sum(cents - trend_cents) AS BIGINT)
        |           // CAST(count(*) AS BIGINT) AS seasonal_cents
        |  FROM td GROUP BY 1)
        |SELECT td.d, td.cents, td.trend_cents, se.seasonal_cents,
        |       td.cents - td.trend_cents - se.seasonal_cents
        |         AS residual_cents
        |FROM td JOIN se USING (wd)""".stripMargin,

    "q253_runs_test" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |m AS (
        |  SELECT d, cents - lag(cents) OVER (ORDER BY d) AS diff
        |  FROM daily),
        |u AS (
        |  SELECT d, CAST(diff > 0 AS BIGINT) AS up
        |  FROM m WHERE diff IS NOT NULL),
        |c AS (
        |  SELECT up,
        |         CASE WHEN lag(up) OVER (ORDER BY d) IS NULL THEN 0
        |              WHEN up <> lag(up) OVER (ORDER BY d) THEN 1
        |              ELSE 0 END AS chg
        |  FROM u),
        |agg AS (
        |  SELECT CAST(sum(up) AS BIGINT) AS n_up,
        |         CAST(sum(1 - up) AS BIGINT) AS n_down,
        |         CAST(sum(chg) + 1 AS BIGINT) AS n_runs
        |  FROM c)
        |SELECT n_up, n_down, n_runs,
        |       (2000000 * n_up * n_down) // (n_up + n_down) + 1000000
        |         AS exp_runs_micro
        |FROM agg""".stripMargin,

    "q261_abc_classification" ->
      """WITH rev AS (
        |  SELECT l_partkey AS p_partkey,
        |         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |           * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT p_partkey, revenue_cents,
        |         CAST(sum(revenue_cents) OVER (ORDER BY revenue_cents DESC,
        |           p_partkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
        |           ROW) AS BIGINT) AS cum_cents,
        |         CAST(sum(revenue_cents) OVER () AS BIGINT) AS total_cents
        |  FROM rev)
        |SELECT p_partkey, revenue_cents,
        |       CASE WHEN cum_cents * 5 <= total_cents * 4 THEN 'A'
        |            WHEN cum_cents * 20 <= total_cents * 19 THEN 'B'
        |            ELSE 'C' END AS abc_class
        |FROM c""".stripMargin,

    "q262_seasonal_index" ->
      """WITH o AS (
        |  SELECT CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS m,
        |         CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS y,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |bym AS (
        |  SELECT m, CAST(sum(cents) AS BIGINT) AS cents_m,
        |         CAST(count(DISTINCT y) AS BIGINT) AS n_m
        |  FROM o GROUP BY 1),
        |tot AS (SELECT CAST(sum(cents_m) AS BIGINT) AS total,
        |               CAST(sum(n_m) AS BIGINT) AS n_total FROM bym)
        |SELECT m, cents_m, n_m,
        |       (1000 * cents_m * n_total) // (n_m * total) AS index_permille
        |FROM bym CROSS JOIN tot""".stripMargin,

    "q263_segment_migration" ->
      """WITH early AS (
        |  SELECT o_custkey,
        |         CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey)
        |           AS BIGINT) AS q_early
        |  FROM (SELECT o_custkey,
        |          CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |            AS BIGINT) AS monetary
        |        FROM orders WHERE o_orderdate < DATE '1998-06-01'
        |        GROUP BY 1)),
        |late AS (
        |  SELECT o_custkey,
        |         CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey)
        |           AS BIGINT) AS q_late
        |  FROM (SELECT o_custkey,
        |          CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |            AS BIGINT) AS monetary
        |        FROM orders WHERE o_orderdate >= DATE '1998-06-01'
        |        GROUP BY 1))
        |SELECT COALESCE(e.q_early, 0) AS q_early,
        |       COALESCE(l.q_late, 0) AS q_late,
        |       CAST(count(*) AS BIGINT) AS n_customers
        |FROM early e FULL OUTER JOIN late l USING (o_custkey)
        |GROUP BY 1, 2""".stripMargin,

    "q316_weekly_arpu" ->
      """WITH e AS (
        |  SELECT user_id,
        |         CAST((CAST(ts AS DATE) - DATE '1970-01-05') // 7 AS BIGINT)
        |           AS wk,
        |         CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL),
        |rev AS (SELECT wk, CAST(sum(cents) AS BIGINT) AS cents
        |        FROM e GROUP BY 1),
        |act AS (SELECT wk, CAST(count(DISTINCT user_id) AS BIGINT)
        |          AS actives FROM e GROUP BY 1)
        |SELECT wk, actives, cents, cents // actives AS arpu_cents
        |FROM rev JOIN act USING (wk)""".stripMargin,

    "q317_basket_trend" ->
      """WITH ok AS (
        |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS y,
        |         l_orderkey,
        |         CAST(count(DISTINCT l_partkey) AS BIGINT) AS k
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2)
        |SELECT y, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(k) AS BIGINT) AS total_k,
        |       (1000 * CAST(sum(k) AS BIGINT)) // CAST(count(*) AS BIGINT)
        |         AS mean_k_milli
        |FROM ok GROUP BY 1""".stripMargin,

    "q318_brand_loyalty" ->
      """WITH cb AS (
        |  SELECT o_custkey, p_brand,
        |         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |           * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |top AS (
        |  SELECT o_custkey,
        |         (1000 * c) // CAST(tot AS BIGINT) AS top_share_pm
        |  FROM (SELECT o_custkey, p_brand, c,
        |               sum(c) OVER (PARTITION BY o_custkey) AS tot,
        |               row_number() OVER (PARTITION BY o_custkey
        |                 ORDER BY c DESC, p_brand ASC) AS rk
        |        FROM cb)
        |  WHERE rk = 1)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(top_share_pm) AS BIGINT)
        |         // CAST(count(*) AS BIGINT) AS mean_loyalty_permille
        |FROM top JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,

    "q319_tenure_mix" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderdate, o_totalprice,
        |         CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT)
        |           - CAST(year(min(CAST(o_orderdate AS DATE))
        |               OVER (PARTITION BY o_custkey)) AS BIGINT) AS age
        |  FROM orders),
        |byb AS (
        |  SELECT CASE WHEN age = 0 THEN 'year0'
        |              WHEN age <= 2 THEN 'year1_2'
        |              ELSE 'year3plus' END AS band,
        |         CAST(count(*) AS BIGINT) AS n_orders,
        |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |           AS BIGINT) AS cents
        |  FROM o GROUP BY 1),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM byb)
        |SELECT band, n_orders, cents,
        |       (1000 * cents) // total AS share_permille
        |FROM byb CROSS JOIN tot""".stripMargin,

    "q320_discount_depth" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(CAST(floor(l_discount * 1000 + 0.5) AS BIGINT))
        |         AS BIGINT) AS disc_pm_sum,
        |       CAST(sum(CAST(floor(l_discount * 1000 + 0.5) AS BIGINT))
        |         AS BIGINT) // CAST(count(*) AS BIGINT)
        |         AS mean_discount_permille
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1
        |ORDER BY mean_discount_permille DESC, p_brand ASC
        |LIMIT 15""".stripMargin,

    "q313_cadence_momentum" ->
      """WITH g0 AS (
        |  SELECT o_custkey,
        |         date_diff('day',
        |           lag(CAST(o_orderdate AS DATE))
        |             OVER (PARTITION BY o_custkey
        |                   ORDER BY o_orderdate, o_orderkey),
        |           CAST(o_orderdate AS DATE)) AS gap,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS rn0
        |  FROM orders),
        |g AS (
        |  SELECT o_custkey, CAST(gap AS BIGINT) AS gap,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY rn0) AS BIGINT) AS gi,
        |         CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT)
        |           AS ng
        |  FROM g0 WHERE gap IS NOT NULL),
        |perc AS (
        |  SELECT o_custkey,
        |         CAST(sum(CASE WHEN gi * 2 <= ng THEN gap ELSE 0 END)
        |           AS BIGINT) AS s1,
        |         CAST(count(*) FILTER (WHERE gi * 2 <= ng) AS BIGINT) AS n1,
        |         CAST(sum(CASE WHEN gi * 2 > ng THEN gap ELSE 0 END)
        |           AS BIGINT) AS s2,
        |         CAST(count(*) FILTER (WHERE gi * 2 > ng) AS BIGINT) AS n2
        |  FROM g GROUP BY 1)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(count(*) FILTER (WHERE s2 * n1 < s1 * n2) AS BIGINT)
        |         AS accelerating,
        |       CAST(count(*) FILTER (WHERE s2 * n1 > s1 * n2) AS BIGINT)
        |         AS slowing,
        |       CAST(count(*) AS BIGINT)
        |         - CAST(count(*) FILTER (WHERE s2 * n1 < s1 * n2) AS BIGINT)
        |         - CAST(count(*) FILTER (WHERE s2 * n1 > s1 * n2) AS BIGINT)
        |         AS steady
        |FROM perc JOIN customer ON o_custkey = c_custkey
        |WHERE n1 >= 2 AND n2 >= 2
        |GROUP BY 1""".stripMargin,

    "q314_brand_affinity" ->
      """WITH cb AS (
        |  SELECT DISTINCT o_custkey, p_brand
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey)
        |SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
        |       CAST(count(*) AS BIGINT) AS shared_customers
        |FROM cb a JOIN cb b
        |  ON a.o_custkey = b.o_custkey AND a.p_brand < b.p_brand
        |GROUP BY 1, 2
        |ORDER BY shared_customers DESC, brand_a ASC, brand_b ASC
        |LIMIT 30""".stripMargin,

    "q315_month_cycle" ->
      """SELECT CASE WHEN day(CAST(o_orderdate AS DATE)) <= 10 THEN 'early'
        |            WHEN day(CAST(o_orderdate AS DATE)) <= 20 THEN 'mid'
        |            ELSE 'late' END AS band,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS total_cents,
        |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_cents
        |FROM orders GROUP BY 1""".stripMargin,

    "q310_tukey_outlier_days" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |q AS (SELECT CAST(quantile_cont(cents, 0.25) * 4 AS BIGINT) AS q1x4,
        |             CAST(quantile_cont(cents, 0.75) * 4 AS BIGINT) AS q3x4
        |      FROM daily)
        |SELECT d, cents,
        |       2 * q1x4 - 3 * (q3x4 - q1x4) AS low_x8,
        |       2 * q3x4 + 3 * (q3x4 - q1x4) AS high_x8,
        |       cents * 8 > 2 * q3x4 + 3 * (q3x4 - q1x4) AS is_high
        |FROM daily CROSS JOIN q
        |WHERE cents * 8 < 2 * q1x4 - 3 * (q3x4 - q1x4)
        |   OR cents * 8 > 2 * q3x4 + 3 * (q3x4 - q1x4)""".stripMargin,

    "q312_rising_parts" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |         l_shipdate >= DATE '2000-11-05' AS is_last,
        |         CAST(floor(l_extendedprice * (1.0 - l_discount) + 0.5)
        |           AS BIGINT) AS dollars
        |  FROM lineitem),
        |byp AS (
        |  SELECT l_partkey, CAST(sum(dollars) AS BIGINT) AS c_all,
        |         CAST(sum(CASE WHEN is_last THEN dollars ELSE 0 END)
        |           AS BIGINT) AS c_last
        |  FROM li GROUP BY 1),
        |tot AS (SELECT CAST(sum(c_all) AS BIGINT) AS total,
        |               CAST(sum(c_last) AS BIGINT) AS total_last FROM byp)
        |SELECT l_partkey, c_all, c_last
        |FROM byp CROSS JOIN tot
        |WHERE c_last >= 1000
        |  AND c_last * total >= c_all * total_last * 2
        |ORDER BY c_last DESC, l_partkey ASC
        |LIMIT 20""".stripMargin,

    "q307_repeat_purchase" ->
      """WITH pc AS (
        |  SELECT l_partkey, o_custkey,
        |         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |agg AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_buyers,
        |         CAST(count(*) FILTER (WHERE n_orders >= 2) AS BIGINT)
        |           AS repeat_buyers
        |  FROM pc GROUP BY 1)
        |SELECT l_partkey, n_buyers, repeat_buyers,
        |       (1000 * repeat_buyers) // n_buyers AS repeat_permille
        |FROM agg WHERE n_buyers >= 10
        |ORDER BY repeat_permille DESC, l_partkey ASC
        |LIMIT 20""".stripMargin,

    "q308_basket_value_by_size" ->
      """WITH sizes AS (
        |  SELECT l_orderkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS k
        |  FROM lineitem GROUP BY 1)
        |SELECT k, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS total_cents,
        |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_cents
        |FROM orders JOIN sizes ON o_orderkey = l_orderkey
        |GROUP BY 1""".stripMargin,

    "q309_discount_ladder" ->
      """WITH li AS (
        |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_pct,
        |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
        |         CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
        |           + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM li)
        |SELECT disc_pct, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(qty) AS BIGINT) // CAST(count(*) AS BIGINT)
        |         AS mean_qty,
        |       (1000 * CAST(sum(cents) AS BIGINT)) // total
        |         AS revenue_share_permille
        |FROM li CROSS JOIN tot
        |GROUP BY disc_pct, total""".stripMargin,

    "q304_dead_stock" ->
      """SELECT p_brand,
        |       CAST(count(*) AS BIGINT) AS n_dead_parts,
        |       CAST(sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS locked_cents
        |FROM part
        |WHERE p_partkey NOT IN (
        |  -- IS NOT NULL is load-bearing: one NULL l_partkey makes
        |  -- NOT IN three-valued-logic empty (every row UNKNOWN), while
        |  -- the library's anti-join correctly ignores NULL right keys —
        |  -- the r9 sweep caught the oracle, not the query
        |  SELECT DISTINCT l_partkey FROM lineitem
        |  WHERE l_shipdate >= DATE '2000-11-04' AND l_partkey IS NOT NULL)
        |GROUP BY 1""".stripMargin,

    "q305_ltv_curve" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |         CAST(year(CAST(o_orderdate AS DATE)) * 12
        |           + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mi,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |h AS (SELECT CAST(max(mi) AS BIGINT) AS h FROM o),
        |percm AS (
        |  SELECT o_custkey, mi, CAST(sum(cents) AS BIGINT) AS c
        |  FROM o GROUP BY 1, 2),
        |cm AS (
        |  SELECT o_custkey, mi,
        |         mi - min(mi) OVER (PARTITION BY o_custkey) AS offset_m,
        |         CAST(sum(c) OVER (PARTITION BY o_custkey ORDER BY mi
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum_c
        |  FROM percm),
        |cf AS (
        |  SELECT o_custkey, CAST(min(mi) AS BIGINT) AS first_mi
        |  FROM percm GROUP BY 1),
        |offs AS (SELECT CAST(unnest(generate_series(0, 23)) AS BIGINT)
        |           AS m),
        |at_m AS (
        |  SELECT cf.o_custkey, offs.m,
        |         arg_max(cm.cum_c, cm.offset_m) AS cum_at_m
        |  FROM cf CROSS JOIN offs CROSS JOIN h
        |  JOIN cm ON cf.o_custkey = cm.o_custkey
        |         AND cm.offset_m <= offs.m
        |  WHERE cf.first_mi + offs.m <= h.h
        |  GROUP BY 1, 2)
        |SELECT m, CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(cum_at_m) AS BIGINT) AS total_cum_cents,
        |       CAST(sum(cum_at_m) AS BIGINT) // CAST(count(*) AS BIGINT)
        |         AS mean_ltv_cents
        |FROM at_m GROUP BY 1""".stripMargin,

    "q306_seasonal_strength" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |tr AS (
        |  SELECT d, cents,
        |         CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
        |         CAST(count(*) OVER () AS BIGINT) AS nd,
        |         CAST(sum(cents) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING
        |           AND 3 FOLLOWING) AS BIGINT) AS w7,
        |         CAST((d - DATE '1970-01-05') % 7 AS INTEGER) AS wd
        |  FROM daily),
        |td AS (
        |  SELECT wd, cents - (w7 // 7) AS detr
        |  FROM tr WHERE i >= 4 AND i <= nd - 3),
        |se AS (
        |  SELECT wd, CAST(sum(detr) AS BIGINT)
        |           // CAST(count(*) AS BIGINT) AS s_wd
        |  FROM td GROUP BY 1),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(se.s_wd * se.s_wd) AS BIGINT) AS ss_seasonal,
        |         CAST(sum((td.detr - se.s_wd) * (td.detr - se.s_wd))
        |           AS BIGINT) AS ss_residual
        |  FROM td JOIN se USING (wd))
        |SELECT n_days, ss_seasonal, ss_residual,
        |       (1000 * ss_seasonal) // (ss_seasonal + ss_residual)
        |         AS strength_permille
        |FROM agg""".stripMargin,

    "q301_sla_attainment" ->
      """SELECT o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(count(*) FILTER (WHERE date_diff('day',
        |         CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30)
        |         AS BIGINT) AS on_time,
        |       (1000 * CAST(count(*) FILTER (WHERE date_diff('day',
        |         CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30)
        |         AS BIGINT)) // CAST(count(*) AS BIGINT) AS sla_permille
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "q302_supplier_volatility" ->
      """WITH cell AS (
        |  SELECT l_suppkey,
        |         CAST(date_trunc('quarter', CAST(l_shipdate AS DATE))
        |           AS DATE) AS q,
        |         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |           * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |qt AS (SELECT q, CAST(sum(c) AS BIGINT) AS n_q FROM cell GROUP BY 1),
        |sups AS (SELECT DISTINCT l_suppkey FROM cell),
        |grid AS (
        |  SELECT s.l_suppkey, qt.q, qt.n_q,
        |         (1000000 * COALESCE(cell.c, 0)) // qt.n_q AS share_ppm
        |  FROM sups s CROSS JOIN qt
        |  LEFT JOIN cell ON s.l_suppkey = cell.l_suppkey AND qt.q = cell.q),
        |m AS (
        |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_quarters,
        |         CAST(sum(share_ppm) AS BIGINT) AS ss,
        |         CAST(sum(share_ppm * share_ppm) AS BIGINT) AS ssq
        |  FROM grid GROUP BY 1)
        |SELECT l_suppkey, n_quarters, ss, ssq,
        |       sqrt((CAST(n_quarters AS DOUBLE) * CAST(ssq AS DOUBLE)
        |         - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)))
        |         / CAST(n_quarters AS DOUBLE) AS share_std_ppm
        |FROM m
        |ORDER BY share_std_ppm DESC, l_suppkey ASC
        |LIMIT 15""".stripMargin,

    "q303_hot_streak" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS d,
        |         CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |med AS (SELECT CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT)
        |          AS med2 FROM daily),
        |h AS (
        |  SELECT d, CAST(cents * 2 > med.med2 AS BIGINT) AS hot
        |  FROM daily CROSS JOIN med),
        |g AS (
        |  SELECT d, hot,
        |         CAST(sum(CASE WHEN hot = 0 THEN 1 ELSE 0 END)
        |           OVER (ORDER BY d
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS grp
        |  FROM h)
        |SELECT min(d) AS start_d, CAST(count(*) AS BIGINT) AS len
        |FROM g WHERE hot = 1
        |GROUP BY grp
        |ORDER BY len DESC, start_d ASC
        |LIMIT 3""".stripMargin,

    "q297_time_decay_attribution" ->
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
        |         np.p_id AS p_id, np.p_us AS p_us, np.cents AS cents
        |  FROM t
        |  WHERE event_type <> 'purchase' AND np IS NOT NULL
        |    AND np.p_us - ts_us <= 604800000000
        |    AND np.cents IS NOT NULL),
        |w AS (
        |  SELECT user_id, event_id, event_type, ts_us, p_id, cents,
        |         CAST(1 AS BIGINT)
        |           << (7 - (p_us - ts_us) // 86400000000) AS w
        |  FROM tc),
        |c AS (
        |  SELECT event_type, cents, w,
        |         CAST(sum(w) OVER (PARTITION BY user_id, p_id) AS BIGINT)
        |           AS sw,
        |         CAST(row_number() OVER (PARTITION BY user_id, p_id
        |                ORDER BY ts_us DESC, event_id DESC) AS BIGINT)
        |           AS rk,
        |         user_id, p_id
        |  FROM w),
        |b AS (
        |  SELECT event_type, rk, user_id, p_id,
        |         (cents * 1000000 * w) // sw AS base,
        |         cents * 1000000
        |           - CAST(sum((cents * 1000000 * w) // sw)
        |               OVER (PARTITION BY user_id, p_id) AS BIGINT)
        |           AS rem_total
        |  FROM c)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_touches,
        |       CAST(sum(base + CASE WHEN rk <= rem_total THEN 1 ELSE 0 END)
        |         AS BIGINT) AS credit_micro
        |FROM b GROUP BY 1""".stripMargin,

    "q298_weekly_mix_drift" ->
      """WITH e AS (
        |  SELECT event_type,
        |         CAST((CAST(ts AS DATE) - DATE '1970-01-05') // 7 AS BIGINT)
        |           AS wk
        |  FROM events),
        |cell AS (
        |  SELECT wk, event_type, CAST(count(*) AS BIGINT) AS c
        |  FROM e GROUP BY 1, 2),
        |wt AS (SELECT wk, CAST(sum(c) AS BIGINT) AS n_w FROM cell GROUP BY 1),
        |tt AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_t
        |       FROM cell GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cell),
        |grid AS (
        |  SELECT wt.wk, wt.n_w, tt.event_type, tt.n_t,
        |         COALESCE(cell.c, 0) AS c
        |  FROM wt CROSS JOIN tt
        |  LEFT JOIN cell ON wt.wk = cell.wk
        |               AND tt.event_type = cell.event_type)
        |SELECT wk, n_w,
        |       (1000 * CAST(sum(abs(c * tot.n - n_w * n_t)) AS BIGINT))
        |         // (2 * n_w * tot.n) AS tv_permille
        |FROM grid CROSS JOIN tot
        |GROUP BY wk, n_w, tot.n""".stripMargin,

    "q299_whale_share" ->
      """WITH o AS (
        |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS y,
        |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |yr AS (
        |  SELECT y, CAST(sum(cents) AS BIGINT) AS total,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM o GROUP BY 1)
        |SELECT o.y, yr.n,
        |       CAST(count(*) FILTER (WHERE o.cents * yr.n > yr.total * 2)
        |         AS BIGINT) AS n_whales,
        |       (1000 * CAST(sum(CASE WHEN o.cents * yr.n > yr.total * 2
        |         THEN o.cents ELSE 0 END) AS BIGINT)) // yr.total
        |         AS whale_share_permille
        |FROM o JOIN yr ON o.y = yr.y
        |GROUP BY o.y, yr.n, yr.total""".stripMargin,

    "q296_u_shaped_attribution" ->
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
        |         np.p_id AS p_id, np.cents * 1000000 AS total_micro
        |  FROM t
        |  WHERE event_type <> 'purchase' AND np IS NOT NULL
        |    AND np.p_us - ts_us <= 604800000000
        |    AND np.cents IS NOT NULL),
        |c AS (
        |  SELECT event_type, total_micro,
        |         CAST(count(*) OVER (PARTITION BY user_id, p_id) AS BIGINT)
        |           AS n,
        |         CAST(row_number() OVER (PARTITION BY user_id, p_id
        |                ORDER BY ts_us ASC, event_id ASC) AS BIGINT) AS rk
        |  FROM tc)
        |SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS n_touches,
        |       CAST(sum(CASE
        |         WHEN n = 1 THEN total_micro
        |         WHEN n = 2 THEN CASE WHEN rk = 1
        |           THEN total_micro - total_micro // 2
        |           ELSE total_micro // 2 END
        |         WHEN rk = 1 OR rk = n THEN (4 * total_micro) // 10
        |         ELSE (total_micro - 2 * ((4 * total_micro) // 10)) // (n - 2)
        |           + CASE WHEN rk - 1 <=
        |               abs((total_micro - 2 * ((4 * total_micro) // 10)) % (n - 2))
        |             THEN CASE WHEN total_micro >= 0 THEN 1 ELSE -1 END
        |             ELSE 0 END
        |         END) AS BIGINT) AS credit_micro
        |FROM c GROUP BY 1""".stripMargin,

    "q294_ratio_metric_bias" ->
      """WITH pu AS (
        |  SELECT user_id % 2 = 0 AS is_a, user_id,
        |         CAST(count(*) FILTER (WHERE event_type = 'purchase')
        |           AS BIGINT) AS p,
        |         CAST(count(*) FILTER (WHERE event_type = 'click')
        |           AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT is_a, CAST(count(*) AS BIGINT) AS n_users,
        |       (1000 * CAST(sum(p) AS BIGINT)) // CAST(sum(c) AS BIGINT)
        |         AS event_level_milli,
        |       CAST(sum((1000 * p) // c) AS BIGINT)
        |         // CAST(count(*) AS BIGINT) AS user_level_milli
        |FROM pu WHERE c > 0
        |GROUP BY 1""".stripMargin,

    "q291_interarrival_cv" ->
      """WITH g AS (
        |  SELECT user_id,
        |         (epoch_us(ts) - lag(epoch_us(ts))
        |           OVER (PARTITION BY user_id
        |                 ORDER BY epoch_us(ts), event_id)) // 1000000
        |           AS gap_s
        |  FROM events),
        |m AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |         CAST(sum(gap_s) AS BIGINT) AS sg,
        |         CAST(sum(gap_s * gap_s) AS BIGINT) AS sgg
        |  FROM g WHERE gap_s IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_gaps, sg, sgg,
        |       sqrt(CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE)
        |         - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
        |         / CAST(sg AS DOUBLE) AS cv
        |FROM m WHERE n_gaps >= 20 AND sg > 0
        |ORDER BY cv DESC, user_id ASC
        |LIMIT 20""".stripMargin,
  )
}
