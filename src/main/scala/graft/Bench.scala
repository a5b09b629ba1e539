package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Benchmark main (driver contract): run the query catalog on
  * SPARK_GRAFT_SF_DIR and print ONE JSON line.
  *
  * Each query is fully materialized through the noop sink (a bare `count()`
  * would let Catalyst prune most of the work for scan-shaped queries).
  * Headline queries get two timed runs with the min taken — first run pays
  * JIT/codegen warmup; the rest of the catalog runs once each (regression
  * visibility for all ~90 queries at single-run precision costs less than
  * double-timing everything).
  *
  * Scale rung: when the sf1 directory (10× SPARK_GRAFT_SF_DIR, generated
  * by tools/gen_sf1.py) exists, the headline set also runs there once
  * each, and the output carries an "sf1" object — the cheapest standing
  * evidence that the headline plans scale ~linearly in rows rather than
  * only clearing the sf0.1 bar. Disable by setting SPARK_GRAFT_SF1_DIR
  * to an empty string.
  */
object Bench {
  val Headline: Seq[String] = Seq(
    "q03_daily_kpis", "q07_pricing_summary", "q08_top_parts_brand_month",
    "q09_revenue_by_nation", "q19_ngram_jaccard_pairs", "q22_knn_brute",
    // dedup family, tracked from round 2 (baseline rows in BASELINE.md)
    "q20_minhash_lsh_pairs", "q45_dedup_clusters", "q47_fuzzy_part_names",
    "q49_neardup_corpus",
    // global set-similarity + decontamination, tracked late round 2
    "q51_ppjoin_pairs", "q55_decontaminate",
    // round 3: exact weighted-jaccard ground truth and the block-free
    // PassJoin edit-distance join (q47's scale path)
    "q52_weighted_jaccard_pairs", "q97_edit_distance_pairs")

  /** The recurring 10×-rung set: headline MINUS the exact pair engines
    * that are quadratic by design (q19/q47 within-block all-pairs;
    * q51/q52 exact global similarity whose cost tracks output density).
    * Those four are quantified once in PLANS.md's sf1 audit — re-running
    * ~10 quadratic minutes every round would measure the documentation,
    * not a regression. Everything that CLAIMS ~linear scaling stays here
    * and is re-measured every round.
    */
  val Sf1Set: Seq[String] = Headline.filterNot(Set(
    "q19_ngram_jaccard_pairs", "q47_fuzzy_part_names",
    "q51_ppjoin_pairs", "q52_weighted_jaccard_pairs",
    // round 7: q20 (now the md5-affine full-oracle entry) stays OUT on
    // measured evidence, not the old truth-arm rule: its exact verify
    // (no lossy screen — oracle exactness) pays per-CANDIDATE, and on
    // this 20-word-template corpus the banding floor is 29% of ALL
    // pairs at sf0.1 (measured: 3.6M -> 27.8M distinct candidates at
    // the 10x rung — linear-ish 7.7x — but the 67 GB verify
    // intermediate crosses the VM memory wall: 3.7 s -> 176 s). The
    // q19/q47/q51/q52 corpus-pathology rule applies; the screened LSH
    // scale path stays rung-covered via q49. BASELINE.md round 7.
    "q20_minhash_lsh_pairs")) ++ Seq(
    // round-3 linear-claim additions (measured 0.6-2.1x at the 10x rung:
    // token split-joins sub-linear, window/merge ops overhead-bound). q98
    // stays OUT: its benchmark formulation scales the batch with the
    // corpus, so its pair work is quadratic-by-formulation there even
    // though the operator's claim (fixed batch, growing corpus) is linear
    "q99_unigram_surprisal", "q101_scd2_intervals", "q102_ngram_novelty",
    "q103_incremental_agg", "q104_gap_fill",
    // winnowing is linear-claim (map-side selection + dfCap-bounded pair
    // join), unlike the by-design-quadratic exact pair engines above
    "q116_winnow_pairs",
    // q117-q120 are linear-claim: one-shuffle windows/aggregates and
    // churn-sized full-outer joins (q119's margin windows run over the
    // domain-bounded cell frame, not the corpus)
    "q117_attribution", "q118_grouping_sets", "q119_lift_cells",
    "q120_changelog_apply",
    // q121-q124 are linear-claim: scan-bound checksum, two-level partial
    // aggregates, and HAVING-gated / orderkey-aggregate joins
    "q121_table_checksum", "q122_mode_per_group", "q123_large_volume_orders",
    "q124_sole_culprit_suppliers",
    // q125-q127 are linear-claim: pivot/unpivot over the day-grain
    // aggregate, and one-user_id-window + rollup shapes
    "q125_unpivot_events", "q126_purchase_cadence", "q127_bounce_rate",
    // q128-q130 are linear-claim: bounded map-side window fan-out,
    // single-scan profile aggregate, nation-partitioned rank windows
    "q128_hopping_windows", "q129_column_profile", "q130_rank_stats",
    // q131-q133 are linear-claim: partition-concat union, key-cardinality
    // count-aggregates + top-k, and a one-scan constraint aggregate
    "q131_union_drift", "q132_skew_report", "q133_constraint_suite",
    // q134 is linear-claim: session rollup + bounded hour fan-out
    "q134_concurrency_curve",
    // q135-q136 are linear-claim: key-grain aggregates + bounded-frame
    // window, and one conditional-aggregate shuffle
    "q135_first_seen_curve", "q136_pearson_corr",
    // q137-q139 are linear-claim: customer-aggregate rank, one
    // conditional-aggregate shuffle, and a type-grain max + 1-row combine
    "q137_pareto_revenue", "q138_conversion_latency", "q139_freshness",
    // q140/q142-q145 are linear-claim: token/shingle/ticket explodes are
    // scan-shaped (linear in corpus chars) with map-side-combining
    // aggregates; q141 stays OUT (it recomputes the by-design-quadratic
    // q19 pair engine)
    "q140_vocab_coverage", "q142_dup_substrings", "q143_cusum_changepoint",
    "q144_dsir_select", "q145_weighted_sample",
    // q146-q153 are linear-claim: bounded-domain aggregates + windows,
    // posting-volume phrase shuffle, vocab-linear source overlap, and
    // part-aggregate rank fusion
    "q146_chi_cells", "q147_autocorr", "q148_benford", "q149_phrase_search",
    "q150_source_overlap", "q151_l_diversity", "q152_weekday_mix",
    "q153_rrf_fusion",
    // q154-q157: q154's wedge bound is m·√m (sub-quadratic by
    // orientation, near-linear on bounded-basket graphs); the rest are
    // one-window / bounded-aggregate shapes
    "q154_triangles", "q155_session_paths", "q156_skyline",
    "q157_basket_rules",
    // round-5 linear-claim additions: link scores ride the same oriented
    // wedge machinery as q154; segment-jaccard is a dfCap-bounded
    // inverted-index join (posting-volume-linear, q116's argument);
    // heavy hitters is two scan-shaped aggregate passes; PQ encode is
    // broadcast-codebook map-side scoring + one argmin shuffle
    "q194_link_scores", "q197_segment_jaccard_docs", "q204_heavy_hitters",
    "q205_pq_encode",
    // round-5 continuation linear-claim additions: feature hashing and
    // BPE encode/compression are scan-shaped explodes into map-side-
    // combining aggregates (no joins at all); fill rates is one bounded
    // conditional aggregate; domain stats is one explode + bounded
    // domain shuffle; triple mining's C(k,3) fan-out is bounded by the
    // basket (q183's frame), so its shuffles carry counts, not triples.
    // q229 stays OUT (it composes q19's by-design-quadratic exact pair
    // engine, the q141 rule)
    "q224_feature_hashing", "q225_bpe_encode", "q228_fill_rates",
    "q230_compression_ratio", "q232_domain_stats", "q233_triple_itemsets",
    // round-5 third-session linear-claim additions: survival/readability/
    // NB-confusion are grain-aggregate or token-join shapes (scan-linear);
    // t-closeness and Mann-Whitney reduce to bounded domain/value frames
    // after one customer/doc-grain aggregate. The day-grain forecast folds
    // (q241/q244/q245) stay OUT: they are job-launch-floor-bound at every
    // SF, so the rung would measure overhead, not scaling
    "q238_survival_curve", "q239_readability", "q242_t_closeness",
    "q243_mann_whitney", "q246_nb_confusion",
    // late third-session linear claims: LPA rounds are |E|-linear (the
    // q110/q174 iterative-graph band), dedup-savings is one fingerprint
    // shuffle (q18's shape), growth accounting and stickiness are
    // (user, week)-grain distinct + bounded rollups. q251 stays OUT: its
    // candidate volume is Σ|block|² over a FIXED-cardinality block key,
    // so it is quadratic-by-blocking at the rung (the q19/q47 rule)
    "q248_label_propagation", "q257_dedup_savings",
    "q258_growth_accounting", "q259_stickiness",
    // q261/q273 are fact-grain aggregate + bounded-frame window shapes;
    // q264/q276 are corpus-char-linear char-grain aggregates — the
    // heaviest scan shapes among the late additions. The rest of
    // q260-q280 are bounded-frame/overhead-bound (rung would measure
    // job floor), and q268/q269 follow the q110/q154 iterative-graph
    // policy (PLANS.md band, not the per-round rung)
    "q261_abc_classification", "q264_char_entropy",
    "q273_new_vs_repeat", "q276_index_coincidence",
    // round-6 linear-claim addition: q321 (eval-anchored bounded
    // broadcast + one cell equi-join) measured 2.2× isolated at the 10×
    // rung. q322/q323 measured JOB-FLOOR-BOUND at both rungs
    // (8.3s/8.3s and 1.0s/0.6s isolated — the rung would measure
    // overhead, the q241/q244/q245 exclusion rule) and q324 composes
    // q19's by-design-quadratic pair engine (the q141/q229 rule) —
    // all three stay out, quantified once in BASELINE.md
    "q321_semantic_decontaminate",
    // round-8 linear-claim additions, all probed at their big rungs
    // (probe_r8/): the DOULION arms (76× @ 100× / sub-linear) and the
    // rows=8 LSH twins (10.05× / 7.3× @ 10× — the j0^8 floor collapse)
    "q326_triangles_doulion", "q327_link_scores_sampled",
    "q328_minhash_lsh_rows8", "q329_weighted_lsh_rows8",
    // round-9 screened twins: the entries that carry the 50x claim
    // (isolated probes: 31.1x / 33.9x @ sf5 where the unscreened twins
    // DNF'd the VM scratch — probe_r9/, BASELINE round 9)
    "q331_minhash_lsh_screened", "q332_weighted_lsh_screened",
    // round 11: the arms-only DOULION error model rides the q326/q327
    // sampled-wedge machinery (sub-linear by the same argument); the
    // exact-arm q330 stays OUT (it recomputes exact T, the q154 wall)
    "q334_doulion_errmodel",
    // round 12: the screened incremental gate arm — q331's banding+screen
    // restated bipartite. Unlike q98 (exact block pairs — quadratic by
    // formulation at the rung), its candidate work is banded and
    // screened per co-occurrence, the survivor-bounded q331/q332 shape
    "q335_incremental_lsh_screened")

  /** Cumulative stage probes for the heaviest graph operators (VERDICT r5
    * item 7): when a query's sf1/sf0.1 rung ratio exceeds [[StageRatio]],
    * Bench times these prefixes of its pipeline at the rung scale and
    * emits a "stages" object — so the NEXT band-edge investigation reads
    * one JSON line instead of running a day of probes. Stages are
    * cumulative (each includes its predecessors); consecutive differences
    * localize the cost. Run once each (diagnostic, not a benchmark).
    */
  private def coEdges(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.coOccurrenceEdges(Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")))
  // env-overridable so the stage path can be forced (e.g. "0" in a smoke
  // test, or lowered when chasing a milder inflation)
  val StageRatio: Double =
    sys.env.get("SPARK_GRAFT_STAGE_RATIO").map(_.toDouble).getOrElse(12.0)
  val StageProbes: Map[String, Seq[(String, (SparkSession, String) => DataFrame)]] =
    Map(
      "q154_triangles" -> Seq(
        "edge_build" -> ((s: SparkSession, d: String) => coEdges(s, d)),
        "wedge_close" -> ((s: SparkSession, d: String) =>
          graft.operators.Graph.orientedTriangles(coEdges(s, d))),
        "full_rollup_topk" -> SparkEntry.queries("q154_triangles")),
      "q194_link_scores" -> Seq(
        "edge_build" -> ((s: SparkSession, d: String) => coEdges(s, d)),
        "wedge_close" -> ((s: SparkSession, d: String) =>
          graft.operators.Graph.orientedTriangles(coEdges(s, d))),
        "full_degree_attach" -> SparkEntry.queries("q194_link_scores")))
  // q97 deliberately has NO stage probe: materializing its candidate
  // frame alone (wide rows through the distinct, no verify filter behind
  // it) OOMed a task at the sf1 rung and took the SparkContext with it —
  // a diagnostic must never be able to kill the bench run. Its band is
  // pinned by isolated probes instead (BASELINE.md: 9.6×/9.8×/10.8×).

  /** True iff every `<md5>  <rows>  <name>.parquet` line of the committed
    * manifest (tools/sf1_manifest.txt, written by tools/gen_sf1.py) matches
    * an md5 of the actual file in `dir`. ~160 MB of MD5 is well under a
    * second — cheap insurance that "sf1" always names the same bytes.
    */
  def sf1ManifestOk(dir: String): Boolean = {
    val manifest = java.nio.file.Paths.get("tools/sf1_manifest.txt")
    if (!java.nio.file.Files.exists(manifest)) return false
    scala.io.Source.fromFile(manifest.toFile).getLines().forall { line =>
      line.trim.split("\\s+") match {
        case Array(md5, _, name) =>
          val f = java.nio.file.Paths.get(dir, name)
          java.nio.file.Files.exists(f) && {
            val d = java.security.MessageDigest.getInstance("MD5")
            val in = java.nio.file.Files.newInputStream(f)
            try {
              val buf = new Array[Byte](1 << 20)
              var n = in.read(buf)
              while (n > 0) { d.update(buf, 0, n); n = in.read(buf) }
            } finally in.close()
            d.digest().map("%02x".format(_)).mkString == md5
          }
        case _ => true // blank/comment lines
      }
    }
  }

  /** 1/5/15-minute load averages — stamped into the run record so
    * in-catalog vs isolated vs busy-shared-VM readings can be adjudicated
    * without re-running (VERDICT r5 item 3: the r4/r5 sf1 disagreements
    * were all machine-context, and proving that cost a round each time).
    */
  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split("\\s+").take(3).mkString(" ")
    catch { case _: Throwable => "unavailable" }

  private def load1m(): Double =
    try loadavg().split(" ")(0).toDouble catch { case _: Throwable => -1.0 }

  /** Load-gate (VERDICT r9 item 3): two rounds running, the canonical
    * BENCH_rN.json was recorded with load_pre >= 5 and showed phantom
    * 1.8-1.9× "regressions" the quiet re-run contradicted — adjudicating
    * those costs a round each time. Rather than record under load, WAIT
    * for the 1-min loadavg to drop below `gate` (poll every 30 s, up to
    * `maxWaitSec`), then proceed; if the machine never quiets, proceed
    * anyway (the driver must still get a record) with the waiver stamped
    * in the context. Returns the "load_gate" context note.
    */
  private def loadGate(gate: Double, maxWaitSec: Int): String = {
    val first = load1m()
    if (first < 0) return "\"unavailable\""
    if (first <= gate) return "\"quiet\""
    val t0 = System.nanoTime()
    var cur = first
    while (cur > gate && (System.nanoTime() - t0) / 1e9 < maxWaitSec) {
      System.err.println(
        f"[bench] load gate: 1-min load $cur%.2f > $gate%.1f — waiting 30 s")
      Thread.sleep(30000)
      cur = load1m()
    }
    val waited = ((System.nanoTime() - t0) / 1e9).round
    if (cur <= gate) s""""waited ${waited}s (load $first -> $cur)""""
    else s""""WAIVED after ${waited}s (load still $cur)""""
  }

  /** Prior-round quiet seconds (tools/bench_reference.json, REFRESHED
    * EACH ROUND from the closing quiet bench: headline queries as bare
    * keys, sf1-rung queries as "sf1:<name>" keys) — the 1.5× retry
    * threshold's baseline. Missing file or queries -> no retries.
    *
    * The file is FLAT by convention — one quoted key to one number — and
    * parsed by the regex below, which would silently mis-read nesting or
    * string values into bogus retry baselines (ADVICE r10). Guards:
    * non-positive values are dropped (a negative/zero baseline would
    * force a retry on every run), and the parsed key count is logged so
    * a malformed file is visible in the run log instead of invisible. */
  private def reference(): Map[String, Double] = {
    val p = java.nio.file.Paths.get("tools/bench_reference.json")
    if (!java.nio.file.Files.exists(p)) return Map.empty
    val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    // reject nested objects outright (ADVICE r11): the file's contract is
    // one flat {"query": seconds} map; if bench output with nested
    // "retries"/"context" objects is ever copied in, the flat regex would
    // silently adopt inner keys ("first"/"retry") as positive baselines
    require(!"\"[^\"]+\"\\s*:\\s*\\{".r.findFirstIn(txt).isDefined,
      "tools/bench_reference.json must be a FLAT {query: seconds} map — " +
        "found a nested object value; refresh it from the per-query " +
        "seconds only, never by copying a bench_out.json verbatim")
    val parsed = "\"([^\"]+)\"\\s*:\\s*([0-9.eE+-]+)".r.findAllMatchIn(txt)
      .flatMap(m => scala.util.Try(m.group(1) -> m.group(2).toDouble).toOption)
      .toMap
    val ok = parsed.filter(_._2 > 0)
    System.err.println(s"[bench] reference: ${ok.size} positive baselines " +
      s"parsed from tools/bench_reference.json" +
      (if (ok.size != parsed.size)
         s" (${parsed.size - ok.size} non-positive DROPPED)" else ""))
    ok
  }

  def main(args: Array[String]): Unit = {
    val gateLoad =
      sys.env.get("SPARK_GRAFT_LOAD_GATE").map(_.toDouble).getOrElse(3.0)
    val gateNote = loadGate(gateLoad,
      sys.env.get("SPARK_GRAFT_LOAD_WAIT").map(_.toInt).getOrElse(600))
    // Per-QUERY gate for the comparison legs (round 13, VERDICT r12
    // item 6): the start-of-run gate left the rest of the headline leg
    // exposed — r12's driver record ran its retries at 1-min load 15-17
    // and the whole round-over-round table needed load archaeology.
    // The signal is an INSTANTANEOUS /proc/stat busy-fraction sample,
    // not the 1-min loadavg: between queries this JVM is idle, so the
    // sample measures EXTERNAL load cleanly, while the loadavg stays
    // inflated for a minute by the bench's own just-finished 32-core
    // burst (measured: a loadavg-based per-query gate waited 30-90 s
    // after EVERY heavy query, gating on its own wake). Waiting happens
    // BETWEEN queries (never inside a timed region), is bounded per
    // query, and each wait is stamped into the context.
    val perQueryWait =
      sys.env.get("SPARK_GRAFT_LOAD_WAIT_Q").map(_.toInt).getOrElse(120)
    def busyCpus(ms: Long): Double = {
      def snap(): (Long, Long) =
        try {
          val f = scala.io.Source.fromFile("/proc/stat").getLines().next()
            .trim.split("\\s+").drop(1).map(_.toLong)
          (f.sum, f(3) + f(4)) // total, idle + iowait
        } catch { case _: Throwable => (0L, 0L) }
      val (t0, i0) = snap(); Thread.sleep(ms); val (t1, i1) = snap()
      val dt = (t1 - t0).toDouble
      if (dt <= 0) 0.0
      else (1.0 - (i1 - i0) / dt) * Runtime.getRuntime.availableProcessors()
    }
    val gateNotes = scala.collection.mutable.ListBuffer.empty[String]
    def gateBefore(name: String): Unit = {
      val first = busyCpus(400)
      if (first > gateLoad) {
        val t0 = System.nanoTime()
        var cur = first
        while (cur > gateLoad &&
            (System.nanoTime() - t0) / 1e9 < perQueryWait) {
          Thread.sleep(5000)
          cur = busyCpus(400)
        }
        val waited = ((System.nanoTime() - t0) / 1e9).round
        gateNotes += s""""$name":"waited ${waited}s """ +
          f"""(busy_cpus $first%.1f -> $cur%.1f)""""
      }
    }
    val loadPre = loadavg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR",
      "/root/repo/testdata-ext/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Shuffle-write / spill accounting (VERDICT r7 item 8): every timed
    // run carries its shuffle-write and disk-spill bytes, so scaling
    // probes show SCRATCH volume curves, not just wall-clock — the
    // evidence class the sf10 disk-wall DNFs were missing. Listener
    // events drain asynchronously; the bus is drained DETERMINISTICALLY
    // between runs (waitUntilEmpty below) so late onTaskEnd events from
    // a loaded bus — exactly the heavy sf10 runs these counters exist
    // for — can't bleed into the next run's delta window.
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    val diskSpill = new java.util.concurrent.atomic.AtomicLong(0)

    // LiveListenerBus.waitUntilEmpty is private[spark] (Scala-level
    // only — the JVM method is public), so plain reflection reaches it;
    // falls back to a fixed sleep if the internal API ever moves.
    val drainListenerBus: () => Unit =
      try {
        val busM = spark.sparkContext.getClass.getMethod("listenerBus")
        val bus = busM.invoke(spark.sparkContext)
        val waitM = bus.getClass.getMethods.find(m =>
          m.getName == "waitUntilEmpty" && m.getParameterCount == 1 &&
            m.getParameterTypes()(0) == java.lang.Long.TYPE).get
        () => { waitM.invoke(bus, java.lang.Long.valueOf(10000L)); () }
      } catch {
        case _: Throwable =>
          System.err.println(
            "[bench] listenerBus reflection failed; shuffle/spill deltas " +
              "fall back to a 150 ms drain sleep (attribution may bleed " +
              "between adjacent runs under a loaded bus)")
          () => Thread.sleep(150)
      }
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            diskSpill.addAndGet(m.diskBytesSpilled)
          }
        }
      })

    // Per-query state isolation (round 5): every operator that
    // localCheckpoints leaves its blocks pinned in the block manager, and
    // over a 184-query catalog those accumulate into memory pressure that
    // inflated end-of-run sf1 readings up to 20x in round 4 (see
    // BASELINE.md's round-5 reconciliation). A real cluster job starts
    // with an empty block manager; give every timed run the same.
    def clearState(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // (seconds, shuffle-write bytes, disk-spill bytes) per run; timed
    // keeps the tuple of the min-time run so the bytes describe the same
    // execution the reported seconds do
    def runOnce(name: String, dir: String): (Double, Long, Long) = {
      val sw0 = shuffleWrite.get(); val sp0 = diskSpill.get()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      drainListenerBus() // deterministic drain (see counter comment above)
      val out = (dt, shuffleWrite.get() - sw0, diskSpill.get() - sp0)
      clearState()
      out
    }
    def timed(name: String, dir: String, runs: Int): (Double, Long, Long) =
      try (1 to runs).map(_ => runOnce(name, dir)).minBy(_._1)
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name @ $dir failed: ${e.getMessage}")
        clearState()
        (-1.0, -1L, -1L)
      }
    def json(results: Seq[(String, Double)]): String =
      results.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    def jsonL(results: Seq[(String, Long)]): String =
      results.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    def total(results: Seq[(String, (Double, Long, Long))]): Double =
      results.collect { case (_, (v, _, _)) if v >= 0 => v }.sum

    // full catalog at the primary scale factor: headline 2-run-min first
    // (their numbers are the round-over-round comparison), then the rest
    // of the catalog single-run in name order. Positional args (builder
    // tuning loops) restrict both rungs to the named queries.
    val unknown = args.toSeq.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      // a typo'd name must not silently widen the run to the full catalog
      System.err.println(s"[bench] unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val only = args.toSeq
    // named queries (builder tuning loops) default to the 2-run-min
    // protocol — an isolated single run mixes JIT/codegen warmup into the
    // number being tuned. SPARK_GRAFT_RUNS overrides for the sf10 rung,
    // where a single 10+-minute run amortizes warmup and a second run
    // would double a multi-hour probe batch for <5% precision (the bias
    // is upward = conservative for a scaling ratio; BASELINE.md notes it).
    val namedRuns = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(2)
    val headline = if (only.nonEmpty) only else Headline
    val rest =
      if (only.nonEmpty) Nil
      else SparkEntry.queries.keys.toSeq.sorted.filterNot(Headline.contains)
    val headResults0 = headline.map { n =>
      gateBefore(n)
      n -> timed(n, sfDir, if (only.nonEmpty) namedRuns else 2)
    }
    // Per-query retry (VERDICT r9 item 3, second half): a headline reading
    // above 1.5× its prior-round QUIET value (tools/bench_reference.json)
    // is re-run once more before recording — a transient load spike then
    // shows up as a retry note instead of a phantom regression the next
    // round has to adjudicate by archaeology. The min is kept (same
    // protocol as the 2-run min); a genuinely regressed query stays slow
    // on the retry and still reports as a regression, now with evidence.
    val ref = reference()
    val retryNotes = scala.collection.mutable.ListBuffer.empty[String]
    val headResults = headResults0.map { case (n, r0 @ (v0, _, _)) =>
      ref.get(n) match {
        case Some(base) if v0 > base * 1.5 =>
          val lp = loadavg()
          val r1 = timed(n, sfDir, 1)
          retryNotes += s""""$n":{"first":$v0,"retry":${r1._1},""" +
            s""""prior_quiet":$base,"load_at_retry":"$lp"}"""
          n -> (if (r1._1 >= 0 && r1._1 < v0) r1 else r0)
        case _ => n -> r0
      }
    }
    val results = headResults ++ rest.map(n => n -> timed(n, sfDir, 1))
    val headlineTotal = total(results.take(headline.length))

    // the 10× rung: the linear-claim set (or the named queries, 2-run-min).
    // A run is labeled "sf1" ONLY if the directory's parquet files hash-match
    // the committed manifest — round-over-round sf1 comparisons are
    // meaningless on silently-drifted data (VERDICT r4 item 5).
    val sf1 =
      if (sf1Dir.nonEmpty && new java.io.File(sf1Dir, "lineitem.parquet").exists()) {
        if (!sf1ManifestOk(sf1Dir)) {
          System.err.println(
            s"[bench] $sf1Dir does not match tools/sf1_manifest.txt — " +
              "regenerate with tools/gen_sf1.py; sf1 rung SKIPPED")
          ""
        } else {
          val names = if (only.nonEmpty) only else Sf1Set
          val runs = if (only.nonEmpty) namedRuns else 1
          // rung retry/load protocol (VERDICT r10 item 4): the same
          // 1.5×-vs-bench_reference retry + load stamps the headline rows
          // carry, keyed "sf1:<name>" in the reference file — a loaded-
          // window rung total then ships its own adjudication context
          // instead of requiring next-round archaeology.
          val rungLoadPre = loadavg()
          val rungRetryNotes = scala.collection.mutable.ListBuffer.empty[String]
          val r = names.map { n =>
            gateBefore("sf1:" + n)
            val r0 @ (v0, _, _) = timed(n, sf1Dir, runs)
            ref.get("sf1:" + n) match {
              case Some(base) if v0 > base * 1.5 =>
                val lp = loadavg()
                val r1 = timed(n, sf1Dir, 1)
                rungRetryNotes += s""""$n":{"first":$v0,"retry":${r1._1},""" +
                  s""""prior_quiet":$base,"load_at_retry":"$lp"}"""
                n -> (if (r1._1 >= 0 && r1._1 < v0) r1 else r0)
              case _ => n -> r0
            }
          }
          // rung-ratio gate: any stage-probed query whose sf1/sf0.1 ratio
          // exceeds StageRatio gets its cumulative stage prefixes timed
          // once each at the rung scale → "stages" object (VERDICT r5 #7)
          val sf01 = results.toMap
          val stages = r.collect {
            case (n, (t1, _, _)) if t1 > 0 && StageProbes.contains(n) &&
                sf01.get(n).exists { case (t0, _, _) =>
                  t0 > 0 && t1 / t0 > StageRatio } =>
              val rows = StageProbes(n).map { case (stage, fn) =>
                val st = try {
                  val t0 = System.nanoTime()
                  fn(spark, sf1Dir)
                    .write.mode("overwrite").format("noop").save()
                  (System.nanoTime() - t0) / 1e9
                } catch { case e: Throwable =>
                  System.err.println(s"[bench] stage $n/$stage failed: ${e.getMessage}")
                  -1.0
                } finally clearState()
                stage -> st
              }
              "\"" + n + "\":" + json(rows)
          }
          val stageJson =
            if (stages.isEmpty) "" else s""","stages":{${stages.mkString(",")}}"""
          val rungRetryJson =
            if (rungRetryNotes.isEmpty) ""
            else s""""retries":{${rungRetryNotes.mkString(",")}},"""
          s""","sf1":{"dir":"$sf1Dir","total":${total(r)},""" +
            s""""load_pre":"$rungLoadPre","load_post":"${loadavg()}",""" +
            rungRetryJson +
            s""""queries":${json(r.map { case (k, (v, _, _)) => k -> v })},""" +
            s""""shuffle_write_bytes":${jsonL(r.map { case (k, (_, b, _)) => k -> b })},""" +
            s""""disk_spill_bytes":${jsonL(r.map { case (k, (_, _, b)) => k -> b })}$stageJson}"""
        }
      } else ""

    // streaming ingest-gate throughput (VERDICT r6 item 8): the two
    // per-delivery gates a 100 TB pipeline runs on every arriving file,
    // measured once per full-catalog run as docs|vecs per second. Probe
    // runs (named queries) skip them — they time the named queries only.
    val gates = if (only.nonEmpty) "" else {
      def gate(label: String, run: () => Long): String =
        try {
          val t0 = System.nanoTime()
          val n = run()
          val dt = (System.nanoTime() - t0) / 1e9
          clearState()
          s""""${label}_rows":$n,"${label}_sec":$dt,""" +
            s""""${label}_rows_per_sec":${n / dt}"""
        } catch { case e: Throwable =>
          System.err.println(s"[bench] gate $label failed: ${e.getMessage}")
          clearState()
          s""""${label}_sec":-1.0"""
        }
      val tmp = java.nio.file.Files.createTempDirectory("gatebench").toString
      // the delivery parquet + checkpoint dirs are multi-GB at sf10 —
      // always swept (finally below), or the scratch disk leaks per run
      def rmTree(p: java.nio.file.Path): Unit = {
        import scala.jdk.CollectionConverters._
        if (java.nio.file.Files.exists(p)) {
          java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      }
      try {
      val dedup = gate("gate_dedup", () => {
        val docs = Tables.load(spark, sfDir, "documents")
        val corpus = docs.filter(col("doc_id") % 10 =!= 0).localCheckpoint()
        val delivery = docs.filter(col("doc_id") % 10 === 0)
        delivery.write.parquet(s"$tmp/docs_in")
        val n = delivery.count()
        graft.streaming.StreamingPipeline.runOnce(
          graft.streaming.StreamingPipeline.dedupIngestStream(
            spark, s"$tmp/docs_in", docs.schema, () => corpus, 0.6,
            s"$tmp/docs_ckpt") { (pairs, _) => pairs.write.format("noop").mode("overwrite").save() })
        n
      })
      val decon = gate("gate_decon", () => {
        val emb = Tables.load(spark, sfDir, "embeddings")
        val eval_ = emb.filter(col("vec_id") % 16 === 0).localCheckpoint()
        val delivery = emb.filter(col("vec_id") % 16 =!= 0)
        delivery.write.parquet(s"$tmp/vecs_in")
        val n = delivery.count()
        graft.streaming.StreamingPipeline.runOnce(
          graft.streaming.StreamingPipeline.decontaminationGateStream(
            spark, s"$tmp/vecs_in", emb.schema, () => eval_, 16, 350000L,
            s"$tmp/vecs_ckpt") { (rep, _) => rep.write.format("noop").mode("overwrite").save() })
        n
      })
      // large-delivery rows (VERDICT r7 item 6): the same two gates fed
      // ONE ~50k-doc / ~100k-vector micro-batch — bulk throughput beside
      // the single-file floors above (which are dominated by micro-batch
      // setup). Delivery = key-shifted replicas of the sfDir table with
      // payload unchanged — the densest realistic load for a dedup gate
      // (every replica pairs with the corpus AND its batch-mates).
      import org.apache.spark.sql.functions.{explode, lit, sequence}
      val dedupBulk = gate("gate_dedup_bulk", () => {
        val docs = Tables.load(spark, sfDir, "documents")
        val corpus = docs.localCheckpoint()
        val reps = math.max(1L, 50000L / math.max(1L, docs.count()))
        val delivery = docs
          .withColumn("r", explode(sequence(lit(0L), lit(reps - 1))))
          .withColumn("doc_id", col("doc_id") + col("r") * 100000000L)
          .select(docs.columns.map(col): _*)
        delivery.write.parquet(s"$tmp/docs_bulk_in")
        val n = delivery.count()
        graft.streaming.StreamingPipeline.runOnce(
          graft.streaming.StreamingPipeline.dedupIngestStream(
            spark, s"$tmp/docs_bulk_in", docs.schema, () => corpus, 0.6,
            s"$tmp/docs_bulk_ckpt") { (pairs, _) =>
              pairs.write.format("noop").mode("overwrite").save() })
        n
      })
      val deconBulk = gate("gate_decon_bulk", () => {
        val emb = Tables.load(spark, sfDir, "embeddings")
        val eval_ = emb.localCheckpoint()
        val reps = math.max(1L, 100000L / math.max(1L, emb.count()))
        val delivery = emb
          .withColumn("r", explode(sequence(lit(0L), lit(reps - 1))))
          .withColumn("vec_id", col("vec_id") + col("r") * 100000000L)
          .select(emb.columns.map(col): _*)
        delivery.write.parquet(s"$tmp/vecs_bulk_in")
        val n = delivery.count()
        graft.streaming.StreamingPipeline.runOnce(
          graft.streaming.StreamingPipeline.decontaminationGateStream(
            spark, s"$tmp/vecs_bulk_in", emb.schema, () => eval_, 16, 350000L,
            s"$tmp/vecs_bulk_ckpt") { (rep, _) =>
              rep.write.format("noop").mode("overwrite").save() })
        n
      })
      s""","stream_gates":{$dedup,$decon,$dedupBulk,$deconBulk}"""
      } finally rmTree(java.nio.file.Paths.get(tmp))
    }

    val retryJson =
      if (retryNotes.isEmpty) ""
      else s""","retries":{${retryNotes.mkString(",")}}"""
    val gateJson =
      if (gateNotes.isEmpty) ""
      else s""","query_gates":{${gateNotes.mkString(",")}}"""
    val context = s""""context":{"load_pre":"$loadPre","load_post":"${loadavg()}",""" +
      s""""load_gate":$gateNote$retryJson$gateJson,""" +
      s""""isolated":${only.nonEmpty},"cpus":$cpus}"""
    val line = s"""{"metric":"total","value":$headlineTotal,"unit":"sec",""" +
      s""""full_total":${total(results)},""" +
      s""""queries":${json(results.map { case (k, (v, _, _)) => k -> v })},""" +
      s""""shuffle_write_bytes":${jsonL(results.map { case (k, (_, b, _)) => k -> b })},""" +
      s""""disk_spill_bytes":${jsonL(results.map { case (k, (_, _, b)) => k -> b })},""" +
      s""""sf":"$sfDir",$context$gates$sf1}"""
    // persist the FULL record to a file (the driver's stdout capture keeps
    // only a ~2000-char tail — a 324-query line can never fit there) and
    // echo it to stderr so raw logs still carry it verbatim
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")), line)
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_out.json write failed: ${e.getMessage}")
    }
    System.err.println(line)
    spark.stop()
    // the driver-facing line, printed LAST (after spark.stop's log noise)
    // and kept COMPACT — headline queries only, rung/gates as totals —
    // so the whole line fits inside the driver's stdout-tail capture and
    // json-parses. Full per-query detail lives in bench_out.json above.
    // Requires build.sbt's `run / outputStrategy := StdoutOutput` (a
    // forked-run line prefixed "[info] " by sbt never parses as JSON).
    val sf1Compact = {
      val m = "\"sf1_total\":([-0-9.eE]+)".r.findFirstMatchIn(sf1)
      m.map(x => s""","sf1_total":${x.group(1)}""").getOrElse {
        // sf1 JSON carries "total" inside the sf1 object; extract it
        val t = "\"total\":([-0-9.eE]+)".r.findFirstMatchIn(sf1)
        t.map(x => s""","sf1_total":${x.group(1)}""").getOrElse("")
      }
    }
    val compact =
      if (only.nonEmpty) line // probe runs are short — full line fits
      else s"""{"metric":"total","value":$headlineTotal,"unit":"sec",""" +
        s""""full_total":${total(results)},""" +
        s""""queries":${json(results.take(headline.length)
          .map { case (k, (v, _, _)) => k -> v })},""" +
        s""""sf":"$sfDir",$context$gates$sf1Compact,"detail":"bench_out.json"}"""
    println(compact)
  }
}
