package graft

import graft.functions.ExactAgg
import graft.operators._
import graft.sources.CsvSource
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import SparkEntryShared._

/** text-analysis and corpus-curation queries (SURVEY §2.9) — one `queries` entry per SURVEY §2 item, with its
  * DuckDB oracle twin in `oracleSql`. Moved verbatim from the
  * single-file SparkEntry in round 6; SparkEntry concatenates
  * the per-family maps, so names/plans/oracles are unchanged.
  */
private[graft] object SparkEntryText {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.9 — text analysis
    "q14_token_stats" -> ((s, dir) =>
      TextAnalysis.tokenStats(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_tokens_ws").cast("long").as("n_tokens_ws"),
          col("n_tokens_bpe").cast("long").as("n_tokens_bpe"),
          col("n_chars").cast("long").as("n_chars"))),

    "q15_quality_score" -> ((s, dir) => TextAnalysis.qualityScore(t(s, dir, "documents"))),

    "q16_lang_id" -> ((s, dir) => {
      val r = TextAnalysis.langId(t(s, dir, "documents"))
      val scoreCols = TextAnalysis.LangMarkers.map { case (l, _) =>
        col(s"score_$l").cast("long").as(s"score_$l") }
      r.select((Seq(col("doc_id"), col("lang")) ++ scoreCols :+ col("guessed_lang")): _*)
    }),

    "q17_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(t(s, dir, "documents"))
        .withColumn("dup_rank", col("dup_rank").cast("long"))),

    // §2.9 — content-hash sampling (reproducible, dedup-consistent)
    "q34_content_sample" -> ((s, dir) =>
      Curation.contentSample(t(s, dir, "documents"), Seq("0", "1", "2", "3"))
        .select(col("doc_id"), col("fp"))),

    // §2.9 — composed curation: length window → punct cap → exact dedup →
    // content-hash sample
    "q35_curation_pipeline" -> ((s, dir) =>
      Curation.curate(t(s, dir, "documents"), 10, 200, 0.10,
        Seq("0", "1", "2", "3", "4", "5", "6", "7"))),

    // §2.9 — corpus vocabulary top-k
    "q36_vocab_topk" -> ((s, dir) => Curation.vocabTopK(t(s, dir, "documents"), 100)),

    // §2.9 — raw TF/DF corpus statistics (TF-IDF minus the oracle-hostile
    // log transform; exact integers)
    "q54_token_corpus_stats" -> ((s, dir) =>
      Curation.tokenCorpusStats(t(s, dir, "documents"), 100)),

    // §2.9 — PII redaction with audit counts; PII is injected
    // deterministically (doc_id-keyed) so the scrub is genuinely exercised
    // on this synthetic corpus and the oracle can replicate the injection
    "q56_pii_scrub" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.piiScrub(docs.withColumn("text",
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com or +1-555-123-4567")))
            .otherwise(lit("")))))
    }),

    // §2.9 — Gopher-style repetition quality signals
    "q57_repetition_score" -> ((s, dir) =>
      TextAnalysis.repetitionScore(t(s, dir, "documents"))),

    // §2.9 — sequence packing: offset-binned training-batch layout,
    // windowed per language (parallel, deterministic)
    "q59_sequence_pack" -> ((s, dir) =>
      Curation.sequencePack(t(s, dir, "documents"), 256)),

    // §2.9 — stratified content-hash sampling: per-language fractions from
    // hash-bucket thresholds (reproducible, no shuffling, no randomness)
    "q48_stratified_sample" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
        .withColumn("bucket", Curation.fpBucket256)
        .filter(
          (col("lang") === "en" && col("bucket") < 128) ||  // 50% of en
          (col("lang") =!= "en" && col("bucket") < 32))     // 12.5% elsewhere
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"))
    }),

    // §2.9 — deterministic train/val/test split by content hash (test ≈
    // 13/256, val ≈ 25/256): duplicates land in the same split, re-runs
    // reproduce it exactly
    "q60_train_split" -> ((s, dir) =>
      Curation.trainValTestSplit(t(s, dir, "documents"), 13, 25)),

    // §2.9 — fixed-width overlapping character chunks (width 128, stride
    // 96): the context-window split before embedding; map-side fan-out
    "q61_doc_chunks" -> ((s, dir) =>
      Curation.chunkFixed(t(s, dir, "documents"), 128, 96)),

    // §2.9 — per-language length-outlier trim at the discrete 5th/95th
    // percentiles (tiny threshold frame broadcast back over the corpus)
    "q62_length_trim" -> ((s, dir) =>
      Curation.lengthTrim(t(s, dir, "documents"), 0.05, 0.95)),

    // §2.9 — token-window chunking (64-token windows, 48-token stride):
    // the tokenizer-aligned twin of q61; map-side fan-out, no shuffle
    "q70_token_windows" -> ((s, dir) =>
      Curation.chunkTokens(t(s, dir, "documents"), 64, 48)),

    // §2.9 — balanced per-language sample: exactly 40 docs per language by
    // smallest content fingerprint; WindowGroupLimit cuts map-side
    "q71_balanced_sample" -> ((s, dir) =>
      Curation.balancedSample(t(s, dir, "documents"), "lang", 40)),

    // §2.9 — document co-occurrence pairs: per-doc sorted distinct tokens
    // expand to ordered pairs MAP-SIDE via nested higher-order transforms
    // (never a positional self-join — the shuffle carries pair counts,
    // not pair rows); top-50 with a total-order tie-break
    "q75_cooccurrence" -> ((s, dir) => {
      val toks = array_sort(array_distinct(
        graft.functions.TextFunctions.tokensWs(col("text"))))
      t(s, dir, "documents").select(col("doc_id"), toks.as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          """flatten(transform(sequence(1, size(toks) - 1),
            |  i -> transform(slice(toks, i + 1, size(toks) - i),
            |         t -> struct(element_at(toks, i) AS t1, t AS t2))))"""
            .stripMargin)).as("p"))
        .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("n_docs").desc, col("t1").asc, col("t2").asc)
        .limit(50)
    }),

    // §2.9 — temperature resampling: upsample low-resource languages by an
    // integer factor (map-side sequence+explode, deterministic copy ids —
    // the multilingual-mix rebalancing step before packing)
    "q77_temperature_resample" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("factor", when(col("lang") === "en", 1).otherwise(3))
        .select(col("doc_id"), col("lang"),
          explode(sequence(lit(1), col("factor"))).as("copy_id"))
        .withColumn("copy_id", col("copy_id").cast("long"))),

    // §2.9 — conjunctive term search over the inverted posting list:
    // docs containing ALL query terms = per-doc distinct-match count
    // equal to the term count; the IN filter prunes the posting explode
    // scan-side so only query-term postings ever shuffle
    "q81_terms_search" -> ((s, dir) => {
      val terms = Seq("table", "row", "value")
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(
            graft.functions.TextFunctions.tokensWs(col("text")))).as("tok"))
        .filter(col("tok").isInCollection(terms))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_matched"))
        .filter(col("n_matched") === terms.size)
    }),

    // §2.9 — BPE tokenizer training (8 merges): one corpus pass builds
    // the word vocab; rounds run driver-side on that bounded frame with
    // incremental pair accounting. FULL oracle since round 6: the k-round
    // recursion unrolls to k SQL stages (bpeTrainOracleSql), so the
    // incremental loop is proven equal to from-scratch recomputation
    // every round; the merge sequence is additionally pinned on the
    // textbook corpus in BpeTrainerSpec
    "q83_bpe_merges" -> ((s, dir) =>
      BpeTrainer.merges(t(s, dir, "documents"), 8)),

    // §2.9 — data-constrained epoch plan (round 6 late, the Muennighoff
    // et al. "repeat data" dashboard): a uniform per-source token target
    // (budget = 4× the corpus, split evenly over sources) against each
    // source's UNIQUE token mass — epochs_milli says how many times the
    // source must repeat to fill its slot, granted caps repetition at 6
    // epochs, shortfall is what the cap leaves unfilled. All integer
    // div arithmetic on the bounded per-source frame; one token-count
    // shuffle + a 1-row totals broadcast
    "q323_epoch_plan" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions.tokensWs
      val u = t(s, dir, "documents")
        .select(col("source"), size(tokensWs(col("text"))).cast("long").as("n"))
        .groupBy(col("source")).agg(sum(col("n")).as("unique_tokens"))
      val w = Window.partitionBy()
      u.select(col("source"), col("unique_tokens"),
          (sum(col("unique_tokens")).over(w) * lit(4L)).as("budget"),
          count(lit(1)).over(w).as("ns"))
        .select(col("source"), col("unique_tokens"),
          expr("budget div ns").as("requested_tokens"),
          expr("(1000 * (budget div ns)) div unique_tokens").as("epochs_milli"),
          expr("least(budget div ns, 6 * unique_tokens)").as("granted_tokens"),
          expr("greatest(0, budget div ns - 6 * unique_tokens)")
            .as("shortfall_tokens"))
    }),

    // §2.9 — source-mix report: per-source doc and token counts, token
    // share of the corpus, and drift vs the uniform target — what a
    // data-mixture dashboard reads; the share window runs over the
    // 20-row per-source aggregate
    "q92_source_mix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(graft.functions.TextFunctions.tokensWs(col("text")))
            .cast("long")).as("n_tokens"))
        .withColumn("token_share", col("n_tokens").cast("double") /
          sum(col("n_tokens")).over(Window.partitionBy()))
        .withColumn("drift", col("token_share") - lit(0.05))
    }),

    // §2.9 — curation funnel report: per-stage survivor counts for the
    // q35 pipeline (the observability twin every production filter
    // cascade ships with); conditional aggregation in ONE corpus pass —
    // stages are cumulative predicates, so no per-stage re-scan
    "q93_curation_funnel" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val nTok = size(graft.functions.TextFunctions.tokensWs(col("text")))
      val punct = length(regexp_replace(col("text"), "[A-Za-z0-9 ]", ""))
        .cast("double") / length(col("text"))
      val lenOk = nTok >= 5 && nTok <= 1000
      val punctOk = punct < lit(0.10)
      docs.agg(
        count(lit(1)).as("n_total"),
        count(when(lenOk, 1)).as("n_len_ok"),
        count(when(lenOk && punctOk, 1)).as("n_punct_ok"))
    }),

    // §2.9 — sub-document curation (round 3): duplication below document
    // granularity, which document-level dedup can't see
    "q95_segment_dedup" -> ((s, dir) =>
      Curation.segmentDedup(t(s, dir, "documents"), 10)),

    "q96_boilerplate_strip" -> ((s, dir) =>
      Curation.boilerplateStrip(t(s, dir, "documents"), 10, minDocs = 3)),

    // §2.9 — unigram-surprisal quality scores: integer-bit surprisal
    // against the corpus's own unigram LM, Zipf skew handled by the
    // broadcast-head / shuffle-tail frequency-split join
    "q99_unigram_surprisal" -> ((s, dir) =>
      TextAnalysis.unigramSurprisal(t(s, dir, "documents"), 200)),

    // §2.9 — per-doc n-gram novelty: the memorization-risk audit
    // (fraction of each doc's distinct word trigrams shared with any
    // other document)
    "q102_ngram_novelty" -> ((s, dir) =>
      TextAnalysis.ngramNovelty(t(s, dir, "documents"), 3)),

    // §2.9 — per-user ordered action sequences: the behavioral
    // sequence-model training feed (cap bounds the collect buffer)
    "q108_user_sequences" -> ((s, dir) =>
      Events.userSequences(events(s, dir), 50)),

    // §2.9 — BM25 ranked retrieval (rational idf, micro-rounded integer
    // score; map-side tf/dl, 1-row broadcast stats, TakeOrdered top-k)
    "q109_bm25_topk" -> ((s, dir) =>
      Retrieval.bm25(t(s, dir, "documents"), Bm25Terms)),

    // §2.9 — per-user behavioral concentration (Herfindahl index of the
    // event-type mix): Σ(n_t/n)² as exact-integer Σn_t² with ONE final
    // double division — order-free, so bit-reproducible on any
    // partitioning. The polynomial form replaces entropy's oracle-
    // hostile log. Two narrowing aggregates, nothing else
    "q112_type_concentration" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_t"))
        .groupBy(col("user_id"))
        .agg(sum(col("n_t")).as("n_events"),
          sum(col("n_t") * col("n_t")).as("ssq"))
        .select(col("user_id"), col("n_events"),
          (col("ssq").cast("double") /
            (col("n_events") * col("n_events"))).as("hhi"))),

    // §2.9 — first-seen novelty curve: per day, how many parts ship for
    // the FIRST time, plus the running catalog size — the corpus-growth /
    // novelty-rate metric of a training-data feed (hash first-seen day ≡
    // part first-ship day here). Two key-grain shuffles (part → first
    // day, day → count); the cumulative window runs over the |days|
    // aggregate frame, the documented bounded-frame exemption
    "q135_first_seen_curve" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(min(col("l_shipdate").cast("date")).as("first_day"))
        .groupBy(col("first_day"))
        .agg(count(lit(1)).as("n_new_parts"))
        .withColumn("cum_parts",
          sum(col("n_new_parts")).over(
            Window.orderBy(col("first_day"))
              .rowsBetween(Window.unboundedPreceding, 0)))
    }),

    // §2.9 — vocabulary coverage / OOV rate: the share of token
    // OCCURRENCES a top-k vocabulary covers — the tokenizer-design
    // metric that decides k. Corpus rows shuffle once (token grain);
    // the top-k cut is a TakeOrdered on the vocab aggregate and the
    // two totals combine on 1-row frames. Exact integer micro-ratio
    "q140_vocab_coverage" -> ((s, dir) => {
      import graft.functions.TextFunctions.tokensWs
      val vocab = t(s, dir, "documents")
        .select(explode(tokensWs(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("tf"))
      val top = vocab.orderBy(col("tf").desc, col("token")).limit(1000)
        .groupBy().agg(sum(col("tf")).as("covered"))
      vocab.groupBy().agg(sum(col("tf")).as("total"),
          count(lit(1)).as("n_vocab"))
        .crossJoin(top)
        .select(lit(1000L).as("vocab_k"), col("n_vocab"), col("total"),
          col("covered"),
          expr("(covered * 1000000L) div total").as("coverage_micro"))
    }),

    // §2.9 — DSIR-style target-affinity selection (target = lang 'en'):
    // hashed-bigram importance screen, exact integer cross-multiplication
    "q144_dsir_select" -> ((s, dir) =>
      Curation.targetEnrichedSelect(t(s, dir, "documents"),
        col("lang") === "en")),

    // §2.9 — integer-exact weighted sample (P ∝ n_chars), ticket-replicated
    // min-hash — rng-free, rerun- and engine-stable
    "q145_weighted_sample" -> ((s, dir) =>
      Curation.weightedTicketSample(t(s, dir, "documents"),
        col("n_chars"), 20)),

    // §2.9 — positional-index phrase search ("table scan" as exact
    // adjacent tokens): the adjacency query q81's bag-of-words index
    // cannot answer; scan keeps only phrase-term postings, one
    // (doc, start) shuffle carries posting volume, never the corpus
    "q149_phrase_search" -> ((s, dir) =>
      TextAnalysis.phraseSearch(t(s, dir, "documents"),
        Seq("table", "scan"))),

    // §2.9 — per-source language-mix drift, total-variation distance
    // (round 5): TV(source, corpus) = ½·Σ_lang |p_s(l) − p(l)| in exact
    // integer micros by cross-multiplication — the distribution-drift
    // monitor for mixed-source corpora, exact where KL/PSI's logs are
    // engine-hostile. One (source, lang) cell aggregate (bounded domain);
    // marginals are windows over the cell frame; 64-bit headroom:
    // Σ|cnt_s·N − cnt·N_s| ≤ 2·N_s·N, so the 10⁶ scale holds to ~10⁹
    // docs per source (decimal(38) beyond — documented)
    "q201_source_drift_tv" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val cells = docs.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c"))
      val srcTot = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      val langTot = docs.groupBy(col("lang")).agg(count(lit(1)).as("cl"))
      // DENSE source×lang matrix (both sides bounded aggregates): a lang
      // the source never emits still contributes |0 − p(l)| to TV —
      // dropping absent cells would understate every drift
      srcTot.crossJoin(broadcast(langTot))
        .join(cells, Seq("source", "lang"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
        .groupBy(col("source"))
        .agg(max(col("n_s")).as("n_docs"), // constant within the group
          sum(abs(col("c") * col("n") - col("cl") * col("n_s"))).as("tv_raw"),
          max(col("n")).as("n_total"))
        .select(col("source"), col("n_docs"),
          expr("(500000 * tv_raw) div (n_docs * n_total)").as("tv_micro"))
    }),

    // §2.9 — curation threshold tradeoff curve (round 5): per quality-
    // score band (floor(score·10), a bounded domain — NO global ntile
    // sort), the doc/token volume in the band and the cumulative volume
    // surviving a cut at the band's lower edge — the "what do we lose at
    // threshold X" dashboard behind every quality-filter decision; one
    // corpus aggregate, cumulative windows over the ≤16-row band frame
    "q203_quality_tradeoff" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val bands = TextAnalysis.qualityScore(t(s, dir, "documents"))
        .select(floor(col("quality_score") * 10).cast("long").as("band"),
          col("n_tokens").cast("long").as("toks"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      val w = Window.orderBy(col("band").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bands
        .withColumn("surv_docs", sum(col("n_docs")).over(w))
        .withColumn("surv_tokens", sum(col("n_tokens")).over(w))
    }),

    // §2.9 — deterministic stratified k-fold assignment (round 5): per
    // lang stratum, fold = (md5-rank − 1) mod 5 — the cross-validation
    // splitter; fold sizes within a stratum differ by ≤1 BY CONSTRUCTION
    // (round-robin over the hash-shuffled rank), one lang-key shuffle
    "q213_stratified_kfold" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      t(s, dir, "documents")
        .select(col("lang"), col("doc_id"))
        .withColumn("fold", (row_number().over(w).cast("long") - 1) % 5)
        .groupBy(col("lang"), col("fold"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // §2.6 — pairwise KS drift matrix across ALL sources (round 5): the
    // shape-drift complement of q201's TV mix matrix and q218's single
    // pair — every (source_a < source_b) cell carries the exact-integer
    // scaled KS distance over doc lengths plus its permille
    // normalization. The per-source CDFs build ONCE over the shared
    // support grid (|distinct lengths| × |sources| rows, both bounded),
    // the pair stage joins on the support value so it is
    // |lengths|·|sources|² at worst — never doc-grain
    // §2.9 — dataset nutrition label (round 5: the "datasheets for
    // datasets" summary card — ONE long-form report with the corpus's
    // headline numbers: volume, token mass, language/source spread,
    // exact-duplicate mass, and length profile; every metric an exact
    // integer from TWO scans (the raw aggregate + the fingerprint
    // dedup), melted into labeled rows by a zero-shuffle stack over the
    // 1-row aggregate. The first thing a data consumer reads, and a
    // single query a release pipeline can gate on
    "q240_nutrition_label" -> ((s, dir) => {
      val toks = graft.functions.TextFunctions.tokensWs(col("text"))
      val base = t(s, dir, "documents").agg(
        count(lit(1)).as("n_docs"),
        sum(size(toks).cast("long")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("n_chars"))
      val keep = t(s, dir, "documents")
        .select(graft.functions.TextFunctions.fingerprint(col("text"))
          .as("fp"))
        .agg(countDistinct(col("fp")).as("n_unique"))
      base.crossJoin(broadcast(keep))
        .select(expr("stack(7," +
          " 'docs', n_docs," +
          " 'tokens', n_tokens," +
          " 'languages', n_langs," +
          " 'sources', n_sources," +
          " 'chars', n_chars," +
          " 'exact_dup_docs', n_docs - n_unique," +
          // nullif: an EMPTY corpus has n_docs = 0, where ANSI div
          // throws DIVIDE_BY_ZERO; the contract (pinned in
          // EmptyInputSpec, matching DuckDB's `// 0` → NULL) is an
          // undefined share, not a crash (adversarial sweep r9)
          " 'dup_permille', (1000 * (n_docs - n_unique)) div nullif(n_docs, 0)" +
          ") AS (metric, value)"))
    }),

    // §2.9 — Naive-Bayes source-separability audit (round 5: "can a
    // bag-of-words model tell the sources apart?" — the resubstitution
    // confusion matrix of a multinomial NB classifier trained on the
    // corpus itself, a standard leakage/mixture diagnostic). Laplace-
    // smoothed log-likelihoods in INTEGER BITS (q99's bitlen trick:
    // bits(t|s) = bitlen(T_s + V) − bitlen(c_st + 1)), decomposed so
    // ABSENT (token, source) pairs never materialize: score_s =
    // n_toks·(bitlen(T_s+V) − 1) − Σ_matched (bitlen(c_st+1) − 1) — the
    // unmatched tokens' bitlen(1)=1 terms fold into the closed form, so
    // the only corpus-grain join is tokens⋈per-source-counts on token
    // (the existing Zipf-split applies at scale), and the doc×source
    // grid is a bounded ×|sources| fan-out of the doc frame. Prediction
    // is argmin bits (ties → lexicographically first source)
    "q246_nb_confusion" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(graft.functions.TextFunctions.tokensWs(col("text")))
            .as("token"))
      val cst = toks.groupBy(col("token"), col("source").as("cls"))
        .agg(count(lit(1)).as("c"))
      val totals = cst.groupBy(col("cls")).agg(sum(col("c")).as("t_s"))
      val vocab = cst.agg(countDistinct(col("token")).as("v"))
      val clsBits = totals.crossJoin(broadcast(vocab))
        .select(col("cls"),
          (length(bin(col("t_s") + col("v"))) - 1).cast("long")
            .as("base_bits")) // bitlen(T_s+V) − 1, per class
      val adj = toks.join(cst.withColumnRenamed("cls", "m_cls"),
          Seq("token"))
        .groupBy(col("doc_id"), col("m_cls"))
        .agg(sum((length(bin(col("c") + 1)) - 1).cast("long")).as("adj"))
      val docFrame = toks.groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_toks"))
      val scored = docFrame.as("df").crossJoin(broadcast(clsBits)) // ×|sources|
        .join(adj.as("aj"),
          col("df.doc_id") === col("aj.doc_id") &&
            col("cls") === col("m_cls"),
          "left")
        .select(col("df.doc_id").as("doc_id"), col("source"), col("cls"),
          (col("n_toks") * col("base_bits") -
            coalesce(col("adj"), lit(0L))).as("score_bits"))
      // round 12: a min_by(struct, struct) argmin variant was measured
      // SLOWER than this window (3.6 -> 5.1 s at sf0.1): struct-ordered
      // aggregates compare interpreted per row where the window sort is
      // codegen'd — same lesson as the struct-element array_intersect
      // (OPTIMIZATION_r12.md). The row_number shape stays.
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score_bits").asc, col("cls").asc)
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .groupBy(col("source").as("true_source"),
          col("cls").as("pred_source"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // §2.9 — canary-string contamination scan (round 5: the secret-leak /
    // eval-contamination screen run before any release — for each entry
    // of a bounded canary list, how many documents contain it and how
    // many times in total. One corpus scan with a ×|canaries| broadcast
    // fan-out (the bounded-domain pattern); occurrence counts by the
    // exact replace-length identity, so both engines count overlapping-
    // free occurrences identically. The real pipeline swaps the literal
    // list for the release's actual canaries — the SHAPE is the operator
    "q249_canary_scan" -> ((s, dir) =>
      TextAnalysis.canaryScan(t(s, dir, "documents"),
        Seq("fast table", "scan slow", "window table", "zebra quantum"))),

    // §2.9 — filter-threshold calibration sweep (round 5: before a
    // curation filter ships, the sweep that PICKS its threshold — for
    // ten cut points on the unique-token-ratio quality signal, the
    // surviving doc count, surviving token mass, and mean length. One
    // doc-grain scan computes the signal; the sweep is a ×10 broadcast
    // threshold fan-out (bounded-domain pattern) into one aggregate, so
    // ten candidate filters cost one corpus pass, not ten. Thresholds
    // where nothing survives drop out identically in both engines
    "q254_threshold_sweep" -> ((s, dir) => {
      val toks = graft.functions.TextFunctions.tokensWs(col("text"))
      val d = t(s, dir, "documents")
        .select(col("n_chars"),
          size(toks).cast("long").as("n_toks"),
          size(array_distinct(toks)).cast("long").as("n_uniq"))
        .filter(col("n_toks") > 0)
        .withColumn("score_pm", expr("(1000 * n_uniq) div n_toks"))
      val th = s.range(0, 10)
        .select((col("id") * 100).as("threshold_pm"))
      d.crossJoin(broadcast(th))
        .filter(col("score_pm") >= col("threshold_pm"))
        .groupBy(col("threshold_pm"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("n_tokens"),
          expr("sum(n_chars) div count(1)").as("mean_chars"))
    }),

    // §2.9 — source language purity (round 5: per source, the dominant
    // language's share in exact permille plus the language itself — the
    // routing-sanity screen before per-language processing trusts the
    // source label; one bounded contingency + deterministic argmax
    "q311_lang_purity" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cell = t(s, dir, "documents")
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("c").desc, col("lang").asc)
      cell
        .withColumn("n_s", sum(col("c")).over(
          Window.partitionBy(col("source"))))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("source"), col("lang").as("dominant_lang"),
          col("n_s").as("n_docs"),
          expr("(1000 * c) div n_s").as("purity_permille"))
    }),

    // §2.9 — release-gate scorecard (round 5: the composed one-stop
    // health check a release pipeline actually gates on — four
    // independent checks from four operators of this library, each a
    // labeled row with its exact value and verdict: exact-duplicate
    // mass (q240's arm) under 200‰, canary hits (q249's arm) exactly
    // zero, effective source diversity (q286's arm) at least 2×1000
    // milli, and template-cluster mass (q280's arm) under 250‰ of docs.
    // One corpus scan per check, a 4-row union — the meta-query that
    // turns the catalog into a GATE
    "q300_release_gate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val nDocs = docs.agg(count(lit(1)).as("nd"))
      val dup = docs
        .select(graft.functions.TextFunctions.fingerprint(col("text"))
          .as("fp"))
        .agg(countDistinct(col("fp")).as("uniq"))
        .crossJoin(broadcast(nDocs))
        .select(lit("dup_permille").as("check"),
          // nullif guards the empty-corpus ANSI DIVIDE_BY_ZERO (r9
          // adversarial sweep; contract = NULL, as DuckDB's `// 0`)
          expr("(1000 * (nd - uniq)) div nullif(nd, 0)").as("value"))
      val canary = TextAnalysis.canaryScan(docs,
          Seq("fast table", "zebra quantum"))
        // coalesce: an EMPTY corpus yields no canary rows and sum → NULL,
        // but the contract is 0 hits / pass (adversarial sweep r9)
        .agg(coalesce(sum(col("n_docs")), lit(0L)).as("v"))
        .select(lit("canary_hit_docs").as("check"),
          col("v").cast("long").as("value"))
      val effRow = docs
        .select(col("source"),
          size(graft.functions.TextFunctions.tokensWs(col("text")))
            .cast("long").as("nt"))
        .groupBy(col("source")).agg(sum(col("nt")).as("c"))
        .crossJoin(broadcast(docs
          .select(col("source"),
            size(graft.functions.TextFunctions.tokensWs(col("text")))
              .cast("long").as("nt"))
          .groupBy(col("source")).agg(sum(col("nt")).as("c"))
          .agg(sum(col("c")).as("total"))))
        .select(expr("(1000000 * c) div total").as("sp"))
        .agg(sum(col("sp") * col("sp")).as("sq"))
        .select(lit("eff_sources_milli").as("check"),
          // sq = 0 when every doc tokenizes empty — same NULL contract
          expr("1000000000000000 div nullif(sq, 0)").as("value"))
      val templ = docs
        .select(md5(concat_ws(",", transform(
          slice(graft.functions.TextFunctions.tokensWs(col("text")), 1, 10),
          t2 => length(t2).cast("string")))).as("sig"))
        .groupBy(col("sig")).agg(count(lit(1)).as("k"))
        .filter(col("k") >= 2)
        .agg(coalesce(sum(col("k")), lit(0L)).as("in_clusters"))
        .crossJoin(broadcast(nDocs))
        .select(lit("template_mass_permille").as("check"),
          expr("(1000 * in_clusters) div nullif(nd, 0)").as("value"))
      dup.unionByName(canary).unionByName(effRow).unionByName(templ)
        .withColumn("pass", expr(
          """CASE check
            |  WHEN 'dup_permille' THEN value < 200
            |  WHEN 'canary_hit_docs' THEN value = 0
            |  WHEN 'eff_sources_milli' THEN value >= 2000
            |  ELSE value < 250
            |END""".stripMargin))
    }),

    // §2.9 — effective vocabulary size (round 5: the inverse-Simpson
    // diversity of the token distribution — "this corpus behaves like N
    // equally-frequent types", the concentration companion to Heaps
    // q168 and Zipf q285. The milli scaling uses the exact div/mod
    // decomposition (q·1000 + (r·1000) div s, with q = T² div S,
    // r = T² mod S) — no precision traded for the ×1000 headroom, the
    // reusable exact-rescale trick; T² itself stays in int64 up to
    // ~3e9 corpus tokens (switch the two products to decimal(38,0)
    // beyond that — same expressions, both engines)
    "q295_effective_vocab" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(graft.functions.TextFunctions.tokensWs(col("text")))
          .as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("tf"))
        .agg(count(lit(1)).as("n_types"), sum(col("tf")).as("total"),
          sum(col("tf") * col("tf")).as("sq"))
        .select(col("n_types"), col("total"),
          expr("(total * total div sq) * 1000" +
            " + ((total * total % sq) * 1000) div sq")
            .as("eff_vocab_milli"))
    }),

    // §2.9 — Zipf rank-frequency curve (round 5: the log-free Zipf
    // check — for the top-50 vocabulary, freq·rank is ~constant under
    // Zipf's law, so the EXACT product column IS the diagnostic (no
    // log-log regression, no transcendentals); rank over the vocab
    // aggregate with full tie-break, plus each rank's share in ppm
    "q285_zipf_curve" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val vocab = t(s, dir, "documents")
        .select(explode(graft.functions.TextFunctions.tokensWs(col("text")))
          .as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("tf"))
      val tot = vocab.agg(sum(col("tf")).as("total"))
      vocab
        .withColumn("rank", row_number()
          .over(Window.orderBy(col("tf").desc, col("token").asc))
          .cast("long"))
        .filter(col("rank") <= 50)
        .crossJoin(broadcast(tot))
        .select(col("rank"), col("token"), col("tf"),
          (col("tf") * col("rank")).as("freq_rank_product"),
          expr("(1000000 * tf) div total").as("share_ppm"))
    }),

    // §2.9 — effective number of sources (round 5: the inverse-Simpson
    // diversity of the corpus's source mix — "this 20-source corpus
    // behaves like N equally-sized sources"; the Hill-number view of
    // q92's share table and the mix-collapse alarm for q114's
    // allocations. Token-mass shares floor to ppm (q271's int64
    // headroom trick), eff = 1e12 / Σ share_ppm² at milli scale
    "q286_effective_sources" -> ((s, dir) => {
      val byS = t(s, dir, "documents")
        .select(col("source"),
          size(graft.functions.TextFunctions.tokensWs(col("text")))
            .cast("long").as("n_toks"))
        .groupBy(col("source")).agg(sum(col("n_toks")).as("c"))
      val tot = byS.agg(sum(col("c")).as("total"),
        count(lit(1)).as("n_sources"))
      byS.crossJoin(broadcast(tot))
        .select(col("n_sources"), col("total"),
          expr("(1000000 * c) div total").as("share_ppm"))
        .groupBy(col("n_sources"), col("total"))
        .agg(sum(col("share_ppm") * col("share_ppm")).as("sq_sum"))
        .select(col("n_sources"), col("total"),
          expr("(1000000000000000 ) div sq_sum").as("eff_sources_milli"))
    }),

    // §2.9 — term burstiness (round 5: Church–Gale burstiness — when a
    // term appears at all, how MANY times does it appear? — tf/df, the
    // within-document clumping signal that separates topical content
    // words (bursty) from function words (evenly spread), orthogonal to
    // raw frequency. Exact integer milli-ratio over the (token, doc)
    // grain; df ≥ 5 support floor, top-30 with full tie-break
    "q284_term_burstiness" -> ((s, dir) => {
      val td = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokensWs(col("text")))
            .as("token"))
        .groupBy(col("token"), col("doc_id"))
        .agg(count(lit(1)).as("tf_doc"))
      td.groupBy(col("token"))
        .agg(sum(col("tf_doc")).as("tf"), count(lit(1)).as("df"))
        .filter(col("df") >= 5)
        .withColumn("burstiness_milli", expr("(1000 * tf) div df"))
        .orderBy(col("burstiness_milli").desc, col("token").asc)
        .limit(30)
    }),

    // §2.9 — template-structure clusters (round 5: documents sharing
    // the same STRUCTURAL signature — the sequence of token lengths —
    // even when the words differ: the form-letter/boilerplate detector
    // a content-hash dedup (q18, exact words) and shingle near-dup
    // (q19/q20, shared vocabulary) both miss by design. Signature =
    // md5 of the comma-joined OPENING token-length sequence (first 10
    // tokens — form letters share openings; the full-sequence signature
    // is vacuously unique on any natural corpus, the q165 lesson);
    // one signature shuffle, clusters of ≥ 2 with the min-doc exemplar
    "q280_template_clusters" -> ((s, dir) => {
      val toks = graft.functions.TextFunctions.tokensWs(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          md5(concat_ws(",",
            transform(slice(toks, 1, 10), t => length(t).cast("string"))))
            .as("sig"))
        .groupBy(col("sig"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("exemplar"))
        .filter(col("n_docs") >= 2)
    }),

    // §2.9 — index of coincidence (round 5: the classic cryptanalysis
    // text statistic beside q264's entropy — per source, the
    // probability two random characters match: IC = Σc(c−1) / (n(n−1)).
    // Both the coincidence count and n are exact BIGINTs from one
    // (source, char) aggregate; the ratio is ONE deterministic double
    // division (numerator·denominator would overflow int64 at corpus
    // scale, and a permille floor would quantize away the signal — the
    // double division of exact integers is the right arm here)
    "q276_index_coincidence" -> ((s, dir) => {
      val cc = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), "")).as("ch"))
        .filter(col("ch") =!= "")
        .groupBy(col("source"), col("ch"))
        .agg(count(lit(1)).as("c"))
      cc.groupBy(col("source"))
        .agg(sum(col("c")).as("n"),
          sum(col("c") * (col("c") - 1)).as("coincidences"))
        .withColumn("ic",
          expr("CAST(coincidences AS DOUBLE)" +
            " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))"))
    }),

    // §2.9 — character-entropy screen (round 5: the char-level
    // degenerate-text signal under q57's word-level repetition and
    // q99's token surprisal — per doc, Σ c·(bitlen(n) − bitlen(c)) over
    // its character counts, the integer-bits entropy approximation
    // (within 1 bit/term of Σ c·log2(n/c), q99's trick applied
    // per-document): near-zero bits/char marks single-char floods and
    // run-on repetition that token-level screens miss. One
    // (doc, char)-grain aggregate from the explode — linear in corpus
    // chars, no joins
    "q264_char_entropy" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cc = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(col("text"), "")).as("ch"))
        .filter(col("ch") =!= "")
        .groupBy(col("doc_id"), col("ch"))
        .agg(count(lit(1)).as("c"))
        .withColumn("n", sum(col("c"))
          .over(Window.partitionBy(col("doc_id"))))
      cc.groupBy(col("doc_id"))
        .agg(max(col("n")).as("n_chars"),
          count(lit(1)).as("n_distinct_chars"),
          sum((col("c") * (length(bin(col("n"))) - length(bin(col("c")))))
            .cast("long")).as("entropy_bits_x"))
        .withColumn("millibits_per_char",
          expr("(1000 * entropy_bits_x) div n_chars"))
    }),
    // an operator of this library — q16's marker-word classifier scored
    // against the corpus's lang labels as a confusion matrix, the
    // heuristic-quality report a curation pipeline reviews before
    // trusting the classifier's routing decisions. Same scan shape as
    // q16 (per-row marker counting + argmax), collapsed to the bounded
    // |langs|² grid
    "q260_langid_confusion" -> ((s, dir) =>
      TextAnalysis.langId(t(s, dir, "documents"))
        .groupBy(col("lang").as("true_lang"), col("guessed_lang"))
        .agg(count(lit(1)).as("n_docs"))),

    // §2.9 — dedup savings report (round 5: the ROI statement for the
    // dedup family — per source, raw vs post-exact-dedup doc and token
    // mass, with inflation in exact ppm. "Keeper" is the canonical
    // min-doc_id per fingerprint ACROSS the whole corpus (cross-source
    // duplicates credit the keeper's source, so per-source savings sum
    // to the corpus savings); one fingerprint shuffle + one argmin,
    // the q18 shape with token mass riding along
    "q257_dedup_savings" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = graft.functions.TextFunctions.tokensWs(col("text"))
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          graft.functions.TextFunctions.fingerprint(col("text")).as("fp"),
          size(toks).cast("long").as("n_toks"))
      val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      val tagged = d.withColumn("keeper", row_number().over(w) === 1)
      tagged.groupBy(col("source"))
        .agg(count(lit(1)).as("raw_docs"),
          sum(col("n_toks")).as("raw_tokens"),
          count(when(col("keeper"), 1)).as("kept_docs"),
          sum(when(col("keeper"), col("n_toks")).otherwise(0L))
            .as("kept_tokens"))
        .withColumn("doc_inflation_ppm",
          expr("(1000000 * (raw_docs - kept_docs)) div raw_docs"))
        .withColumn("token_inflation_ppm",
          expr("(1000000 * (raw_tokens - kept_tokens)) div raw_tokens"))
    }),

    // §2.9 — quantile normalization of per-source length distributions
    // (round 5: the batch-effect correction — map each source's length
    // values onto the GLOBAL length distribution so downstream
    // length-sensitive filters treat sources uniformly; the rank-based
    // distribution alignment used for cross-batch harmonization). Works
    // at VALUE grain, never doc grain: source CDF cells (|sources| ×
    // |distinct lengths|) map to the minimal global value whose CDF
    // reaches the cell's source-relative rank — the exact integer
    // cross-multiplied condition cumAll(v)·n_s ≥ cum_s·N. The mapping
    // join is bounded-frame × bounded-frame (value grain squared at
    // worst), independent of corpus row count
    "q256_quantile_normalize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents").select(col("source"), col("n_chars"))
      val glob = d.groupBy(col("n_chars")).agg(count(lit(1)).as("c"))
        .withColumn("cum_all", sum(col("c"))
          .over(Window.orderBy(col("n_chars"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("n_chars").as("v"), col("cum_all"))
      val tot = d.agg(count(lit(1)).as("n"))
      val cells = d.groupBy(col("source"), col("n_chars"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum_s", sum(col("c"))
          .over(Window.partitionBy(col("source")).orderBy(col("n_chars"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val segN = d.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
      cells.join(broadcast(segN), Seq("source"))
        .crossJoin(broadcast(tot))
        .join(broadcast(glob),
          col("cum_all") * col("n_s") >= col("cum_s") * col("n"))
        .groupBy(col("source"), col("n_chars"), col("c"))
        .agg(min(col("v")).as("mapped_chars"))
    }),

    // §2.9 — readability scoring (round 5: the Flesch reading-ease
    // family as an exact-integer curation signal — sentences from
    // terminal-punctuation splits, syllables as vowel GROUPS per word
    // (the standard dependency-free heuristic), and the score in micros
    // by cross-multiplication: 206835000 − 1015000·(words/sentences) −
    // 84600000·(syllables/words), each ratio micro-scaled BEFORE its
    // weight so both engines divide identical integers. Per-source
    // rollup of the per-doc frame; everything map-side + one bounded
    // source aggregate
    "q239_readability" -> ((s, dir) => {
      val toks = graft.functions.TextFunctions.tokensWs(col("text"))
      val d = t(s, dir, "documents").select(col("source"),
          size(toks).cast("long").as("n_words"),
          greatest(size(split(col("text"), "[.!?]+")) - 1, lit(1))
            .cast("long").as("n_sents"),
          expr("""CAST(aggregate(
            |  filter(split(lower(text), ' '), x -> x != ''),
            |  0L, (acc, w) -> acc + greatest(
            |    length(regexp_replace(w, '[aeiouy]+', 'V')) -
            |    length(replace(regexp_replace(w, '[aeiouy]+', 'V'), 'V', '')),
            |    1)) AS BIGINT)""".stripMargin)
            .as("n_syll"))
        .filter(col("n_words") > 0)
        .withColumn("flesch_micro",
          expr("206835000 - (1015 * ((1000000 * n_words) div n_sents))" +
            " div 1000 - (84600 * ((1000000 * n_syll) div n_words))" +
            " div 1000"))
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("words"),
          sum(col("n_syll")).as("sylls"),
          expr("sum(flesch_micro) div count(1)").as("mean_flesch_micro"))
    }),

    // §2.9 — Burrows' Delta style distance between sources (round 5: the
    // classic stylometry metric — for the corpus's top-20 words, each
    // source's usage rate standardizes against the cross-source
    // mean/stddev, and a source pair's delta is the mean absolute
    // difference of those z-scores. Rates are exact integer ppm; the
    // only doubles are the final sqrt (IEEE-exact, the q115/q198
    // argument) and the z subtraction, micro-rounded once per cell
    // before the pair stage so both engines difference identical
    // integers. All frames bounded: 20 words × |sources|
    "q237_burrows_delta" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("source"),
          explode(graft.functions.TextFunctions.tokensWs(col("text")))
            .as("w"))
      val top = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w").asc).limit(20)
        .select(col("w"))
      val srcTot = toks.groupBy(col("source")).agg(count(lit(1)).as("nt"))
      val rates = toks.join(broadcast(top), Seq("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cw"))
      // DENSE word × source grid: absent cells are genuine zero rates
      val grid = top.crossJoin(srcTot)
        .join(rates, Seq("source", "w"), "left")
        .select(col("source"), col("w"),
          expr("(1000000 * coalesce(cw, 0)) div nt").as("ppm"))
      val stats = grid.groupBy(col("w"))
        .agg(count(lit(1)).as("k"), sum(col("ppm")).as("s1"),
          sum(col("ppm") * col("ppm")).as("s2"))
        .filter(col("k") * col("s2") > col("s1") * col("s1")) // nonzero var
      // z = (k·ppm − s1) / sqrt(k·s2 − s1²): the population z-score with
      // mean s1/k and std sqrt(k·s2 − s1²)/k, cleared of divisions
      val z = grid.join(broadcast(stats), Seq("w"))
        .select(col("source"), col("w"),
          floor((col("ppm") * col("k") - col("s1")).cast("double") /
            sqrt((col("k") * col("s2") - col("s1") * col("s1"))
              .cast("double")) * 1e6 + 0.5)
            .cast("long").as("z_micro"))
      z.as("a").join(z.as("b"),
          col("a.w") === col("b.w") && col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          abs(col("a.z_micro") - col("b.z_micro")).as("dz"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_words"),
          expr("sum(dz) div count(1)").as("delta_micro"))
    }),

    // §2.9 — web-domain provenance stats (round 5: the per-domain volume
    // report every web-corpus pipeline runs before domain-level dedup /
    // filtering (C4, RefinedWeb) — URLs extracted from text, aggregated
    // by host. The synthetic corpus carries no URLs, so q56's
    // deterministic-injection pattern plants them keyed by doc_id —
    // the extraction regex and the share arithmetic are what's under
    // test. One explode + one bounded domain-key shuffle + a 1-row total
    "q232_domain_stats" -> ((s, dir) => {
      val re = "https?://([A-Za-z0-9.-]+)"
      val aug = t(s, dir, "documents").withColumn("text",
        concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" see http://site"), (col("doc_id") % 7).cast("string"),
              lit(".example.com/page"), col("doc_id").cast("string")))
            .otherwise(lit(""))))
      val hits = aug.select(col("doc_id"),
          explode(expr(s"regexp_extract_all(text, '$re', 1)")).as("domain"))
      val byDomain = hits.groupBy(col("domain"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("doc_id")).as("n_docs"))
      val tot = byDomain.agg(sum(col("n_urls")).as("t"))
      byDomain.crossJoin(broadcast(tot))
        .select(col("domain"), col("n_urls"), col("n_docs"),
          expr("(1000 * n_urls) div t").as("url_share_permille"))
    }),

    // §2.9 — tokenizer compression fairness (round 5: Petrov et al.'s
    // observation that a tokenizer's merge table compresses its training
    // language best — per language, alphabetic-word chars per emitted
    // subword under q225's FIXED (English-leaning) merge table, as the
    // exact integer milli-ratio; the multilinguality dashboard behind
    // per-language token-budget costing. Encode runs once per distinct
    // (lang, word) — a ≤|langs|×vocab frame — with counts re-attached by
    // weight; the report is a bounded |langs| rollup
    "q230_compression_ratio" -> ((s, dir) => {
      val chars = expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))")
      val enc = BpeAppliedMerges.foldLeft(chars) { case (acc, (l, r)) =>
        call_function("graft_pair_merge", acc, lit(l), lit(r))
      }
      t(s, dir, "documents")
        .select(col("lang"),
          explode(graft.functions.TextFunctions.tokensWs(col("text")))
            .as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("c"))
        .select(col("lang"), col("c"),
          length(col("word")).cast("long").as("len"),
          size(enc).cast("long").as("ns"))
        .groupBy(col("lang"))
        .agg(sum(col("c")).as("n_words"),
          sum(col("len") * col("c")).as("n_chars"),
          sum(col("ns") * col("c")).as("n_subwords"))
        .withColumn("chars_per_subword_milli",
          expr("(1000 * n_chars) div n_subwords"))
    }),

    // §2.9 — hashing-trick document vectorization (round 5: Weinberger
    // et al.'s feature hashing — the embedding-free sparse doc vector
    // every linear-model curation classifier trains on at corpus scale;
    // token → 256 md5-hex buckets with a ±1 sign bit from the next hex
    // char, feature value = EXACT signed occurrence sum, zero cells
    // dropped for sparsity. One explode + one map-side-combining
    // (doc, bucket) shuffle — no vocabulary state, which is the entire
    // point of the hashing trick at 100 TB vocab cardinalities
    "q224_feature_hashing" -> ((s, dir) => {
      val h = md5(col("tok"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokensWs(col("text")))
            .as("tok"))
        .select(col("doc_id"), substring(h, 1, 2).as("bucket"),
          when(substring(h, 3, 1) < "8", 1L).otherwise(-1L).as("sgn"))
        .groupBy(col("doc_id"), col("bucket"))
        .agg(sum(col("sgn")).as("w"))
        .filter(col("w") =!= 0L)
    }),

    // §2.9 — BPE tokenizer APPLICATION (round 5: the encode side of
    // q83's trainer, the last step a pretraining pipeline runs before
    // writing token shards — apply a FIXED merge table in rank order and
    // report the corpus subword frequencies. Encoding runs on the
    // DISTINCT alphabetic vocabulary (one word-count shuffle, the
    // encode itself is map-side `graft_pair_merge` folds on the
    // vocab-sized frame — never per corpus token), counts re-attach by
    // weight, top-30 by (count desc, subword). The oracle replays the
    // same merges as a leftmost-nonoverlapping replace chain over
    // delimiter-wrapped symbols — proven equivalent to the kernel's
    // single-pass scan — so the codegen'd merge kernel gets a full
    // DuckDB row (q83's training loop stays rows-only by nature)
    "q225_bpe_encode" -> ((s, dir) => {
      val chars = expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))")
      val enc = BpeAppliedMerges.foldLeft(chars) { case (acc, (l, r)) =>
        call_function("graft_pair_merge", acc, lit(l), lit(r))
      }
      t(s, dir, "documents")
        .select(explode(graft.functions.TextFunctions.tokensWs(col("text")))
          .as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .groupBy(col("word")).agg(count(lit(1)).as("c"))
        .select(explode(enc).as("subword"), col("c"))
        .groupBy(col("subword")).agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("subword").asc)
        .limit(30)
    }),

    // §2.9 — PMI collocation mining (round 5): the phrase-discovery pass
    // (tokenizer vocab candidates, NER-free entity hints) — top bigrams
    // by pointwise mutual information over the corpus bigram stream,
    // min-support 5. The PMI RANKING is the exact integer
    // (10⁶·N·c_ab) div (c_a·c_b) — no log, no doubles, so top-20 is
    // hash-stable with an (a, b) tie-break; margins aggregate from the
    // BIGRAM-VOCAB frame (never the corpus), the stream shuffles once
    // on (a, b), and the top-k is a TakeOrdered. 64-bit headroom:
    // 10⁶·N·c_ab needs N·c_ab ≤ 9.2×10¹² (decimal(38) beyond — documented)
    "q222_collocations" -> ((s, dir) => {
      val toks = graft.functions.TextFunctions.tokensWs(col("text"))
      val n = size(toks)
      val stream = t(s, dir, "documents")
        .select(explode(zip_with(
          slice(toks, lit(1), greatest(n - 1, lit(0))),
          slice(toks, lit(2), greatest(n - 1, lit(0))),
          (a, b) => struct(a.as("a"), b.as("b")))).as("bg"))
        .select(col("bg.a").as("a"), col("bg.b").as("b"))
      // vocab-sized frame consumed by totals + both margins + the probe
      val counts = stream.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("c_ab"))
        .localCheckpoint()
      val tot = counts.agg(sum(col("c_ab")).as("nn"))
      val ma = counts.groupBy(col("a")).agg(sum(col("c_ab")).as("c_a"))
      val mb = counts.groupBy(col("b")).agg(sum(col("c_ab")).as("c_b"))
      counts.filter(col("c_ab") >= 5L)
        .join(ma, Seq("a")).join(mb, Seq("b"))
        .crossJoin(broadcast(tot))
        .select(col("a"), col("b"), col("c_ab"),
          expr("(1000000 * nn * c_ab) div (c_a * c_b)").as("pmi_micro"))
        .orderBy(col("pmi_micro").desc, col("a").asc, col("b").asc)
        .limit(20)
    }),

    // §2.9 — token-budget data selection with bounded-frame threshold
    // refinement (round 5): pick the highest-quality docs (lexical
    // diversity permille, min-id tie-break) until a 10k-token budget is
    // spent. The 100 TB shape: a GLOBAL quality-ordered cumsum would be
    // a global sort, so the selection threshold comes from a cumulative
    // window over the BOUNDED ≤1001-bucket quality histogram — full
    // buckets above the cutoff keep everything, and only the single
    // boundary bucket ranks its members (one bucket's worth of window,
    // not the corpus). Output: per-source kept-doc/kept-token totals
    "q219_budget_select" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 10000L
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(graft.functions.TextFunctions.tokensWs(col("text")))
            .cast("long").as("nt"),
          size(array_distinct(
            graft.functions.TextFunctions.tokensWs(col("text"))))
            .cast("long").as("nd"))
        .filter(col("nt") > 0)
        .withColumn("q", expr("(nd * 1000) div nt"))
      // bounded quality histogram, walked from the top
      val hist = docs.groupBy(col("q"))
        .agg(sum(col("nt")).as("bucket_tokens"))
      val hw = Window.orderBy(col("q").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cuts = hist
        .withColumn("cum", sum(col("bucket_tokens")).over(hw))
        .withColumn("prev", col("cum") - col("bucket_tokens"))
        .filter(col("prev") < budget) // buckets with any budget left
        .select(col("q").as("cq"), col("prev"),
          (col("cum") <= budget).as("full_bucket"))
      val tagged = docs.join(broadcast(cuts), col("q") === col("cq"))
      // full buckets NEVER touch a window — they flow map-side straight
      // into the final partial agg; only the single boundary bucket
      // (full_bucket = false survives the cuts filter exactly once)
      // shuffles for its per-doc cumsum
      val full = tagged.filter(col("full_bucket"))
        .select(col("source"), col("nt"))
      val boundaryW = Window.partitionBy(col("q"))
        .orderBy(col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val boundary = tagged.filter(!col("full_bucket"))
        .withColumn("bucket_cum", sum(col("nt")).over(boundaryW))
        .filter(col("prev") + col("bucket_cum") <= budget)
        .select(col("source"), col("nt"))
      full.unionByName(boundary)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    }),

    // §2.9 — per-source quantile normalization of a quality signal
    // (round 5): each doc's lexical diversity maps to its WITHIN-SOURCE
    // percentile rank — the de-biasing step before cross-source quality
    // thresholds (a boilerplate-heavy source would otherwise dominate
    // any global cut). Exact integers: permille = (rank−1)·1000 div
    // (n−1), deterministic (q, doc_id) order, one source-key shuffle
    // shared by the rank and count windows (q73/q74's rank-statistics
    // shape)
    "q220_quality_quantiles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(graft.functions.TextFunctions.tokensWs(col("text")))
            .cast("long").as("nt"),
          size(array_distinct(
            graft.functions.TextFunctions.tokensWs(col("text"))))
            .cast("long").as("nd"))
        .filter(col("nt") > 0)
        .withColumn("q", expr("(nd * 1000) div nt"))
      val rw = Window.partitionBy(col("source"))
        .orderBy(col("q").asc, col("doc_id").asc)
      val cw = Window.partitionBy(col("source"))
      docs
        .withColumn("r", row_number().over(rw).cast("long"))
        .withColumn("n", count(lit(1)).over(cw))
        .select(col("doc_id"), col("source"), col("q"),
          when(col("n") > 1L, expr("((r - 1) * 1000) div (n - 1)"))
            .otherwise(500L).as("pctl_permille"))
    }),

    // §2.9 — Cohen's kappa between two curation signals (round 5): the
    // agreement-beyond-chance audit run before trusting a cheap filter
    // as a proxy for an expensive one — here the length gate (≥20
    // tokens) vs the diversity gate (≥500‰ distinct). kappa =
    // (N·agree − a1·b1 − a0·b0) / (N² − a1·b1 − a0·b0): numerator and
    // denominator are EXACT integers from one aggregate pass (no
    // po/pe doubles), micro-rounded once at the end
    "q221_signal_kappa" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(
          size(graft.functions.TextFunctions.tokensWs(col("text")))
            .cast("long").as("nt"),
          size(array_distinct(
            graft.functions.TextFunctions.tokensWs(col("text"))))
            .cast("long").as("nd"))
        .filter(col("nt") > 0)
        .select((col("nt") >= 20L).as("a"),
          (expr("(nd * 1000) div nt") >= 500L).as("b"))
      docs.agg(
          count(lit(1)).as("n"),
          sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"),
          sum(when(col("a"), 1L).otherwise(0L)).as("a1"),
          sum(when(col("b"), 1L).otherwise(0L)).as("b1"))
        .select(col("n"), col("agree"), col("a1"), col("b1"),
          (col("n") * col("agree") - col("a1") * col("b1")
            - (col("n") - col("a1")) * (col("n") - col("b1"))).as("num"),
          (col("n") * col("n") - col("a1") * col("b1")
            - (col("n") - col("a1")) * (col("n") - col("b1"))).as("den"))
        .withColumn("kappa_micro",
          // den = 0 (a constant signal, pe = 1) leaves kappa undefined:
          // pin 0 on BOTH engines — Spark would cast NaN silently while
          // DuckDB errors on the cast (review finding)
          when(col("den") =!= 0L,
            floor(col("num") * lit(1000000L).cast("double") / col("den")
              + 0.5).cast("long")).otherwise(0L))
    }),

    // §2.9 — bigram-LM surprisal (round 4): conditional next-token
    // surprisal in integer bits, bits(b|a) = bitlen(c(a·)) − bitlen(c(ab))
    // — q99's unigram trick upgraded to a conditional model; dictionary
    // joins are vocab-sized, the stream probes Zipf-head-broadcast
    "q167_bigram_surprisal" -> ((s, dir) =>
      TextAnalysis.bigramSurprisal(t(s, dir, "documents"))),

    // §2.9 — Heaps-law vocabulary growth at doc-ordered checkpoints:
    // is more data still adding new words? Bucket width bounds the
    // cumulative-window frame (checkpoint count, not corpus size)
    "q168_vocab_growth" -> ((s, dir) =>
      TextAnalysis.vocabGrowth(t(s, dir, "documents"), 50L)),

    // §2.9 — per-source lexical diversity: type-token + hapax ratios as
    // exact integer ppm — the template-feed vs natural-text screen
    "q169_lexical_diversity" -> ((s, dir) =>
      TextAnalysis.lexicalDiversity(t(s, dir, "documents"))),

    // §2.9 — sparse TF-IDF cosine pairs via the inverted index (round 4):
    // weighted relatedness without embeddings; exact-integer weights/dot/
    // norms, doubles only in the final sqrt-division; df cap bounds the
    // posting-list fan-out (the stopword cut)
    "q171_tfidf_pairs" -> ((s, dir) =>
      Retrieval.tfidfCosinePairs(t(s, dir, "documents"), dfCap = 50,
        minCos = 0.6)),

    // §2.9 — per-document TF-IDF keyword extraction (round 4): top-3
    // terms per doc by exact-integer weight (q171's centi-idf), ranked
    // by a doc-partitioned window — fully parallel at any scale, no
    // global anything
    "q176_keywords" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val tf = docs.select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokensWs(col("text")))
            .as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val w = tf.join(df, Seq("token"))
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
        .select(col("doc_id"), col("token"),
          (col("tf") * expr("(100 * n) div df")).as("w"))
      w.withColumn("rank", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("w").desc, col("token").asc)).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("token"), col("w"), col("rank"))
    }),

    // §2.9 — training-mix token budget by largest-remainder (Hamilton)
    // apportionment: quotas and remainders are exact integers over the
    // 20-row per-source aggregate; the unpartitioned rank runs on that
    // aggregated frame only (q82's documented shape), never on docs
    "q114_mix_allocation" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 1000000L
      // localCheckpoint: the 20-row aggregate is consumed three times
      // (total, base/rem, given) — without it each reuse re-scans and
      // re-tokenizes the whole corpus
      val bySrc = t(s, dir, "documents")
        .select(col("source"),
          size(graft.functions.TextFunctions.tokensWs(col("text")))
            .cast("long").as("n"))
        .groupBy(col("source")).agg(sum(col("n")).as("w"))
        .localCheckpoint()
      val withTot = bySrc.crossJoin(broadcast(bySrc.agg(sum(col("w")).as("tot"))))
        .withColumn("base", expr(s"($budget * w) div tot"))
        .withColumn("rem", expr(s"($budget * w) % tot"))
      val withExtra = withTot.crossJoin(
        broadcast(withTot.agg(sum(col("base")).as("given"))))
      withExtra.select(col("source"), col("w"),
        (col("base") + when(
          row_number().over(Window.orderBy(col("rem").desc, col("source").asc))
            .cast("long") <= lit(budget) - col("given"), 1L).otherwise(0L))
          .as("alloc"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // the k-round merge recursion, unrolled (see bpeTrainOracleSql)
    "q83_bpe_merges" -> bpeTrainOracleSql(8),

    "q323_epoch_plan" ->
      s"""WITH u AS (
         |  SELECT source, CAST(sum(len($ToksSql)) AS BIGINT) AS unique_tokens
         |  FROM documents GROUP BY 1),
         |tot AS (SELECT CAST(sum(unique_tokens) AS BIGINT) * 4 AS budget,
         |               CAST(count(*) AS BIGINT) AS ns FROM u)
         |SELECT source, unique_tokens,
         |       budget // ns AS requested_tokens,
         |       (1000 * (budget // ns)) // unique_tokens AS epochs_milli,
         |       least(budget // ns, 6 * unique_tokens) AS granted_tokens,
         |       greatest(0, budget // ns - 6 * unique_tokens)
         |         AS shortfall_tokens
         |FROM u, tot""".stripMargin,

    "q14_token_stats" ->
      s"""SELECT doc_id,
         |       len($ToksSql) AS n_tokens_ws,
         |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_tokens_bpe,
         |       length(text) AS n_chars
         |FROM documents""".stripMargin,

    "q15_quality_score" ->
      s"""WITH x AS (
         |  SELECT doc_id,
         |         CAST(len($ToksSql) AS DOUBLE) AS n_tokens,
         |         CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |         CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
         |           / length(text) END AS punct_ratio,
         |         CASE WHEN len($ToksSql) = 0 THEN 0.0 ELSE
         |         CAST(len(list_filter($ToksSql,
         |              x -> list_contains(['the','a','of','to','in','is','and'], x))) AS DOUBLE)
         |           / len($ToksSql) END AS stopword_ratio
         |  FROM documents)
         |SELECT doc_id, n_tokens, punct_ratio, stopword_ratio,
         |       least(n_tokens / 100.0, 1.0) * (1.0 - punct_ratio)
         |         * (0.5 + stopword_ratio) AS quality_score
         |FROM x""".stripMargin,

    "q16_lang_id" ->
      s"""WITH x AS (
         |  SELECT doc_id, lang,
         |         len(list_filter($ToksSql, x -> list_contains(['the','a','is','and','of'], x))) AS score_en,
         |         len(list_filter($ToksSql, x -> list_contains(['der','die','das','und','ist'], x))) AS score_de,
         |         len(list_filter($ToksSql, x -> list_contains(['el','los','es','y','que'], x))) AS score_es,
         |         len(list_filter($ToksSql, x -> list_contains(['le','les','est','et','une'], x))) AS score_fr,
         |         len(list_filter($ToksSql, x -> list_contains(['de','shi','le','bu','wo'], x))) AS score_zh
         |  FROM documents)
         |SELECT doc_id, lang, score_en, score_de, score_es, score_fr, score_zh,
         |  CASE
         |    WHEN score_en > 0 AND score_en >= score_de AND score_en >= score_es AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
         |    WHEN score_de > 0 AND score_de > score_en AND score_de >= score_es AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
         |    WHEN score_es > 0 AND score_es > score_en AND score_es > score_de AND score_es >= score_fr AND score_es >= score_zh THEN 'es'
         |    WHEN score_fr > 0 AND score_fr > score_en AND score_fr > score_de AND score_fr > score_es AND score_fr >= score_zh THEN 'fr'
         |    WHEN score_zh > 0 AND score_zh > score_en AND score_zh > score_de AND score_zh > score_es AND score_zh > score_fr THEN 'zh'
         |    ELSE 'unknown' END AS guessed_lang
         |FROM x""".stripMargin,

    "q17_fingerprint" ->
      s"""SELECT doc_id, fp,
         |       CAST(row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS BIGINT) AS dup_rank
         |FROM (SELECT doc_id, md5($NormSql) AS fp FROM documents)""".stripMargin,

    "q34_content_sample" ->
      s"""SELECT doc_id, fp FROM (
         |  SELECT doc_id, md5($NormSql) AS fp FROM documents)
         |WHERE substr(fp, 1, 1) IN ('0', '1', '2', '3')""".stripMargin,

    "q35_curation_pipeline" ->
      s"""WITH f AS (
         |  SELECT doc_id, lang,
         |         CAST(len($ToksSql) AS BIGINT) AS n_tokens,
         |         md5($NormSql) AS fp
         |  FROM documents
         |  WHERE CAST(len($ToksSql) AS BIGINT) BETWEEN 10 AND 200
         |    AND CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
         |          / length(text) < 0.10),
         |d AS (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |      FROM f)
         |SELECT doc_id, lang, n_tokens, fp
         |FROM d
         |WHERE rn = 1 AND substr(fp, 1, 1) IN ('0','1','2','3','4','5','6','7')""".stripMargin,

    "q36_vocab_topk" ->
      s"""SELECT token, count(*) AS n_occurrences
         |FROM (SELECT unnest($ToksSql) AS token FROM documents)
         |GROUP BY 1
         |ORDER BY n_occurrences DESC, token ASC
         |LIMIT 100""".stripMargin,

    "q54_token_corpus_stats" ->
      s"""SELECT token, CAST(sum(n) AS BIGINT) AS tf,
         |       CAST(count(*) AS BIGINT) AS df
         |FROM (
         |  SELECT token, doc_id, count(*) AS n
         |  FROM (SELECT doc_id, unnest($ToksSql) AS token FROM documents)
         |  GROUP BY 1, 2)
         |GROUP BY 1
         |ORDER BY tf DESC, token ASC
         |LIMIT 100""".stripMargin,

    "q56_pii_scrub" ->
      s"""WITH aug AS (
         |  SELECT doc_id,
         |         text || CASE WHEN doc_id % 7 = 0
         |           THEN ' contact user' || CAST(doc_id AS VARCHAR)
         |                || '@example.com or +1-555-123-4567'
         |           ELSE '' END AS text
         |  FROM documents)
         |SELECT doc_id,
         |       regexp_replace(regexp_replace(text,
         |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
         |         '<EMAIL>', 'g'),
         |         '\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}',
         |         '<PHONE>', 'g') AS scrubbed,
         |       CAST(len(regexp_extract_all(text,
         |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
         |         AS BIGINT) AS n_emails,
         |       CAST(len(regexp_extract_all(text,
         |         '\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}'))
         |         AS BIGINT) AS n_phones
         |FROM aug""".stripMargin,

    "q57_repetition_score" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         list_filter(string_split(text, chr(10)), x -> x != '') AS lns,
         |         $ToksSql AS tk
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, lns, tk,
         |         CASE WHEN len(tk) >= 3 THEN
         |           [array_to_string(tk[i:i+2], ' ')
         |            for i in range(1, CAST(len(tk) AS BIGINT) - 1)]
         |         ELSE [] END AS tris
         |  FROM t)
         |SELECT doc_id,
         |  CASE WHEN len(lns) > 0 THEN
         |    CAST(len(lns) - len(list_distinct(lns)) AS DOUBLE) / len(lns)
         |  ELSE 0.0 END AS dup_line_frac,
         |  CASE WHEN len(tk) > 0 THEN
         |    CAST(len(tk) - len(list_distinct(tk)) AS DOUBLE) / len(tk)
         |  ELSE 0.0 END AS dup_token_frac,
         |  CASE WHEN len(tris) > 0 THEN
         |    CAST(len(tris) - len(list_distinct(tris)) AS DOUBLE) / len(tris)
         |  ELSE 0.0 END AS dup_trigram_frac
         |FROM g""".stripMargin,

    "q59_sequence_pack" ->
      s"""SELECT doc_id, lang,
         |       CAST(len($ToksSql) AS BIGINT) AS n_tokens,
         |       CAST((SUM(CAST(len($ToksSql) AS BIGINT))
         |          OVER (PARTITION BY lang ORDER BY doc_id)
         |        - CAST(len($ToksSql) AS BIGINT)) // 256 AS BIGINT) AS pack_id,
         |       CAST((SUM(CAST(len($ToksSql) AS BIGINT))
         |          OVER (PARTITION BY lang ORDER BY doc_id)
         |        - CAST(len($ToksSql) AS BIGINT)) % 256 AS BIGINT) AS pack_offset
         |FROM documents""".stripMargin,

    "q48_stratified_sample" ->
      s"""WITH x AS (
         |  SELECT lang,
         |         (strpos('0123456789abcdef', substr(md5($NormSql), 1, 1)) - 1) * 16
         |           + strpos('0123456789abcdef', substr(md5($NormSql), 2, 1)) - 1 AS bucket
         |  FROM documents)
         |SELECT lang, count(*) AS n_sampled
         |FROM x
         |WHERE (lang = 'en' AND bucket < 128) OR (lang <> 'en' AND bucket < 32)
         |GROUP BY 1""".stripMargin,

    "q60_train_split" ->
      s"""WITH x AS (
         |  SELECT doc_id, lang,
         |         (strpos('0123456789abcdef', substr(md5($NormSql), 1, 1)) - 1) * 16
         |           + strpos('0123456789abcdef', substr(md5($NormSql), 2, 1)) - 1 AS bucket
         |  FROM documents)
         |SELECT doc_id, lang,
         |       CASE WHEN bucket < 13 THEN 'test'
         |            WHEN bucket < 38 THEN 'val'
         |            ELSE 'train' END AS split
         |FROM x""".stripMargin,

    "q61_doc_chunks" ->
      """WITH offs AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(0, greatest(length(text) - 1, 0), 96)) AS i
        |  FROM documents)
        |SELECT doc_id, CAST(i // 96 AS BIGINT) AS chunk_id,
        |       substr(text, CAST(i AS INT) + 1, 128) AS chunk,
        |       length(substr(text, CAST(i AS INT) + 1, 128)) AS chunk_len
        |FROM offs""".stripMargin,

    "q62_length_trim" ->
      """WITH th AS (
        |  SELECT lang,
        |         percentile_disc(0.05) WITHIN GROUP (ORDER BY n_chars) AS lo,
        |         percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars) AS hi
        |  FROM documents GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.n_chars
        |FROM documents d JOIN th ON d.lang = th.lang
        |WHERE d.n_chars BETWEEN th.lo AND th.hi""".stripMargin,

    "q70_token_windows" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |o AS (SELECT doc_id, toks,
        |        unnest(generate_series(0, greatest(len(toks) - 1, 0), 48)) AS i
        |      FROM t)
        |SELECT doc_id, CAST(i // 48 AS BIGINT) AS window_id,
        |       COALESCE(array_to_string(list_slice(toks, CAST(i + 1 AS INT), CAST(i + 64 AS INT)), ' '), '') AS window_text,
        |       CAST(len(list_slice(toks, CAST(i + 1 AS INT), CAST(i + 64 AS INT))) AS BIGINT) AS n_tokens
        |FROM o""".stripMargin,

    "q71_balanced_sample" ->
      s"""WITH x AS (SELECT doc_id, lang, md5($NormSql) AS fp FROM documents),
         |r AS (SELECT *, row_number() OVER (PARTITION BY lang
         |                                   ORDER BY fp, doc_id) AS rn
         |      FROM x)
         |SELECT doc_id, lang, fp FROM r WHERE rn <= 40""".stripMargin,

    "q75_cooccurrence" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_sort(list_distinct(list_filter(string_split(text, ' '),
        |                                             x -> x <> ''))) AS toks
        |  FROM documents),
        |u AS (SELECT doc_id, unnest(toks) AS tok FROM t)
        |SELECT a.tok AS t1, b.tok AS t2, count(*) AS n_docs
        |FROM u a JOIN u b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |GROUP BY 1, 2 ORDER BY n_docs DESC, t1, t2 LIMIT 50""".stripMargin,

    "q77_temperature_resample" ->
      """WITH f AS (SELECT doc_id, lang,
        |                  CASE WHEN lang = 'en' THEN 1 ELSE 3 END AS factor
        |           FROM documents)
        |SELECT doc_id, lang,
        |       CAST(unnest(generate_series(1, factor)) AS BIGINT) AS copy_id
        |FROM f""".stripMargin,

    "q81_terms_search" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        |  FROM documents)
        |SELECT doc_id, count(*) AS n_matched
        |FROM toks WHERE tok IN ('table', 'row', 'value')
        |GROUP BY doc_id HAVING count(*) = 3""".stripMargin,

    "q92_source_mix" ->
      """WITH per AS (
        |  SELECT source, count(*) AS n_docs,
        |         CAST(sum(len(list_filter(string_split(text, ' '),
        |                                  x -> x <> ''))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1)
        |SELECT source, n_docs, n_tokens,
        |       CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS token_share,
        |       CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () - 0.05 AS drift
        |FROM per""".stripMargin,

    "q93_curation_funnel" ->
      """WITH x AS (
        |  SELECT len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok,
        |         CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
        |           / length(text) AS punct
        |  FROM documents)
        |SELECT count(*) AS n_total,
        |       count(CASE WHEN n_tok BETWEEN 5 AND 1000 THEN 1 END) AS n_len_ok,
        |       count(CASE WHEN n_tok BETWEEN 5 AND 1000 AND punct < 0.10
        |             THEN 1 END) AS n_punct_ok
        |FROM x""".stripMargin,

    "q95_segment_dedup" ->
      s"""$SegCte,
         |kept AS (
         |  SELECT doc_id, seg_idx, seg FROM (
         |    SELECT doc_id, seg_idx, seg,
         |           row_number() OVER (PARTITION BY seg
         |                              ORDER BY doc_id, seg_idx) AS rn
         |    FROM segs) WHERE rn = 1),
         |re AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |         string_agg(seg, ' ' ORDER BY seg_idx) AS dedup_text
         |  FROM kept GROUP BY doc_id),
         |tot AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs
         |  FROM segs GROUP BY doc_id)
         |SELECT tot.doc_id, n_segs,
         |       COALESCE(n_kept, 0) AS n_kept,
         |       COALESCE(dedup_text, '') AS dedup_text
         |FROM tot LEFT JOIN re ON tot.doc_id = re.doc_id""".stripMargin,

    "q96_boilerplate_strip" ->
      s"""$SegCte,
         |boiler AS (
         |  SELECT seg FROM segs GROUP BY seg
         |  HAVING count(DISTINCT doc_id) >= 3)
         |SELECT s.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_segs,
         |       CAST(count(CASE WHEN b.seg IS NOT NULL THEN 1 END) AS BIGINT)
         |         AS n_boiler,
         |       COALESCE(string_agg(CASE WHEN b.seg IS NULL THEN s.seg END,
         |                           ' ' ORDER BY s.seg_idx), '') AS clean_text
         |FROM segs s LEFT JOIN boiler b ON s.seg = b.seg
         |GROUP BY s.doc_id""".stripMargin,

    "q99_unigram_surprisal" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest($ToksSql) AS token FROM documents),
         |c AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY 1),
         |v AS (SELECT token FROM c ORDER BY c DESC, token ASC LIMIT 200),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM t)
         |SELECT t.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_toks,
         |       CAST(count(*) FILTER (WHERE v.token IS NULL) AS BIGINT) AS n_oov,
         |       CAST(sum(length(format('{:b}', n.n_total))
         |                - length(format('{:b}', c.c))) AS BIGINT) AS surprisal_bits,
         |       CAST(sum(length(format('{:b}', n.n_total))
         |                - length(format('{:b}', c.c))) AS DOUBLE)
         |         / count(*) AS avg_bits
         |FROM t JOIN c USING (token) LEFT JOIN v ON t.token = v.token
         |     CROSS JOIN n
         |GROUP BY 1""".stripMargin,

    "q102_ngram_novelty" ->
      s"""WITH nrm AS (
         |  SELECT doc_id, $NormSql AS ntext FROM documents),
         |tok AS (
         |  SELECT doc_id,
         |         list_filter(string_split(ntext, ' '), x -> x != '') AS tk
         |  FROM nrm),
         |g AS (
         |  SELECT doc_id, unnest(
         |    CASE WHEN len(tk) >= 3 THEN list_distinct(
         |      [array_to_string(tk[i:i+2], ' ')
         |       for i in range(1, CAST(len(tk) AS BIGINT) - 1)])
         |    ELSE [] END) AS gram
         |  FROM tok),
         |df AS (SELECT gram, count(*) AS df FROM g GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |       CAST(count(*) FILTER (WHERE df.df >= 2) AS BIGINT) AS n_shared,
         |       CAST(count(*) FILTER (WHERE df.df >= 2) AS DOUBLE)
         |         / count(*) AS shared_frac
         |FROM g JOIN df USING (gram)
         |GROUP BY 1""".stripMargin,

    "q108_user_sequences" ->
      """WITH o AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       array_to_string(list(event_type ORDER BY rn)
        |                       FILTER (WHERE rn <= 50), '>') AS seq_str
        |FROM o GROUP BY 1""".stripMargin,

    "q109_bm25_topk" -> bm25OracleSql(Bm25Terms),

    "q112_type_concentration" ->
      """WITH c AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_t
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(n_t) AS BIGINT) AS n_events,
        |       CAST(CAST(sum(n_t * n_t) AS BIGINT) AS DOUBLE)
        |         / (CAST(sum(n_t) AS BIGINT) * CAST(sum(n_t) AS BIGINT)) AS hhi
        |FROM c GROUP BY 1""".stripMargin,

    "q135_first_seen_curve" ->
      """WITH fs AS (
        |  SELECT l_partkey, CAST(min(l_shipdate) AS DATE) AS first_day
        |  FROM lineitem GROUP BY 1),
        |d AS (
        |  SELECT first_day, CAST(count(*) AS BIGINT) AS n_new_parts
        |  FROM fs GROUP BY 1)
        |SELECT first_day, n_new_parts,
        |       CAST(sum(n_new_parts) OVER (ORDER BY first_day
        |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_parts
        |FROM d""".stripMargin,

    "q140_vocab_coverage" ->
      s"""WITH tok AS (
         |  SELECT unnest($ToksSql) AS token FROM documents),
         |v AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY 1),
         |top AS (
         |  SELECT tf FROM v ORDER BY tf DESC, token LIMIT 1000)
         |SELECT CAST(1000 AS BIGINT) AS vocab_k,
         |       (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_vocab,
         |       (SELECT CAST(sum(tf) AS BIGINT) FROM v) AS total,
         |       (SELECT CAST(sum(tf) AS BIGINT) FROM top) AS covered,
         |       ((SELECT CAST(sum(tf) AS BIGINT) FROM top) * 1000000)
         |         // (SELECT CAST(sum(tf) AS BIGINT) FROM v)
         |         AS coverage_micro""".stripMargin,

    "q144_dsir_select" ->
      s"""WITH tk AS (
         |  SELECT doc_id, lang = 'en' AS is_t, $ToksSql AS t
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id, is_t,
         |         unnest([t[x] || ' ' || t[x+1]
         |                 for x in range(1, len(t))]) AS b
         |  FROM tk),
         |f AS (SELECT doc_id, is_t, substr(md5(b), 1, 2) AS bucket FROM bg),
         |bs AS (
         |  SELECT bucket, CAST(count(*) AS BIGINT) AS cnt_raw,
         |         CAST(count(*) FILTER (WHERE is_t) AS BIGINT) AS cnt_t
         |  FROM f GROUP BY 1),
         |tt AS (SELECT CAST(sum(cnt_raw) AS BIGINT) AS n_raw,
         |              CAST(sum(cnt_t) AS BIGINT) AS n_t FROM bs),
         |fl AS (SELECT bucket, cnt_t * tt.n_raw > cnt_raw * tt.n_t AS enr
         |       FROM bs, tt)
         |SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feat,
         |       CAST(count(*) FILTER (WHERE fl.enr) AS BIGINT) AS n_enr,
         |       CAST(2 * count(*) FILTER (WHERE fl.enr) - count(*)
         |            AS BIGINT) AS score
         |FROM f JOIN fl USING (bucket) GROUP BY 1""".stripMargin,

    "q145_weighted_sample" ->
      """WITH tk AS (
        |  SELECT doc_id, n_chars AS w,
        |         md5(CAST(doc_id AS VARCHAR) || ':' ||
        |             CAST(unnest(generate_series(1, n_chars)) AS VARCHAR))
        |           AS tkt
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, CAST(w AS BIGINT) AS w, min(tkt) AS min_ticket
        |FROM tk GROUP BY 1, 2
        |ORDER BY 3 LIMIT 20""".stripMargin,

    "q149_phrase_search" ->
      s"""WITH tk AS (SELECT doc_id, $ToksSql AS t FROM documents),
         |pos AS (
         |  SELECT doc_id, unnest(t) AS tok,
         |         unnest(generate_series(0, len(t) - 1)) AS pos
         |  FROM tk),
         |em AS (
         |  SELECT doc_id, pos - i AS st
         |  FROM pos JOIN (VALUES (0, 'table'), (1, 'scan')) v(i, term)
         |    ON tok = term
         |  WHERE pos - i >= 0),
         |m AS (SELECT doc_id, st, count(*) AS c FROM em GROUP BY 1, 2)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
         |       CAST(min(st) AS BIGINT) AS first_pos
         |FROM m WHERE c = 2 GROUP BY 1""".stripMargin,

    "q201_source_drift_tv" ->
      """WITH cells AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
        |       FROM documents GROUP BY 1),
        |lt AS (SELECT lang, CAST(count(*) AS BIGINT) AS cl
        |       FROM documents GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |dense AS (
        |  SELECT st.source, lt.lang, st.n_s, lt.cl,
        |         coalesce(c, 0) AS c
        |  FROM st CROSS JOIN lt
        |  LEFT JOIN cells ON cells.source = st.source AND cells.lang = lt.lang)
        |SELECT source,
        |       CAST(max(n_s) AS BIGINT) AS n_docs,
        |       (500000 * CAST(sum(abs(c * n.n - cl * n_s)) AS BIGINT))
        |         // (max(n_s) * max(n.n)) AS tv_micro
        |FROM dense, n
        |GROUP BY 1""".stripMargin,

    "q203_quality_tradeoff" ->
      s"""WITH x AS (
         |  SELECT doc_id,
         |         CAST(len($ToksSql) AS DOUBLE) AS n_tokens,
         |         CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |         CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
         |           / length(text) END AS punct_ratio,
         |         CASE WHEN len($ToksSql) = 0 THEN 0.0 ELSE
         |         CAST(len(list_filter($ToksSql,
         |              x -> list_contains(['the','a','of','to','in','is','and'], x))) AS DOUBLE)
         |           / len($ToksSql) END AS stopword_ratio
         |  FROM documents),
         |scored AS (
         |  SELECT CAST(floor(least(n_tokens / 100.0, 1.0) * (1.0 - punct_ratio)
         |           * (0.5 + stopword_ratio) * 10) AS BIGINT) AS band,
         |         CAST(n_tokens AS BIGINT) AS toks
         |  FROM x),
         |bands AS (
         |  SELECT band, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(toks) AS BIGINT) AS n_tokens
         |  FROM scored GROUP BY 1)
         |SELECT band, n_docs, n_tokens,
         |       CAST(sum(n_docs) OVER (ORDER BY band DESC
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |         AS surv_docs,
         |       CAST(sum(n_tokens) OVER (ORDER BY band DESC
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |         AS surv_tokens
         |FROM bands""".stripMargin,

    "q213_stratified_kfold" ->
      """SELECT lang, fold, CAST(count(*) AS BIGINT) AS n_docs
        |FROM (
        |  SELECT lang,
        |         (CAST(row_number() OVER (PARTITION BY lang
        |            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
        |            AS BIGINT) - 1) % 5 AS fold
        |  FROM documents)
        |GROUP BY 1, 2""".stripMargin,

    "q240_nutrition_label" ->
      s"""WITH base AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(len($ToksSql)) AS BIGINT) AS n_tokens,
         |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |         CAST(sum(n_chars) AS BIGINT) AS n_chars
         |  FROM documents),
         |keep AS (
         |  SELECT CAST(count(DISTINCT md5($NormSql)) AS BIGINT) AS n_unique
         |  FROM documents),
         |m AS (
         |  SELECT 'docs' AS metric, n_docs AS value FROM base
         |  UNION ALL SELECT 'tokens', n_tokens FROM base
         |  UNION ALL SELECT 'languages', n_langs FROM base
         |  UNION ALL SELECT 'sources', n_sources FROM base
         |  UNION ALL SELECT 'chars', n_chars FROM base
         |  UNION ALL SELECT 'exact_dup_docs', base.n_docs - keep.n_unique
         |            FROM base, keep
         |  UNION ALL SELECT 'dup_permille',
         |            (1000 * (base.n_docs - keep.n_unique)) // base.n_docs
         |            FROM base, keep)
         |SELECT metric, value FROM m""".stripMargin,

    "q246_nb_confusion" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source, unnest($ToksSql) AS token FROM documents),
         |cst AS (
         |  SELECT token, source AS cls, CAST(count(*) AS BIGINT) AS c
         |  FROM toks GROUP BY 1, 2),
         |totals AS (SELECT cls, CAST(sum(c) AS BIGINT) AS t_s
         |           FROM cst GROUP BY 1),
         |vocab AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v
         |          FROM cst),
         |clsbits AS (
         |  SELECT cls,
         |         CAST(length(format('{:b}', t_s + v)) - 1 AS BIGINT)
         |           AS base_bits
         |  FROM totals CROSS JOIN vocab),
         |adj AS (
         |  SELECT t.doc_id, c.cls,
         |         CAST(sum(length(format('{:b}', c.c + 1)) - 1) AS BIGINT)
         |           AS adj
         |  FROM toks t JOIN cst c ON t.token = c.token
         |  GROUP BY 1, 2),
         |docframe AS (
         |  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_toks
         |  FROM toks GROUP BY 1, 2),
         |scored AS (
         |  SELECT d.doc_id, d.source, b.cls,
         |         d.n_toks * b.base_bits - COALESCE(a.adj, 0) AS score_bits
         |  FROM docframe d CROSS JOIN clsbits b
         |  LEFT JOIN adj a ON d.doc_id = a.doc_id AND b.cls = a.cls),
         |pred AS (
         |  SELECT doc_id, source, cls,
         |         row_number() OVER (PARTITION BY doc_id
         |           ORDER BY score_bits ASC, cls ASC) AS rk
         |  FROM scored)
         |SELECT source AS true_source, cls AS pred_source,
         |       CAST(count(*) AS BIGINT) AS n_docs
         |FROM pred WHERE rk = 1 GROUP BY 1, 2""".stripMargin,

    "q249_canary_scan" ->
      """WITH c AS (
        |  SELECT unnest(['fast table', 'scan slow', 'window table',
        |                 'zebra quantum']) AS canary)
        |SELECT canary,
        |       CAST(count(*) FILTER (WHERE instr(text, canary) > 0)
        |         AS BIGINT) AS n_docs,
        |       CAST(sum((length(text) - length(replace(text, canary, '')))
        |         // length(canary)) AS BIGINT) AS n_occurrences
        |FROM documents CROSS JOIN c
        |GROUP BY 1""".stripMargin,

    "q254_threshold_sweep" ->
      s"""WITH d AS (
         |  SELECT n_chars,
         |         CAST(len($ToksSql) AS BIGINT) AS n_toks,
         |         CAST(len(list_distinct($ToksSql)) AS BIGINT) AS n_uniq
         |  FROM documents),
         |sc AS (
         |  SELECT n_chars, n_toks, (1000 * n_uniq) // n_toks AS score_pm
         |  FROM d WHERE n_toks > 0),
         |th AS (
         |  SELECT CAST(unnest(generate_series(0, 9)) * 100 AS BIGINT)
         |    AS threshold_pm)
         |SELECT threshold_pm,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |       CAST(sum(n_chars) AS BIGINT) // CAST(count(*) AS BIGINT)
         |         AS mean_chars
         |FROM sc CROSS JOIN th
         |WHERE score_pm >= threshold_pm
         |GROUP BY 1""".stripMargin,

    "q311_lang_purity" ->
      """WITH cell AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |r AS (
        |  SELECT source, lang, c,
        |         CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n_s,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY c DESC, lang ASC) AS rk
        |  FROM cell)
        |SELECT source, lang AS dominant_lang, n_s AS n_docs,
        |       (1000 * c) // n_s AS purity_permille
        |FROM r WHERE rk = 1""".stripMargin,

    "q300_release_gate" ->
      s"""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
         |dup AS (
         |  SELECT 'dup_permille' AS "check",
         |         (1000 * (nd.nd - u.uniq)) // nd.nd AS value
         |  FROM nd, (SELECT CAST(count(DISTINCT md5($NormSql)) AS BIGINT)
         |            AS uniq FROM documents) u),
         |can AS (
         |  SELECT 'canary_hit_docs' AS "check",
         |         CAST(count(*) FILTER (WHERE instr(text, 'fast table') > 0)
         |           + count(*) FILTER (WHERE instr(text, 'zebra quantum') > 0)
         |           AS BIGINT) AS value
         |  FROM documents),
         |bys AS (
         |  SELECT source, CAST(sum(len($ToksSql)) AS BIGINT) AS c
         |  FROM documents GROUP BY 1),
         |bt AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM bys),
         |eff AS (
         |  SELECT 'eff_sources_milli' AS "check",
         |         1000000000000000 // CAST(sum(((1000000 * c) // total)
         |           * ((1000000 * c) // total)) AS BIGINT) AS value
         |  FROM bys CROSS JOIN bt),
         |sg AS (
         |  SELECT md5(list_aggregate(list_transform(($ToksSql)[1:10],
         |           t -> CAST(length(t) AS VARCHAR)), 'string_agg', ','))
         |           AS sig
         |  FROM documents),
         |tm AS (
         |  SELECT 'template_mass_permille' AS "check",
         |         (1000 * COALESCE((SELECT CAST(sum(k) AS BIGINT) FROM (
         |            SELECT count(*) AS k FROM sg GROUP BY sig
         |            HAVING count(*) >= 2)), 0)) // nd.nd AS value
         |  FROM nd),
         |allrows AS (
         |  SELECT * FROM dup UNION ALL SELECT * FROM can
         |  UNION ALL SELECT * FROM eff UNION ALL SELECT * FROM tm)
         |SELECT "check", value,
         |       CASE "check"
         |         WHEN 'dup_permille' THEN value < 200
         |         WHEN 'canary_hit_docs' THEN value = 0
         |         WHEN 'eff_sources_milli' THEN value >= 2000
         |         ELSE value < 250
         |       END AS pass
         |FROM allrows""".stripMargin,

    "q295_effective_vocab" ->
      s"""WITH v AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT unnest($ToksSql) AS token FROM documents)
         |  GROUP BY 1),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_types,
         |         CAST(sum(tf) AS BIGINT) AS total,
         |         CAST(sum(tf * tf) AS BIGINT) AS sq
         |  FROM v)
         |SELECT n_types, total,
         |       (total * total // sq) * 1000
         |         + ((total * total % sq) * 1000) // sq AS eff_vocab_milli
         |FROM m""".stripMargin,

    "q285_zipf_curve" ->
      s"""WITH vocab AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT unnest($ToksSql) AS token FROM documents)
         |  GROUP BY 1),
         |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM vocab),
         |r AS (
         |  SELECT token, tf,
         |         CAST(row_number() OVER (ORDER BY tf DESC, token ASC)
         |           AS BIGINT) AS rank
         |  FROM vocab)
         |SELECT rank, token, tf, tf * rank AS freq_rank_product,
         |       (1000000 * tf) // total AS share_ppm
         |FROM r CROSS JOIN tot WHERE rank <= 50""".stripMargin,

    "q286_effective_sources" ->
      s"""WITH bys AS (
         |  SELECT source, CAST(sum(len($ToksSql)) AS BIGINT) AS c
         |  FROM documents GROUP BY 1),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total,
         |               CAST(count(*) AS BIGINT) AS n_sources FROM bys)
         |SELECT n_sources, total,
         |       1000000000000000 // CAST(sum(((1000000 * c) // total)
         |         * ((1000000 * c) // total)) AS BIGINT)
         |         AS eff_sources_milli
         |FROM bys CROSS JOIN tot
         |GROUP BY 1, 2""".stripMargin,

    "q284_term_burstiness" ->
      s"""WITH td AS (
         |  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf_doc
         |  FROM (SELECT doc_id, unnest($ToksSql) AS token FROM documents)
         |  GROUP BY 1, 2),
         |agg AS (
         |  SELECT token, CAST(sum(tf_doc) AS BIGINT) AS tf,
         |         CAST(count(*) AS BIGINT) AS df
         |  FROM td GROUP BY 1)
         |SELECT token, tf, df, (1000 * tf) // df AS burstiness_milli
         |FROM agg WHERE df >= 5
         |ORDER BY burstiness_milli DESC, token ASC
         |LIMIT 30""".stripMargin,

    "q280_template_clusters" ->
      s"""WITH sig AS (
         |  SELECT doc_id,
         |         md5(COALESCE(list_aggregate(list_transform(($ToksSql)[1:10],
         |           t -> CAST(length(t) AS VARCHAR)), 'string_agg', ','), ''))
         |           AS sig
         |  FROM documents)
         |SELECT sig, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(min(doc_id) AS BIGINT) AS exemplar
         |FROM sig GROUP BY 1 HAVING count(*) >= 2""".stripMargin,

    "q276_index_coincidence" ->
      """WITH cc AS (
        |  SELECT source, ch, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(string_split(text, '')) AS ch
        |        FROM documents)
        |  WHERE ch != '' GROUP BY 1, 2),
        |agg AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |         CAST(sum(c * (c - 1)) AS BIGINT) AS coincidences
        |  FROM cc GROUP BY 1)
        |SELECT source, n, coincidences,
        |       CAST(coincidences AS DOUBLE)
        |         / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS ic
        |FROM agg""".stripMargin,

    "q264_char_entropy" ->
      """WITH cc AS (
        |  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
        |        FROM documents)
        |  WHERE ch != '' GROUP BY 1, 2),
        |w AS (
        |  SELECT doc_id, ch, c,
        |         CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
        |  FROM cc)
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chars,
        |       CAST(count(*) AS BIGINT) AS n_distinct_chars,
        |       CAST(sum(c * (length(format('{:b}', n))
        |         - length(format('{:b}', c)))) AS BIGINT) AS entropy_bits_x,
        |       (1000 * CAST(sum(c * (length(format('{:b}', n))
        |         - length(format('{:b}', c)))) AS BIGINT))
        |         // CAST(max(n) AS BIGINT) AS millibits_per_char
        |FROM w GROUP BY 1""".stripMargin,

    "q260_langid_confusion" ->
      s"""WITH x AS (
         |  SELECT doc_id, lang,
         |         len(list_filter($ToksSql, x -> list_contains(['the','a','is','and','of'], x))) AS score_en,
         |         len(list_filter($ToksSql, x -> list_contains(['der','die','das','und','ist'], x))) AS score_de,
         |         len(list_filter($ToksSql, x -> list_contains(['el','los','es','y','que'], x))) AS score_es,
         |         len(list_filter($ToksSql, x -> list_contains(['le','les','est','et','une'], x))) AS score_fr,
         |         len(list_filter($ToksSql, x -> list_contains(['de','shi','le','bu','wo'], x))) AS score_zh
         |  FROM documents),
         |g AS (
         |  SELECT lang,
         |    CASE
         |      WHEN score_en > 0 AND score_en >= score_de AND score_en >= score_es AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
         |      WHEN score_de > 0 AND score_de > score_en AND score_de >= score_es AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
         |      WHEN score_es > 0 AND score_es > score_en AND score_es > score_de AND score_es >= score_fr AND score_es >= score_zh THEN 'es'
         |      WHEN score_fr > 0 AND score_fr > score_en AND score_fr > score_de AND score_fr > score_es AND score_fr >= score_zh THEN 'fr'
         |      WHEN score_zh > 0 AND score_zh > score_en AND score_zh > score_de AND score_zh > score_es AND score_zh > score_fr THEN 'zh'
         |      ELSE 'unknown' END AS guessed_lang
         |  FROM x)
         |SELECT lang AS true_lang, guessed_lang,
         |       CAST(count(*) AS BIGINT) AS n_docs
         |FROM g GROUP BY 1, 2""".stripMargin,

    "q257_dedup_savings" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, md5($NormSql) AS fp,
         |         CAST(len($ToksSql) AS BIGINT) AS n_toks
         |  FROM documents),
         |tagged AS (
         |  SELECT source, n_toks,
         |         row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
         |           AS keeper
         |  FROM d),
         |agg AS (
         |  SELECT source,
         |         CAST(count(*) AS BIGINT) AS raw_docs,
         |         CAST(sum(n_toks) AS BIGINT) AS raw_tokens,
         |         CAST(count(*) FILTER (WHERE keeper) AS BIGINT) AS kept_docs,
         |         CAST(COALESCE(sum(n_toks) FILTER (WHERE keeper), 0)
         |           AS BIGINT) AS kept_tokens
         |  FROM tagged GROUP BY 1)
         |SELECT source, raw_docs, raw_tokens, kept_docs, kept_tokens,
         |       (1000000 * (raw_docs - kept_docs)) // raw_docs
         |         AS doc_inflation_ppm,
         |       (1000000 * (raw_tokens - kept_tokens)) // raw_tokens
         |         AS token_inflation_ppm
         |FROM agg""".stripMargin,

    "q256_quantile_normalize" ->
      """WITH d AS (SELECT source, n_chars FROM documents),
        |gcdf AS (
        |  SELECT n_chars AS v,
        |         CAST(sum(count(*)) OVER (ORDER BY n_chars
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum_all
        |  FROM d GROUP BY n_chars),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        |cells AS (
        |  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS c,
        |         CAST(sum(count(*)) OVER (PARTITION BY source
        |           ORDER BY n_chars
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum_s
        |  FROM d GROUP BY source, n_chars),
        |segn AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
        |         FROM d GROUP BY 1)
        |SELECT cells.source, cells.n_chars, cells.c,
        |       CAST(min(gcdf.v) AS BIGINT) AS mapped_chars
        |FROM cells JOIN segn USING (source) CROSS JOIN tot
        |JOIN gcdf ON gcdf.cum_all * segn.n_s >= cells.cum_s * tot.n
        |GROUP BY 1, 2, 3""".stripMargin,

    "q239_readability" ->
      s"""WITH d AS (
         |  SELECT source,
         |         CAST(len($ToksSql) AS BIGINT) AS n_words,
         |         CAST(greatest(len(string_split_regex(text, '[.!?]+')) - 1,
         |           1) AS BIGINT) AS n_sents,
         |         CAST(list_reduce(list_prepend(0, list_transform(
         |           list_filter(string_split(lower(text), ' '), x -> x != ''),
         |           w -> greatest(
         |             length(regexp_replace(w, '[aeiouy]+', 'V', 'g')) -
         |             length(replace(regexp_replace(w, '[aeiouy]+', 'V', 'g'),
         |               'V', '')), 1))), (a, b) -> a + b) AS BIGINT) AS n_syll
         |  FROM documents),
         |f AS (
         |  SELECT source, n_words, n_syll,
         |         206835000
         |           - (1015 * ((1000000 * n_words) // n_sents)) // 1000
         |           - (84600 * ((1000000 * n_syll) // n_words)) // 1000
         |           AS flesch_micro
         |  FROM d WHERE n_words > 0)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_words) AS BIGINT) AS words,
         |       CAST(sum(n_syll) AS BIGINT) AS sylls,
         |       CAST(sum(flesch_micro) AS BIGINT)
         |         // CAST(count(*) AS BIGINT) AS mean_flesch_micro
         |FROM f GROUP BY 1""".stripMargin,

    "q237_burrows_delta" ->
      s"""WITH toks AS (
         |  SELECT source, unnest($ToksSql) AS w FROM documents),
         |top AS (
         |  SELECT w FROM (
         |    SELECT w, count(*) AS c FROM toks GROUP BY 1)
         |  ORDER BY c DESC, w ASC LIMIT 20),
         |srctot AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS nt
         |  FROM toks GROUP BY 1),
         |rates AS (
         |  SELECT t.source, t.w, CAST(count(*) AS BIGINT) AS cw
         |  FROM toks t JOIN top USING (w) GROUP BY 1, 2),
         |grid AS (
         |  SELECT s.source, top.w,
         |         (1000000 * coalesce(r.cw, 0)) // s.nt AS ppm
         |  FROM top CROSS JOIN srctot s
         |  LEFT JOIN rates r ON r.source = s.source AND r.w = top.w),
         |stats AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS k,
         |         CAST(sum(ppm) AS BIGINT) AS s1,
         |         CAST(sum(ppm * ppm) AS BIGINT) AS s2
         |  FROM grid GROUP BY 1
         |  HAVING count(*) * sum(ppm * ppm) > sum(ppm) * sum(ppm)),
         |z AS (
         |  SELECT g.source, g.w,
         |         CAST(floor(CAST(g.ppm * st.k - st.s1 AS DOUBLE)
         |           / sqrt(CAST(st.k * st.s2 - st.s1 * st.s1 AS DOUBLE))
         |           * 1e6 + 0.5) AS BIGINT) AS z_micro
         |  FROM grid g JOIN stats st USING (w))
         |SELECT a.source AS src_a, b.source AS src_b,
         |       CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(abs(a.z_micro - b.z_micro)) AS BIGINT)
         |         // CAST(count(*) AS BIGINT) AS delta_micro
         |FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
         |GROUP BY 1, 2""".stripMargin,

    "q232_domain_stats" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |         text || CASE WHEN doc_id % 3 = 0
        |           THEN ' see http://site' || CAST(doc_id % 7 AS VARCHAR)
        |                || '.example.com/page' || CAST(doc_id AS VARCHAR)
        |           ELSE '' END AS text
        |  FROM documents),
        |hits AS (
        |  SELECT doc_id,
        |         unnest(regexp_extract_all(text,
        |           'https?://([A-Za-z0-9.-]+)', 1)) AS domain
        |  FROM aug),
        |bd AS (
        |  SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
        |         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |  FROM hits GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_urls) AS BIGINT) AS t FROM bd)
        |SELECT domain, n_urls, n_docs,
        |       (1000 * n_urls) // t AS url_share_permille
        |FROM bd, tot""".stripMargin,

    "q230_compression_ratio" -> {
      val wrapped =
        "chr(1) || array_to_string(string_split(word, ''), " +
          "chr(2)||chr(1)) || chr(2)"
      val chain = BpeAppliedMerges.foldLeft(wrapped) { case (acc, (l, r)) =>
        s"replace($acc, chr(1)||'$l'||chr(2)||chr(1)||'$r'||chr(2), " +
          s"chr(1)||'$l$r'||chr(2))"
      }
      s"""WITH w AS (
         |  SELECT lang, t AS word, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT lang, unnest($ToksSql) AS t FROM documents)
         |  WHERE regexp_full_match(t, '[a-z]+')
         |  GROUP BY 1, 2),
         |enc AS (
         |  SELECT lang, c, CAST(length(word) AS BIGINT) AS len,
         |         CAST(len(string_split(substr(s, 2, length(s) - 2),
         |                   chr(2)||chr(1))) AS BIGINT) AS ns
         |  FROM (SELECT lang, word, c, $chain AS s FROM w))
         |SELECT lang, n_words, n_chars, n_subwords,
         |       (1000 * n_chars) // n_subwords AS chars_per_subword_milli
         |FROM (
         |  SELECT lang, CAST(sum(c) AS BIGINT) AS n_words,
         |         CAST(sum(len * c) AS BIGINT) AS n_chars,
         |         CAST(sum(ns * c) AS BIGINT) AS n_subwords
         |  FROM enc GROUP BY 1)""".stripMargin
    },

    "q224_feature_hashing" ->
      s"""WITH f AS (
         |  SELECT doc_id, md5(t) AS h
         |  FROM (SELECT doc_id, unnest($ToksSql) AS t FROM documents))
         |SELECT doc_id, substr(h, 1, 2) AS bucket,
         |       CAST(sum(CASE WHEN substr(h, 3, 1) < '8'
         |                     THEN 1 ELSE -1 END) AS BIGINT) AS w
         |FROM f GROUP BY 1, 2
         |HAVING sum(CASE WHEN substr(h, 3, 1) < '8'
         |                THEN 1 ELSE -1 END) <> 0""".stripMargin,

    "q225_bpe_encode" -> {
      // the same merge list replayed as a replace chain over
      // chr(1)tok chr(2)-wrapped symbols: matches are leftmost
      // non-overlapping and adjacent pairs share no characters, which is
      // exactly the kernel's single-pass scan (see PairMerge.scala)
      val wrapped =
        "chr(1) || array_to_string(string_split(word, ''), " +
          "chr(2)||chr(1)) || chr(2)"
      val chain = BpeAppliedMerges.foldLeft(wrapped) { case (acc, (l, r)) =>
        s"replace($acc, chr(1)||'$l'||chr(2)||chr(1)||'$r'||chr(2), " +
          s"chr(1)||'$l$r'||chr(2))"
      }
      s"""WITH w AS (
         |  SELECT t AS word, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest($ToksSql) AS t FROM documents)
         |  WHERE regexp_full_match(t, '[a-z]+')
         |  GROUP BY 1),
         |enc AS (SELECT $chain AS s, c FROM w)
         |SELECT subword, CAST(sum(c) AS BIGINT) AS cnt
         |FROM (SELECT unnest(string_split(substr(s, 2, length(s) - 2),
         |                    chr(2)||chr(1))) AS subword, c
         |      FROM enc)
         |GROUP BY 1
         |ORDER BY cnt DESC, subword ASC LIMIT 30""".stripMargin
    },

    "q222_collocations" ->
      s"""WITH d AS (
         |  SELECT doc_id, $ToksSql AS toks FROM documents),
         |bg AS (
         |  SELECT toks[CAST(r.i AS INT)] AS a,
         |         toks[CAST(r.i AS INT) + 1] AS b
         |  FROM d, unnest(range(1, len(toks))) AS r(i)),
         |c AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
         |      FROM bg GROUP BY 1, 2),
         |tot AS (SELECT CAST(sum(c_ab) AS BIGINT) AS nn FROM c),
         |ma AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM c GROUP BY 1),
         |mb AS (SELECT b, CAST(sum(c_ab) AS BIGINT) AS c_b FROM c GROUP BY 1)
         |SELECT a, b, c_ab, pmi_micro FROM (
         |  SELECT c.a, c.b, c.c_ab,
         |         (1000000 * tot.nn * c.c_ab) // (ma.c_a * mb.c_b)
         |           AS pmi_micro
         |  FROM c
         |  JOIN ma ON c.a = ma.a
         |  JOIN mb ON c.b = mb.b
         |  CROSS JOIN tot
         |  WHERE c.c_ab >= 5)
         |ORDER BY pmi_micro DESC, a, b LIMIT 20""".stripMargin,

    "q219_budget_select" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |         CAST(len($ToksSql) AS BIGINT) AS nt,
         |         CAST(len(list_distinct($ToksSql)) AS BIGINT) AS nd
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, source, nt, (nd * 1000) // nt AS q
         |  FROM d WHERE nt > 0),
         |hist AS (
         |  SELECT q.q, CAST(sum(nt) AS BIGINT) AS bucket_tokens
         |  FROM q GROUP BY 1),
         |cuts AS (
         |  SELECT q AS cq, prev, cum <= 10000 AS full_bucket
         |  FROM (
         |    SELECT q, bucket_tokens,
         |           CAST(sum(bucket_tokens) OVER (ORDER BY q DESC
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |             AS BIGINT) AS cum,
         |           CAST(sum(bucket_tokens) OVER (ORDER BY q DESC
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |             AS BIGINT) - bucket_tokens AS prev
         |    FROM hist)
         |  WHERE prev < 10000),
         |kept AS (
         |  SELECT source, nt FROM (
         |    SELECT q.source, q.nt, cuts.full_bucket, cuts.prev,
         |           CAST(sum(q.nt) OVER (PARTITION BY q.q
         |             ORDER BY q.doc_id
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |             AS BIGINT) AS bucket_cum
         |    FROM q JOIN cuts ON q.q = cuts.cq)
         |  WHERE full_bucket OR prev + bucket_cum <= 10000)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(nt) AS BIGINT) AS n_tokens
         |FROM kept GROUP BY 1""".stripMargin,

    "q220_quality_quantiles" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |         CAST(len($ToksSql) AS BIGINT) AS nt,
         |         CAST(len(list_distinct($ToksSql)) AS BIGINT) AS nd
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, source, (nd * 1000) // nt AS q
         |  FROM d WHERE nt > 0)
         |SELECT doc_id, source, q,
         |       CASE WHEN n > 1 THEN ((r - 1) * 1000) // (n - 1)
         |            ELSE 500 END AS pctl_permille
         |FROM (
         |  SELECT doc_id, source, q,
         |         CAST(row_number() OVER (PARTITION BY source
         |           ORDER BY q, doc_id) AS BIGINT) AS r,
         |         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
         |  FROM q)""".stripMargin,

    "q221_signal_kappa" ->
      s"""WITH d AS (
         |  SELECT CAST(len($ToksSql) AS BIGINT) AS nt,
         |         CAST(len(list_distinct($ToksSql)) AS BIGINT) AS nd
         |  FROM documents),
         |sig AS (
         |  SELECT nt >= 20 AS a, (nd * 1000) // nt >= 500 AS b
         |  FROM d WHERE nt > 0),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
         |           AS agree,
         |         CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS a1,
         |         CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS b1
         |  FROM sig)
         |SELECT n, agree, a1, b1,
         |       CAST(n * agree - a1 * b1 - (n - a1) * (n - b1) AS BIGINT)
         |         AS num,
         |       CAST(n * n - a1 * b1 - (n - a1) * (n - b1) AS BIGINT)
         |         AS den,
         |       CASE WHEN n = 0
         |              OR n * n - a1 * b1 - (n - a1) * (n - b1) = 0 THEN 0
         |            ELSE CAST(floor((n * agree - a1 * b1
         |              - (n - a1) * (n - b1)) * CAST(1000000 AS DOUBLE)
         |              / (n * n - a1 * b1 - (n - a1) * (n - b1)) + 0.5)
         |              AS BIGINT) END AS kappa_micro
         |FROM agg""".stripMargin,

    "q167_bigram_surprisal" ->
      s"""WITH d AS (
         |  SELECT doc_id, $ToksSql AS toks FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |         toks[CAST(r.i AS INT)] AS a,
         |         toks[CAST(r.i AS INT) + 1] AS b
         |  FROM d, unnest(range(1, len(toks))) AS r(i)),
         |c AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
         |      FROM bg GROUP BY 1, 2),
         |p AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM c GROUP BY 1),
         |j AS (SELECT bg.doc_id,
         |             CAST(length(format('{:b}', p.c_a))
         |                - length(format('{:b}', c.c_ab)) AS BIGINT) AS bits
         |      FROM bg JOIN c USING (a, b) JOIN p USING (a))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |       CAST(sum(bits) AS BIGINT) AS surprisal_bits,
         |       CAST(sum(bits) AS DOUBLE) / count(*) AS avg_bits
         |FROM j GROUP BY 1""".stripMargin,

    "q168_vocab_growth" ->
      s"""WITH s AS (
         |  SELECT doc_id // 50 AS bucket, unnest($ToksSql) AS token
         |  FROM documents),
         |v AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_toks
         |      FROM s GROUP BY 1),
         |f AS (SELECT token, min(bucket) AS bucket FROM s GROUP BY 1),
         |n AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_new
         |      FROM f GROUP BY 1)
         |SELECT v.bucket, n_toks,
         |       CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
         |       CAST(sum(n_toks) OVER (ORDER BY v.bucket) AS BIGINT)
         |         AS cum_toks,
         |       CAST(sum(COALESCE(n_new, 0)) OVER (ORDER BY v.bucket)
         |         AS BIGINT) AS cum_types
         |FROM v LEFT JOIN n ON v.bucket = n.bucket""".stripMargin,

    "q169_lexical_diversity" ->
      s"""WITH s AS (
         |  SELECT source, unnest($ToksSql) AS token FROM documents),
         |c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
         |      FROM s GROUP BY 1, 2)
         |SELECT source,
         |       CAST(sum(c) AS BIGINT) AS n_tokens,
         |       CAST(count(*) AS BIGINT) AS n_types,
         |       CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
         |       (CAST(count(*) AS BIGINT) * 1000000)
         |         // CAST(sum(c) AS BIGINT) AS ttr_ppm,
         |       (CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) * 1000000)
         |         // CAST(count(*) AS BIGINT) AS hapax_ppm
         |FROM c GROUP BY 1""".stripMargin,

    "q171_tfidf_pairs" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest($ToksSql) AS token FROM documents),
         |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |       FROM t GROUP BY 1, 2),
         |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df
         |       FROM tf GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |w AS (SELECT tf.doc_id, tf.token,
         |             tf.tf * ((100 * n.n) // df.df) AS w
         |      FROM tf JOIN df USING (token) CROSS JOIN n
         |      WHERE df.df <= 50),
         |nm AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS nsq
         |       FROM w GROUP BY 1),
         |pr AS (SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         |              CAST(sum(a.w * b.w) AS BIGINT) AS dot
         |       FROM w a JOIN w b
         |         ON a.token = b.token AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT * FROM (
         |  SELECT doc_id_1, doc_id_2, dot,
         |         CAST(dot AS DOUBLE) /
         |           (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE)))
         |           AS cos_sim
         |  FROM pr
         |  JOIN nm na ON doc_id_1 = na.doc_id
         |  JOIN nm nb ON doc_id_2 = nb.doc_id)
         |WHERE cos_sim >= 0.6""".stripMargin,

    "q176_keywords" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest($ToksSql) AS token FROM documents),
         |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |       FROM t GROUP BY 1, 2),
         |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df
         |       FROM tf GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |w AS (SELECT tf.doc_id, tf.token,
         |             tf.tf * ((100 * n.n) // df.df) AS w
         |      FROM tf JOIN df USING (token) CROSS JOIN n)
         |SELECT doc_id, token, w, "rank" FROM (
         |  SELECT doc_id, token, w,
         |         CAST(row_number() OVER (PARTITION BY doc_id
         |                                 ORDER BY w DESC, token ASC)
         |              AS BIGINT) AS "rank"
         |  FROM w)
         |WHERE "rank" <= 3""".stripMargin,

    "q114_mix_allocation" ->
      s"""WITH s AS (
         |  SELECT source, CAST(sum(len($ToksSql)) AS BIGINT) AS w
         |  FROM documents GROUP BY 1),
         |t AS (SELECT CAST(sum(w) AS BIGINT) AS tot FROM s),
         |b AS (SELECT source, w,
         |             (1000000 * w) // tot AS base,
         |             (1000000 * w) % tot AS rem
         |      FROM s, t),
         |k AS (SELECT 1000000 - CAST(sum(base) AS BIGINT) AS extra FROM b)
         |SELECT source, w,
         |       base + (CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
         |                         <= extra THEN 1 ELSE 0 END) AS alloc
         |FROM b, k""".stripMargin,
  )
}
