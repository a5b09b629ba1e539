package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators: the composed filter→dedup→sample shape of a
  * training-data preparation job.
  *
  * Sampling is CONTENT-hash based (a prefix of the normalized-text md5),
  * not row-random: the decision is a pure function of content, so it is
  * reproducible across runs/clusters, survives repartitioning, and agrees
  * with dedup (all copies of a document sample identically). This is the
  * standard way to cut train/val splits that stay disjoint under re-runs.
  */
object Curation {

  /** Keep documents whose normalized-content md5 starts with one of the
    * given hex characters (each hex char ≈ 1/16 of the corpus).
    */
  def contentSample(docs: DataFrame, hexPrefixes: Seq[String]): DataFrame =
    docs.withColumn("fp", fingerprint(col("text")))
      .filter(substring(col("fp"), 1, 1).isInCollection(hexPrefixes))

  /** The composed curation pipeline:
    *  1. length window (whitespace-token count in [minTokens, maxTokens]);
    *  2. punctuation cap (non-alphanumeric ratio < maxPunct);
    *  3. exact dedup on normalized content (keep min doc_id);
    *  4. content-hash sampling into the final corpus.
    * One shuffle total (the dedup window); filters all evaluate scan-side.
    */
  def curate(docs: DataFrame, minTokens: Int, maxTokens: Int,
             maxPunct: Double, sampleHex: Seq[String]): DataFrame = {
    val nTok = size(tokensWs(col("text")))
    val punct = length(regexp_replace(col("text"), "[A-Za-z0-9 ]", ""))
      .cast("double") / length(col("text"))
    val filtered = docs
      .withColumn("n_tokens", nTok.cast("long"))
      .filter(col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .filter(punct < maxPunct)
      .withColumn("fp", fingerprint(col("text")))
    val deduped = filtered
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
    deduped
      .filter(substring(col("fp"), 1, 1).isInCollection(sampleHex))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("fp"))
  }

  /** Corpus vocabulary: top-k whitespace tokens by frequency with a
    * total-order tie-break. The explode is map-side; one shuffle on the
    * token; the top-k cut runs on the aggregated counts.
    */
  def vocabTopK(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(tokensWs(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(k)

  /** Per-token corpus statistics: `tf` (total occurrences across the
    * corpus) and `df` (number of distinct documents containing the token)
    * — the raw integer inputs of TF-IDF, emitted WITHOUT the log transform
    * (log() is last-ulp libm-dependent and therefore oracle-hostile; the
    * weighting is a trivial client-side map over this exact frame).
    *
    * Two-level aggregation: a (token, doc_id) partial count first — the
    * map-side combine collapses the explode fan-out to per-doc distinct
    * tokens before anything shuffles — then a single groupBy(token)
    * produces both tf = sum(n) and df = count(*) in one pass. Top-k by tf
    * (token tie-break) keeps the result bounded and deterministic.
    */
  /** Sequence packing for training-batch preparation: assign every document
    * a (pack_id, pack_offset) so concatenating documents in order fills
    * fixed-capacity token bins — the layout step before writing training
    * shards. Offset binning (a document belongs to the bin where its first
    * token lands), which is the deterministic, shuffle-free form of greedy
    * packing: pack boundaries are pure functions of the running token
    * offset.
    *
    * The running offset is a window sum PARTITIONED BY lang (documents are
    * packed within their language, the usual curriculum constraint) and
    * ordered by doc_id — so the window parallelizes across languages and
    * never funnels the corpus through one partition. At 100 TB the
    * partition key must remain a bounded-cardinality, high-frequency
    * column (language, shard, date); a single global pack sequence would
    * serialize and is deliberately not offered.
    */
  def sequencePack(docs: DataFrame, maxTokens: Int): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), col("lang"),
        size(tokensWs(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        // integer `div`, not `/`: double division loses exactness past 2^53
        // cumulative tokens — real at corpus scale
        expr(s"(cum - n_tokens) div $maxTokens").as("pack_id"),
        ((col("cum") - col("n_tokens")) % maxTokens).as("pack_offset"))
  }

  /** Hash bucket in [0, 256) from the first two hex chars of the content
    * fingerprint — the shared primitive behind stratified sampling,
    * split assignment, and language resampling. A pure per-row function of
    * content: no shuffle, reproducible on any partitioning.
    */
  private[graft] def fpBucket256 =
    (expr("instr('0123456789abcdef', substring(fp, 1, 1))") - 1) * 16 +
      expr("instr('0123456789abcdef', substring(fp, 2, 1))") - 1

  /** Deterministic train/val/test split assignment by content hash
    * (buckets out of 256: `[0, testBuckets)` → test,
    * `[testBuckets, testBuckets+valBuckets)` → val, rest → train).
    *
    * Content-addressed rather than row-random, so (a) re-runs and
    * repartitions produce the identical split, (b) exact duplicates land
    * in the SAME split — the property that keeps eval sets uncontaminated
    * when dedup is imperfect. Mirrors the reference's reproducibility
    * stance (transform.py derives everything from data, never from RNG).
    * Narrow map over the scan; scales linearly.
    */
  def trainValTestSplit(docs: DataFrame, testBuckets: Int,
                        valBuckets: Int): DataFrame =
    docs.withColumn("fp", fingerprint(col("text")))
      .withColumn("bucket", fpBucket256)
      .select(col("doc_id"), col("lang"),
        when(col("bucket") < testBuckets, "test")
          .when(col("bucket") < testBuckets + valBuckets, "val")
          .otherwise("train").as("split"))

  /** Fixed-width overlapping character chunking: one row per
    * `[i*stride, i*stride+width)` window — the context-window splitting
    * step before embedding or tokenizing long documents.
    *
    * The offset list is generated per row (`sequence` + `posexplode`), so
    * the fan-out happens map-side inside the scan stage: no shuffle, and
    * output partitioning follows input partitioning (a doc's chunks stay
    * in one partition — what a downstream per-chunk embed stage wants).
    * At 100 TB the only knob that matters is output row width; chunks are
    * bounded at `width` chars so partition sizes stay predictable.
    */
  def chunkFixed(docs: DataFrame, width: Int, stride: Int): DataFrame = {
    require(stride > 0 && width > 0, "width and stride must be positive")
    docs.select(col("doc_id"), col("text"),
        posexplode(sequence(lit(0),
          greatest(length(col("text")) - 1, lit(0)), lit(stride))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        expr(s"substring(text, col + 1, $width)").as("chunk"))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
  }

  /** Token-window chunking: overlapping windows of `winTokens` whitespace
    * tokens at `stride`-token steps — the tokenizer-aligned twin of
    * `chunkFixed` (what you feed an embedding model with a token budget).
    * Same map-side fan-out shape: tokenize once per row, `sequence` +
    * `posexplode` the window starts, `slice` each window out. No shuffle.
    */
  def chunkTokens(docs: DataFrame, winTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && winTokens > 0, "winTokens and stride must be positive")
    docs.select(col("doc_id"), tokensWs(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0),
          greatest(size(col("toks")) - 1, lit(0)), lit(stride))))
      .select(col("doc_id"), col("pos").cast("long").as("window_id"),
        slice(col("toks"), col("col") + 1, lit(winTokens)).as("w"))
      .select(col("doc_id"), col("window_id"),
        array_join(col("w"), " ").as("window_text"),
        size(col("w")).cast("long").as("n_tokens"))
  }

  /** Balanced per-group sample: exactly `k` documents per group, chosen as
    * the k smallest content fingerprints — deterministic, reproducible,
    * and uniform-in-content (md5 order is independent of every document
    * attribute). The equal-depth counterpart of `stratifiedSample`'s
    * equal-RATE cut, for building balanced eval sets from skewed corpora.
    * One shuffle; Spark 4's WindowGroupLimit cuts to k per group map-side
    * before the exchange, so the shuffle carries ~k·groups rows, not the
    * corpus.
    */
  def balancedSample(docs: DataFrame, groupCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("fp"), col("doc_id"))
    docs.withColumn("fp", fingerprint(col("text")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col(groupCol), col("fp"))
  }

  /** Length-outlier trim: keep documents whose `n_chars` lies within the
    * per-language `[percentile_disc(lo), percentile_disc(hi)]` window.
    * Discrete percentiles (an actual corpus value, not an interpolation)
    * keep the thresholds exact and engine-portable.
    *
    * Two passes by construction — thresholds are a global property of the
    * corpus — but the first pass reduces to one tiny row per language
    * (broadcast back), so the cost is one extra scan, not an extra
    * shuffle of the corpus. At 100 TB replace the exact percentile with
    * `approx_percentile` if the per-group sort memory ever bites; the
    * operator shape is unchanged.
    */
  def lengthTrim(docs: DataFrame, lo: Double, hi: Double): DataFrame = {
    val th = docs.groupBy(col("lang")).agg(
      expr(s"percentile_disc($lo) WITHIN GROUP (ORDER BY n_chars)").as("th_lo"),
      expr(s"percentile_disc($hi) WITHIN GROUP (ORDER BY n_chars)").as("th_hi"))
    docs.join(broadcast(th), Seq("lang"))
      .filter(col("n_chars").between(col("th_lo"), col("th_hi")))
      .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  /** Non-overlapping `segTokens`-token segments per document: the
    * sub-document unit for segment-level curation (the corpora this
    * engine targets carry duplication BELOW document granularity —
    * shared headers, licenses, navigation chrome — that document-level
    * dedup can't see). Map-side fan-out only, no shuffle; empty documents
    * emit no segments (which also guards Spark's descending-`sequence`
    * inference on the degenerate 0-token range).
    */
  private def segmented(docs: DataFrame, segTokens: Int): DataFrame = {
    require(segTokens > 0, "segTokens must be positive")
    docs.select(col("doc_id"), tokensWs(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0),
          expr(s"(size(toks) + ${segTokens - 1}) div $segTokens") - 1)))
      .select(col("doc_id"), col("col").cast("long").as("seg_idx"),
        array_join(slice(col("toks"), col("col") * segTokens + 1,
          lit(segTokens)), " ").as("seg"))
  }

  /** Segment-level exact dedup: keep only the FIRST occurrence (global
    * (doc_id, seg_idx) order) of every distinct segment, then reassemble
    * each document from its surviving segments — sub-document dedup in
    * the style of corpus-prep "remove repeated paragraphs" stages.
    * One shuffle on the segment text for the first-occurrence window, one
    * on doc_id for reassembly; the window's partition key is the segment
    * itself, so hot segments are exactly the ones whose duplicates
    * collapse. Output: (doc_id, n_segs, n_kept, dedup_text).
    */
  def segmentDedup(docs: DataFrame, segTokens: Int): DataFrame = {
    val segs = segmented(docs, segTokens)
    val kept = segs
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("seg")).orderBy(col("doc_id"), col("seg_idx"))))
      .filter(col("rn") === 1)
    val re = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
          x => x("seg")), " ").as("dedup_text"))
    // documents whose every segment was seen earlier still get a row
    segs.groupBy(col("doc_id")).agg(count(lit(1)).as("n_segs"))
      .join(re, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("dedup_text"), lit("")).as("dedup_text"))
  }

  /** Boilerplate strip: segments occurring in at least `minDocs` DISTINCT
    * documents are corpus chrome (headers, licenses, templates) and are
    * removed from every document — the frequency-threshold complement of
    * [[segmentDedup]]'s first-occurrence rule (CCNet-style line-frequency
    * cleaning, at segment granularity). The boilerplate set is the output
    * of an aggregation, corpus-size-independent and broadcastable.
    * Output: (doc_id, n_segs, n_boiler, clean_text).
    */
  def boilerplateStrip(docs: DataFrame, segTokens: Int, minDocs: Int): DataFrame = {
    val segs = segmented(docs, segTokens)
    val boiler = segs.groupBy(col("seg"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("seg"), lit(true).as("is_boiler"))
    segs.join(boiler, Seq("seg"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        count(when(col("is_boiler"), 1)).as("n_boiler"),
        // collect_list drops the nulls `when` leaves on boiler rows
        array_join(transform(
          array_sort(collect_list(
            when(col("is_boiler").isNull, struct(col("seg_idx"), col("seg"))))),
          x => x("seg")), " ").as("clean_text"))
  }

  /** Structural (paragraph-level) near-dup document pairs: documents
    * whose SETS of distinct segments overlap by Jaccard ≥ threshold —
    * catches permuted, partially-copied, or re-chunked documents whose
    * doc-level shingle profiles diverge (a reordered document keeps ~all
    * its segments but few of its cross-segment shingles). The complement
    * of [[segmentDedup]] (which removes repeats) and of the q19-family
    * content near-dups (which compare character shingles).
    *
    * Scale shape: the pair stage is an inverted-index equi-join on the
    * segment, with a document-frequency cap dropping corpus-chrome
    * segments BEFORE the join (boilerplate is [[boilerplateStrip]]'s
    * territory and would otherwise quadratically fan out — q116's dfCap
    * contract, part of the operator's semantics and mirrored by the
    * oracle). Candidate volume is Σ_seg df², bounded per segment by
    * dfCap². Sizes re-attach by two key joins on the doc-aggregate frame;
    * jaccard is an exact integer-micro division.
    * Output: (doc_a, doc_b, shared, n_a, n_b, jaccard_micro).
    */
  def segmentJaccardDocs(docs: DataFrame, segTokens: Int, dfCap: Int,
                         threshMicro: Long): DataFrame = {
    val segs = segmented(docs, segTokens)
      .select(col("doc_id"), col("seg")).distinct()
    val rare = segs.groupBy(col("seg"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .select(col("seg"))
    val indexed = segs.join(rare, Seq("seg"))
    val sizes = segs.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    indexed.as("x")
      .join(indexed.as("y"),
        col("x.seg") === col("y.seg") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")),
        Seq("doc_b"))
      .withColumn("jaccard_micro",
        expr("(1000000 * shared) div (n_a + n_b - shared)"))
      .filter(col("jaccard_micro") >= threshMicro)
  }

  def tokenCorpusStats(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), explode(tokensWs(col("text"))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("token"))
      .agg(sum(col("n")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(k)

  /** DSIR-style target-affinity data selection (Xie et al. '23, "Data
    * Selection for Language Models via Importance Resampling"): score every
    * document by how strongly its hashed n-gram features lean toward a
    * target slice of the corpus. Features are word bigrams hashed into 256
    * buckets (2 hex chars of md5 — engine-portable, seed-free); a bucket is
    * target-ENRICHED iff its target share exceeds its corpus share, tested
    * by exact integer cross-multiplication (cnt_t·N_raw > cnt_raw·N_t) so
    * no log-ratio doubles enter the score. Doc score = enriched minus
    * non-enriched feature occurrences — the sign-quantized analogue of
    * DSIR's summed log-likelihood ratio, chosen because it is exactly
    * reproducible across engines and cluster topologies.
    *
    * Scale: one tokenize+hash pass (codegen'd) feeding ONE corpus-sized
    * shuffle on (doc, bucket) whose map-side combine collapses the bigram
    * stream to ≤256 rows per document BEFORE anything moves or
    * materializes — bucket stats, the 1-row totals, the 256-row broadcast
    * flag join, and the per-doc score all derive from that small
    * checkpointed aggregate, never from the raw feature stream. (The
    * first cut checkpointed the per-occurrence stream itself; the sf1
    * bench rung priced that materialization at ~9× this formulation.)
    */
  def targetEnrichedSelect(docs: DataFrame, isTarget: Column): DataFrame = {
    val toks = docs.select(col("doc_id"), isTarget.as("is_t"),
      tokensWs(col("text")).as("t"))
    // bigrams via zip_with over two slices — total (empty for <2 tokens,
    // no conditional needed). The previous when/otherwise(transform(...))
    // formulation made the generator input CONDITIONAL, which defeated
    // Generate's once-per-input-row evaluation and rebuilt the whole
    // bigram array once per OUTPUT row: O(tokens²) per doc, measured
    // 7-10 s at sf0.1 vs ~0.5 s for this form (round-4 profile)
    val feats = toks
      .withColumn("b", zip_with(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)))
      .select(col("doc_id"), col("is_t"),
        explode(col("b")).as("bigram"))
      .select(col("doc_id"), col("is_t"),
        substring(md5(col("bigram")), 1, 2).as("bucket"))
    val g = feats.groupBy(col("doc_id"), col("is_t"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // ≤ |docs|·256 rows; feeds stats AND the score
    val bucketStats = g.groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("cnt_raw"),
        sum(when(col("is_t"), col("cnt")).otherwise(0L)).as("cnt_t"))
    val totals = bucketStats.groupBy()
      .agg(sum(col("cnt_raw")).as("n_raw"), sum(col("cnt_t")).as("n_t"))
    val flags = bucketStats.crossJoin(totals) // 256 x 1 rows
      .select(col("bucket"),
        (col("cnt_t") * col("n_raw") > col("cnt_raw") * col("n_t")).as("enr"))
    g.join(broadcast(flags), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_feat"),
        sum(when(col("enr"), col("cnt")).otherwise(0L)).as("n_enr"))
      .select(col("doc_id"), col("n_feat"), col("n_enr"),
        (col("n_enr") * 2 - col("n_feat")).as("score"))
  }

  /** Integer-exact weighted sampling (probability ∝ integer weight) by
    * ticket replication: each row emits `weight` tickets keyed by an
    * engine-portable md5 of (id, ticket index); the row's sample key is its
    * MINIMUM ticket and the global top-k smallest keys are the sample. The
    * min-of-w-uniform-hashes construction makes P(row owns the global min)
    * exactly w_i/Σw — weighted sampling without replacement in the A-ES
    * sense, but with NO rng, NO log/pow doubles: reruns, repartitions, and
    * different engines all draw the identical sample.
    *
    * Scale: ticket count = Σ weights; with weight = n_chars that is the
    * corpus character count — the same order as any tokenize pass. The
    * per-row work is a map-side explode + min-combine (the groupBy
    * collapses each row's tickets before shuffling), and the top-k is a
    * TakeOrdered, never a global sort. For weights far above row byte size,
    * cap or bucket the weight column before calling.
    */
  def weightedTicketSample(docs: DataFrame, weight: Column, k: Int): DataFrame =
    docs.select(col("doc_id"), weight.as("w"))
      .filter(col("w") > 0)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1L), col("w"))).as("i"))
      .select(col("doc_id"), col("w"),
        md5(concat_ws(":", col("doc_id"), col("i"))).as("tkt"))
      .groupBy(col("doc_id"), col("w"))
      .agg(min(col("tkt")).as("min_ticket"))
      .orderBy(col("min_ticket"))
      .limit(k)
}
