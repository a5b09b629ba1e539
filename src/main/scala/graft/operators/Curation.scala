package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
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

  def tokenCorpusStats(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), explode(tokensWs(col("text"))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("token"))
      .agg(sum(col("n")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(k)
}
