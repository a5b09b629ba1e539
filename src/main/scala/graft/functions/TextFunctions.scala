package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators (tokenization,
  * normalization, fingerprinting, shingling). All built from codegen'd
  * built-ins — no UDFs — so they stay inside WholeStageCodegen and scale
  * linearly with input bytes.
  */
object TextFunctions {
  /** Whitespace tokens (empty strings from repeated separators dropped). */
  def tokensWs(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** BPE-ish pre-tokenization: letter runs, digit runs, single symbols. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def tokensBpe(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Canonical form for content hashing: lowercase, collapsed whitespace.
    * The fused ASCII kernel handles the common case in one byte scan; rows
    * with any non-ASCII byte fall back (kernel returns null → coalesce) to
    * the exact built-in chain, so semantics are identical everywhere. The
    * built-in arm also keeps this column statically non-nullable for
    * non-null input — load-bearing for the isnotnull-inference plan trap
    * (see Dedup.minhashLshPairs).
    */
  def normText(text: Column): Column =
    coalesce(call_function("graft_norm_ascii", text),
      trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Content fingerprint = md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(normText(text).cast("binary"))

  /** Distinct character w-gram shingles (empty below w chars). Wider
    * shingles trade a larger vocabulary for lower collision rates — on
    * templated corpora whose character-trigram vocabulary is tiny relative
    * to the document count, prefix-filtered similarity joins need w ≥ 5 for
    * rarest-first ordering to mean anything.
    */
  def shinglesW(text: Column, w: Int): Column =
    when(length(text) >= w,
      array_distinct(
        transform(sequence(lit(1), length(text) - (w - 1)),
          i => text.substr(i, lit(w)))))
      .otherwise(array().cast("array<string>"))

  /** Character w-gram multiset — `shinglesW` without the distinct: every
    * occurrence kept, in text order. The term-frequency-weighted twin
    * (occurrence expansion makes the multiset a plain set — see
    * `graft.expressions.OccurrenceMix`).
    */
  def shinglesMultiW(text: Column, w: Int): Column =
    when(length(text) >= w,
      transform(sequence(lit(1), length(text) - (w - 1)),
        i => text.substr(i, lit(w))))
      .otherwise(array().cast("array<string>"))

  /** Distinct character 3-gram shingles (empty below 3 chars). */
  def shingles3(text: Column): Column = shinglesW(text, 3)

  /** Distinct word n-gram shingles over whitespace tokens of the normalized
    * text (empty below n tokens) — the decontamination-standard unit:
    * word-level grams survive whitespace/case noise that character grams
    * don't, and n bounds the false-positive rate of cross-corpus overlap.
    */
  def wordShinglesN(text: Column, n: Int): Column = {
    val toks = tokensWs(normText(text))
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Karp–Rabin rolling hash of the token stream (base/mod fixed). A cheap
    * order-sensitive document fingerprint; complements the order-insensitive
    * md5 form above. Left fold => deterministic.
    */
  def rollingHash(text: Column): Column =
    aggregate(
      tokensWs(text),
      lit(0L),
      (acc, t) => pmod(acc * lit(1000003L) + xxhash64(t), lit(1000000007L)))
}
