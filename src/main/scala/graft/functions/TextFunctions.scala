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

  /** Canonical form for content hashing: lowercase, collapsed whitespace. */
  def normText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint = md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(normText(text).cast("binary"))

  /** Distinct character 3-gram shingles (empty below 3 chars). */
  def shingles3(text: Column): Column =
    when(length(text) >= 3,
      array_distinct(
        transform(sequence(lit(1), length(text) - 2),
          i => text.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))

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
