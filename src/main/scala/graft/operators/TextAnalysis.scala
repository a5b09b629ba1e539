package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, language ID, fingerprinting. Everything is built from
  * codegen'd built-ins over the `documents` table — per-row scalar work, no
  * shuffle except where a window/group is stated, so throughput is
  * scan-bound at 100 TB.
  */
object TextAnalysis {

  /** Whitespace + BPE-ish token counts and char stats per document. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokensWs(col("text"))).as("n_tokens_ws"),
      size(tokensBpe(col("text"))).as("n_tokens_bpe"),
      length(col("text")).as("n_chars"))

  /** Heuristic quality score: token count band, punctuation ratio, stopword
    * ratio — the usual cheap pre-filters before expensive dedup/LM scoring.
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "in", "is", "and")

  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = tokensWs(col("text"))
    val nTok = size(toks).cast("double")
    val nonAlnum = length(regexp_replace(col("text"), "[A-Za-z0-9 ]", ""))
    val punctRatio = nonAlnum.cast("double") / length(col("text"))
    val stopHits = size(filter(toks, t => t.isInCollection(Stopwords)))
    val stopRatio = stopHits.cast("double") / nTok
    docs.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"),
      (least(nTok / lit(100.0), lit(1.0)) * (lit(1.0) - punctRatio)
        * (lit(0.5) + stopRatio)).as("quality_score"))
  }

  /** Marker-word language ID. Per-language marker lists; the guess is the
    * language with the most marker hits, ties broken by the fixed language
    * order. (A real system would use character n-gram profiles; the marker
    * scheme is the same shape — per-row counting + argmax — and is exactly
    * reproducible.)
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "and", "of"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "es", "y", "que"),
    "fr" -> Seq("le", "les", "est", "et", "une"),
    "zh" -> Seq("de", "shi", "le", "bu", "wo"))

  def langId(docs: DataFrame): DataFrame = {
    val toks = tokensWs(col("text"))
    val scores: Seq[(String, Column)] = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isInCollection(markers)))
    }
    // argmax with first-wins tie-break in LangMarkers order
    val guess = scores.zipWithIndex.foldRight(lit("unknown")) {
      case (((lang, s), i), els) =>
        val isMax = scores.drop(i + 1).map(o => s >= o._2).foldLeft(
          scores.take(i).map(o => s > o._2).foldLeft(lit(true))(_ && _))(_ && _)
        when(isMax && s > 0, lit(lang)).otherwise(els)
    }
    docs.select(
      (Seq(col("doc_id"), col("lang")) ++
        scores.map { case (l, s) => s.as(s"score_$l") } :+
        guess.as("guessed_lang")): _*)
  }

  /** md5 content fingerprint + duplicate rank within each fingerprint. */
  def fingerprints(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .withColumn("dup_rank", row_number().over(w))
  }

  /** Order-sensitive rolling-hash fingerprint (Karp–Rabin over tokens). */
  def rollingFingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), rollingHash(col("text")).as("rolling_fp"))

  /** PII redaction: replace email addresses and phone-shaped digit runs
    * with typed placeholder tags, and report per-document match counts (the
    * audit trail a scrubbing pass must emit). Pure per-row regex work —
    * codegen'd built-ins, scan-bound at any scale. Patterns deliberately
    * use only portable regex constructs (character classes, bounded
    * repetition — no lookaround), so an external auditor can reproduce the
    * pass byte-for-byte in any RE dialect.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}"

  def piiScrub(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>").as("scrubbed"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0)))
        .cast("long").as("n_phones"))

  /** Repetition quality signals (the Gopher-style within-document
    * repetition rules): fraction of duplicate lines, fraction of duplicate
    * whitespace tokens, and the fraction of the document's word trigrams
    * that are repeats of an earlier trigram. All per-row array arithmetic
    * over codegen'd built-ins — no shuffle, scan-bound; the standard cheap
    * screen for boilerplate/SEO-spam documents before training.
    */
  def repetitionScore(docs: DataFrame): DataFrame = {
    val lines = filter(split(col("text"), "\n"), l => l =!= lit(""))
    val toks = tokensWs(col("text"))
    // sequence(1, k) with k < 1 would generate a DESCENDING range, so the
    // below-3-token case must short-circuit to an empty array
    val tris = when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i, lit(3)))))
      .otherwise(array().cast("array<string>"))
    def dupFrac(arr: Column) = when(size(arr) > 0,
      (size(arr) - size(array_distinct(arr))).cast("double") / size(arr))
      .otherwise(lit(0.0))
    docs.select(
      col("doc_id"),
      dupFrac(lines).as("dup_line_frac"),
      dupFrac(toks).as("dup_token_frac"),
      dupFrac(tris).as("dup_trigram_frac"))
  }

  /** Fuzzy string matching: same-block pairs within `maxDistance` edit
    * distance. Blocking is mandatory — levenshtein is O(|s|²) per pair, so
    * the block key (brand, lang, length band, …) must bound pair counts;
    * this is the short-string complement to the shingle-Jaccard family
    * (which wins on long documents).
    */
  def fuzzyPairs(items: DataFrame, idCol: String, textCol: String,
                 blockCol: String, maxDistance: Int): DataFrame = {
    // Sorted character-code multiset, computed ONCE per row (never per
    // pair): one edit operation changes the character multiset of a string
    // by at most one element per side, so
    //   levenshtein(A, B) >= max(|A|, |B|) - |multiset_intersect(A, B)|
    // — a lossless per-pair screen evaluated by the codegen'd two-pointer
    // merge kernel (~2·len integer ops) instead of the banded DP.
    val charSig = (t: Column) => array_sort(
      transform(filter(split(t, ""), c => c =!= ""), c => ascii(c).cast("long")))
    val a = items.select(col(idCol).as("id_1"), col(textCol).as("t1"),
      col(blockCol).as("blk"), charSig(col(textCol)).as("sig1"))
    val b = items.select(col(idCol).as("id_2"), col(textCol).as("t2"),
      col(blockCol).as("blk"), charSig(col(textCol)).as("sig2"))
    // three lossless prunes before the quadratic-cost edit distance,
    // cheapest first:
    //  - |len(a) - len(b)| > k implies distance > k (integer check);
    //  - the character-multiset bound above (merge kernel);
    //  - the THRESHOLDED levenshtein overload (Spark 3.5+) runs the banded
    //    O(n·k) algorithm with early exit and returns -1 past the bound,
    //    instead of filling the full O(n²) matrix per pair.
    a.join(b, Seq("blk"))
      .filter(col("id_1") < col("id_2") &&
        abs(length(col("t1")) - length(col("t2"))) <= maxDistance &&
        greatest(length(col("t1")), length(col("t2"))) -
          call_function("graft_sorted_intersect_count",
            col("sig1"), col("sig2")) <= maxDistance)
      .withColumn("distance",
        levenshtein(col("t1"), col("t2"), maxDistance).cast("long"))
      .filter(col("distance") >= 0)
      .select(col("id_1"), col("id_2"), col("distance"))
  }
}
