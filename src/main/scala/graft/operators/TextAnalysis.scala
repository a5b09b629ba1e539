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
    // empty-doc semantics (round-8 adversarial sweep finding): zero-length
    // text / zero tokens score 0.0 with 0.0 ratios. Unguarded, these
    // divisions are an ANSI-mode DIVIDE_BY_ZERO crash — and a 100 TB
    // corpus WILL contain empty documents.
    val punctRatio = when(length(col("text")) === 0, lit(0.0))
      .otherwise(nonAlnum.cast("double") / length(col("text")))
    val stopHits = size(filter(toks, t => t.isInCollection(Stopwords)))
    val stopRatio = when(nTok === 0.0, lit(0.0))
      .otherwise(stopHits.cast("double") / nTok)
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
    // STAGED projections, not one: higher-order functions (filter/
    // transform lambdas) sit outside whole-stage codegen and get no
    // common-subexpression elimination, so inlining `tris` into each of
    // dupFrac's size/array_distinct references would rebuild the trigram
    // array several times per row. Aliasing each array in its own Project
    // computes it once; CollapseProject keeps non-cheap many-referenced
    // aliases separate rather than re-inlining them. Measured 8x on the
    // sf0.1 catalog bench (7.3 s -> 0.9 s).
    val withArrays = docs.select(
      col("doc_id"),
      filter(split(col("text"), "\n"), l => l =!= lit("")).as("lns"),
      tokensWs(col("text")).as("tk"))
    // sequence(1, k) with k < 1 would generate a DESCENDING range, so the
    // below-3-token case must short-circuit to an empty array
    val withTris = withArrays.select(
      col("doc_id"), col("lns"), col("tk"),
      when(size(col("tk")) >= 3,
        transform(sequence(lit(1), size(col("tk")) - 2),
          i => concat_ws(" ", slice(col("tk"), i, lit(3)))))
        .otherwise(array().cast("array<string>")).as("tris"))
    def dupFrac(arr: Column) = when(size(arr) > 0,
      (size(arr) - size(array_distinct(arr))).cast("double") / size(arr))
      .otherwise(lit(0.0))
    withTris.select(
      col("doc_id"),
      dupFrac(col("lns")).as("dup_line_frac"),
      dupFrac(col("tk")).as("dup_token_frac"),
      dupFrac(col("tris")).as("dup_trigram_frac"))
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

  /** Global edit-distance self-join WITHOUT a block key — the scale path
    * for fuzzy matching. [[fuzzyPairs]]'s blocked all-pairs is quadratic
    * in whatever share of the corpus lands in one block (brand blocks grow
    * linearly with the corpus, so its pair count grows quadratically — the
    * sf1 bench rung measured exactly that); this operator's candidate
    * count grows with the number of TRUE matches instead.
    *
    * PassJoin-style (Li/Deng/Wang/Feng, VLDB'11 — public) pigeonhole
    * candidates: partition every string into k+1 canonical segments; if
    * ed(r, s) ≤ k with |r| ≤ |s|, at least one of r's segments survives
    * untouched and appears in s as an EXACT substring, shifted by at most
    * the edits around it. So the candidate join is an EQUI-join:
    *  - index side: each string emits its k+1 segments (seg, j, own len);
    *  - probe side: each string s emits, for every candidate shorter
    *    length l_r in [|s|-k, |s|] and segment slot j, the substrings of
    *    s with slot-j's length at positions within a ±k..+2k window of
    *    slot-j's canonical start — a WIDER window than PassJoin's exact
    *    shift bound, which only admits extra candidates (killed by the
    *    thresholded-levenshtein verify), never loses one.
    * Emission is O((k+1)²·(3k+2)) keys per string — constant per row —
    * and the join shuffles narrow (seg, j, l_r) keys, so the shape is
    * linear in the corpus with AQE free to split hot segment keys.
    *
    * Strings shorter than k+1 chars can't donate k+1 non-empty segments;
    * any two of them are trivially within k edits (each has ≤ k chars),
    * and their cross pairs against strings of length ≤ 2k are the only
    * other candidates — a bounded short-arm handled by a tiny length-
    * filtered join. Output: (id_1, id_2, distance), id_1 < id_2, exact.
    */
  def editDistancePairs(items: DataFrame, idCol: String, textCol: String,
                        maxDistance: Int): DataFrame = {
    val k = maxDistance
    editDistanceCandidatePairs(items, idCol, textCol, maxDistance)
      .withColumn("distance", levenshtein(col("t_r"), col("t_s"), k).cast("long"))
      .filter(col("distance") >= 0)
      .select(least(col("id_r"), col("id_s")).as("id_1"),
        greatest(col("id_r"), col("id_s")).as("id_2"), col("distance"))
  }

  /** The unique candidate pairs of [[editDistancePairs]] BEFORE the banded
    * levenshtein verify — the PassJoin segment fan-out, (seg, j, l_r)
    * equi-join, short-string arm, and the multi-key distinct. Exposed
    * (like `Dedup.ppjoinCandidates`) so specs can measure prune power and
    * the bench's stage probes can split candidate generation from verify
    * when a rung ratio flags q97. [[editDistancePairs]] composes on top —
    * one code path, no drift risk.
    */
  private[graft] def editDistanceCandidatePairs(
      items: DataFrame, idCol: String, textCol: String,
      maxDistance: Int): DataFrame = {
    require(maxDistance >= 1, "maxDistance must be >= 1")
    val k = maxDistance
    val m = k + 1
    // canonical segmentation of a length-l string into m parts:
    // a = l div m base length, the last (l mod m) segments get +1;
    // seg j (0-based): len_j = a + [j >= m - l%m], start_j (0-based)
    //                = j*a + max(0, j - (m - l%m))
    def segLen(lr: String, j: String) =
      s"(($lr div $m) + IF($j >= $m - $lr % $m, 1, 0))"
    def segStart(lr: String, j: String) =
      s"($j*($lr div $m) + greatest(0, $j - ($m - $lr % $m)))"

    // repartition on the id BEFORE the per-row fan-outs: a small parquet
    // input is one split, and without this the emission explodes — and
    // the join probes — run in a single task (the same inline trap the
    // ppjoin/LSH operators guard against; at 100 TB file splits provide
    // the parallelism, but the operator must not depend on input layout)
    val parts = items.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // the id keeps its native type: least/greatest and the < tie-break
    // below work on any orderable column, and a silent cast("long") would
    // null out string ids (fuzzyPairs passes ids through untouched — the
    // two APIs must agree)
    val base = items.select(col(idCol).as("id"),
      col(textCol).as("txt"),
      length(col(textCol)).cast("int").as("len"))
      .repartition(parts, col("id"))
    val long = base.filter(col("len") >= m)

    // index side: own segments, keyed by (seg, j, l_r = own length)
    // Texts ride the segment rows DELIBERATELY (round 12, measured):
    // a "shuffle ids, attach texts after the distinct" restructure (the
    // guide §8 proxy-shuffle shape) was built, verified, and REVERTED —
    // with texts at the join, Catalyst pushes the levenshtein verify
    // below the candidate distinct INTO the join condition, so only
    // VERIFIED pairs (a small fraction) ever cross the distinct
    // exchange; splitting texts off blocked that pushdown and shipped
    // all ~52M distinct candidates (sf0.1) through the exchange before
    // verifying — 10.0 s → 21.3 s warm. The verify-in-join is also why
    // the wide candidate frame never materializes in the production
    // path (the sf1 OOM note below concerns the DIAGNOSTIC that
    // materializes candidates WITHOUT the verify filter).
    val idx = long
      .select(col("id").as("id_r"), col("txt").as("t_r"), col("len").as("l_r"),
        explode(expr(
          s"""transform(sequence(0, $k), j -> named_struct(
             |  'j', j,
             |  'seg', substring(txt, CAST(${segStart("len", "j")} + 1 AS INT),
             |                   CAST(${segLen("len", "j")} AS INT))))""".stripMargin))
          .as("e"))
      .select(col("id_r"), col("t_r"), col("l_r"),
        col("e.j").as("j"), col("e.seg").as("seg"))
    // probe side: for each candidate shorter length l_r and slot j, the
    // substrings inside the shift window. sequence bounds are all
    // ascending by construction (len >= m ensures len-k <= len; the
    // position set is a filtered CONSTANT-bounds sequence, dodging
    // Spark's descending-sequence inference on empty ranges).
    //
    // Round 12: the window is tightened from the former -k..+2k to the
    // LOSSLESS shift bound |shift| + |Δ - shift| <= k (shift = p - a_j,
    // Δ = l_s - l_r): an untouched segment's position shift equals the
    // net insertions before it, so edits-before >= |shift|, and the net
    // length change after it forces edits-after >= |Δ - shift|; their
    // sum is bounded by k. Any pair within distance k still yields at
    // least one surviving (j, p) key inside the bound (the PassJoin
    // guarantee), so the candidate SET of pairs is unchanged — only
    // spurious probe keys drop (measured 52M -> see OPTIMIZATION_r12.md
    // distinct candidates at sf0.1). Verified vs the brute-force spec
    // and the full-hash oracle at sf0.01.
    val probe = long
      .select(col("id").as("id_s"), col("txt").as("t_s"), col("len").as("l_s"),
        explode(expr(
          s"""flatten(transform(sequence(greatest($m, len - $k), len), lr ->
             |  flatten(transform(sequence(0, $k), j ->
             |    transform(
             |      filter(sequence(0, ${2 * k}),
             |        d -> ${segStart("lr", "j")} - $k + d >= 0
             |         AND ${segStart("lr", "j")} - $k + d
             |             <= len - ${segLen("lr", "j")}
             |         AND abs(d - $k) + abs((len - lr) - (d - $k)) <= $k),
             |      d -> named_struct(
             |        'j', j, 'lr', lr,
             |        'seg', substring(txt,
             |          CAST(${segStart("lr", "j")} - $k + d + 1 AS INT),
             |          CAST(${segLen("lr", "j")} AS INT))))))))""".stripMargin))
          .as("e"))
      .select(col("id_s"), col("t_s"), col("l_s"),
        col("e.j").as("j"), col("e.lr").as("l_r"), col("e.seg").as("seg"))

    // the segment join MUST be sort-merge (round 7, pinned by the sf10
    // rung): both sides are Generate fan-outs, and Catalyst's static size
    // estimate for Generate is ~the input scan's, so at any large SF the
    // planner "broadcasts" a side whose RUNTIME size is ~60 rows per
    // string (measured 15.8 GiB at 100× rows — the build side alone
    // exceeds the 8 GiB broadcast hard cap and the job dies). A shuffle
    // on (seg, j, l_r) is the shape that survives any corpus size, and
    // AQE's skew rule can split hot segment buckets.
    // EXPLICIT repartition on the join keys (round 12): AQE's byte-based
    // coalescing folded the join stage to a third of the cores, but the
    // stage's cost is the JOIN OUTPUT (candidate enumeration + verify +
    // partial distinct), not its input bytes. A REPARTITION_BY_NUM
    // exchange is exempt from AQE coalescing, so the pair work keeps
    // cluster-width parallelism; width still tracks
    // spark.sql.shuffle.partitions, not a local constant.
    val longPairs = idx.repartition(parts, col("seg"), col("j"), col("l_r"))
      .hint("merge")
      .join(probe.repartition(parts, col("seg"), col("j"), col("l_r")),
        Seq("seg", "j", "l_r"))
      // shorter-indexes-into-longer gives each unequal-length pair ONE
      // direction; equal lengths appear both ways -> id order picks one
      .filter(col("l_r") < col("l_s") ||
        (col("l_r") === col("l_s") && col("id_r") < col("id_s")))

    // short arm: index strings of length <= k (any two such are within k
    // edits by construction) against ALL strings of length <= 2k
    val shortPairs = base.filter(col("len") < m)
      .select(col("id").as("id_r"), col("txt").as("t_r"), col("len").as("l_r"))
      .join(base.filter(col("len") <= 2 * k)
          .select(col("id").as("id_s"), col("txt").as("t_s"), col("len").as("l_s")),
        col("l_s") - col("l_r") <= k &&
          (col("l_r") < col("l_s") ||
            (col("l_r") === col("l_s") && col("id_r") < col("id_s"))))

    longPairs.select(col("id_r"), col("id_s"), col("t_r"), col("t_s"))
      .union(shortPairs.select(col("id_r"), col("id_s"), col("t_r"), col("t_s")))
      .distinct() // a pair can match on several (j, position) keys
  }

  /** Unigram-surprisal quality scores — the CCNet-style "perplexity against
    * a reference LM" pre-filter, with the LM being the corpus's own unigram
    * distribution and surprisal measured in INTEGER bits:
    * `bits(t) = bitlen(N) - bitlen(c(t))` (binary digit counts, a
    * floor-log2 that is within 1 bit of `-log2 c/N`). Every per-token value
    * is a small exact integer, per-doc sums are exact BIGINTs, and the one
    * double division at the end is IEEE-deterministic — hash-comparable
    * across engines, no libm `log()` anywhere. At filter-threshold
    * granularity ("drop docs whose mean surprisal is implausibly low =
    * degenerate repetition, or implausibly high = lexical soup") the
    * sub-bit precision log() would add is noise.
    *
    * Output: (doc_id, n_toks, n_oov, surprisal_bits, avg_bits); `n_oov`
    * counts tokens outside the top-`vocabK` corpus vocabulary (boundary
    * ties broken by token text). Token-less documents drop out, like every
    * tokens-exploded operator here.
    *
    * The 100 TB shape: token→frequency lookup is the textbook skew join —
    * Zipf means a handful of stopwords carry most token OCCURRENCES. The
    * frequency-split join handles it structurally: the top-`vocabK` head of
    * the count table (covering almost all occurrences) is broadcast, so
    * head tokens never shuffle; only the rare tail joins by shuffle, and
    * the tail is skew-free by construction (every tail key's count is below
    * the head cutoff). The corpus is scanned once per frequency pass
    * (counts, totals, probe) — in production the unigram table is the
    * stored artifact, refreshed with the corpus, and only the probe pass
    * runs per delivery.
    */
  /** Per-document n-gram novelty — the memorization-risk audit: for each
    * document, the fraction of its distinct word n-grams that also appear
    * in at least one OTHER document. `shared_frac` near 1 marks heavily
    * duplicated or templated text, where verbatim-memorization risk
    * concentrates; near 0 marks genuinely novel text. Output:
    * (doc_id, n_grams, n_shared, shared_frac); documents with fewer than
    * `n` tokens drop out like every grams-exploded operator here.
    *
    * Shape: distinct (doc, gram-hash) pairs → gram document frequencies
    * (map-side-combining aggregate on the hash — never a pair join) → join
    * back → per-doc aggregate. The gram→df lookup is Zipf-skewed like
    * every token join, and the same frequency-split as
    * [[unigramSurprisal]] applies: the hot-gram head (boilerplate grams —
    * most of the join volume) is broadcast, only the skew-free rare tail
    * shuffles.
    *
    * Head selection is a df-threshold RELATIVE to corpus size — a gram is
    * hot iff `df ≥ n_docs / 1024` — not an absolute top-k: a fixed head
    * covers a shrinking share of the hot grams as the vocabulary grows
    * with the corpus, silently pushing boilerplate volume back into the
    * shuffle at scale (VERDICT r4: q102's 36× sf1 reading). The relative
    * threshold gives a corpus-size-INDEPENDENT bound on both sides: head
    * size ≤ postings/(n_docs/1024) = 1024 · avg-grams-per-doc rows
    * (broadcast-safe, `hotK` caps it as insurance), and every tail key's
    * fan-in is < n_docs/1024 (skew-free by construction).
    */
  def ngramNovelty(docs: DataFrame, n: Int, hotK: Int = 1 << 20): DataFrame = {
    val parts = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val grams = docs
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .repartition(parts, col("doc_id")) // per-doc CPU before the explode
      .select(col("doc_id"),
        explode(transform(wordShinglesN(col("text"), n), g => xxhash64(g)))
          .as("gram")) // distinct within doc by construction
    val df = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val hot = df.crossJoin(broadcast(nDocs)) // 1-row corpus size
      .filter(col("df") * 1024 >= col("n_docs"))
      .orderBy(col("df").desc, col("gram").asc).limit(hotK)
      .select(col("gram"), col("df"))
    val probed = grams.join(broadcast(hot), Seq("gram"), "left")
    val head = probed.filter(col("df").isNotNull)
    val tail = probed.filter(col("df").isNull).drop("df").join(df, Seq("gram"))
    head.unionByName(tail)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("df") >= 2, 1)).as("n_shared"))
      .withColumn("shared_frac", col("n_shared").cast("double") / col("n_grams"))
  }

  def unigramSurprisal(docs: DataFrame, vocabK: Int): DataFrame = {
    val toks =
      docs.select(col("doc_id"), explode(tokensWs(col("text"))).as("token"))
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val vocab = counts.orderBy(col("c").desc, col("token").asc).limit(vocabK)
    val nTotal = toks.agg(count(lit(1)).as("n_total"))
    val probed = toks.join(broadcast(vocab), Seq("token"), "left")
    val head = probed.filter(col("c").isNotNull)
      .withColumn("in_vocab", lit(true))
    val tail = probed.filter(col("c").isNull).drop("c")
      .join(counts, Seq("token")).withColumn("in_vocab", lit(false))
    head.unionByName(tail)
      .crossJoin(broadcast(nTotal)) // 1-row total
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_toks"),
        count(when(!col("in_vocab"), 1)).as("n_oov"),
        sum((length(bin(col("n_total"))) - length(bin(col("c"))))
          .cast("long")).as("surprisal_bits"))
      .withColumn("avg_bits", col("surprisal_bits").cast("double") / col("n_toks"))
  }

  /** Positional-index phrase search: documents containing the exact token
    * sequence `phrase`, with match counts and first position — the
    * adjacency query a bag-of-words inverted index (q81) cannot answer.
    *
    * Shape: a token at position p matching phrase term i votes for a
    * candidate start p − i; a start with exactly |phrase| votes is a match
    * (for fixed start, each term index maps to a unique position, so the
    * count reaches |phrase| iff every term matched — duplicate phrase
    * terms included, since one token emits one vote per index it equals).
    * The scan keeps ONLY phrase-term occurrences (the positional posting
    * lists), so the single (doc, start) shuffle carries the posting volume
    * of |phrase| terms, not the corpus — the classic positional-index
    * phrase plan, fully distributed.
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val toks = docs
      .select(col("doc_id"),
        posexplode(tokensWs(col("text"))).as(Seq("pos", "tok")))
      .filter(col("tok").isin(phrase.distinct: _*))
    // all phrase indices this token occurrence satisfies (handles phrases
    // with repeated terms: one occurrence votes once per matching index)
    val idxArr = array(phrase.zipWithIndex.map { case (term, i) =>
      when(col("tok") === term, lit(i)) }: _*)
    toks
      .select(col("doc_id"), col("pos"),
        explode(filter(idxArr, x => x.isNotNull)).as("i"))
      .select(col("doc_id"), (col("pos") - col("i")).cast("long").as("start"))
      .filter(col("start") >= 0)
      .groupBy(col("doc_id"), col("start"))
      .agg(count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === phrase.length)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("start")).as("first_pos"))
  }

  /** Per-document BIGRAM surprisal against the corpus's own bigram LM —
    * the conditional-probability upgrade of [[unigramSurprisal]]:
    * bits(b | a) = bitlen(c(a·)) − bitlen(c(a,b)), integer bits via
    * `bin()` length so the score is engine- and partitioning-exact
    * (same trick q99 verified against DuckDB's `format('{:b}', …)`).
    *
    * Scale shape: the (a,b) count dictionary and its prefix marginal are
    * vocabulary-sized, so the dictionary-side join (counts ⋈ prefix)
    * shuffles vocab rows, never the token stream; the stream joins the
    * enriched dictionary once, with the Zipf head broadcast and only the
    * tail shuffling (q99's split-join answer to bigram skew). Docs with
    * fewer than two tokens have no bigrams and no output row — same
    * inner semantics as the oracle.
    */
  def bigramSurprisal(docs: DataFrame, hotK: Int = 1024): DataFrame = {
    val toks = tokensWs(col("text"))
    val n = size(toks)
    val stream = docs.select(col("doc_id"),
        explode(zip_with(
          slice(toks, lit(1), greatest(n - 1, lit(0))),
          slice(toks, lit(2), greatest(n - 1, lit(0))),
          (a, b) => struct(a.as("a"), b.as("b")))).as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
    val counts = stream.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c_ab"))
    val prefix = counts.groupBy(col("a")).agg(sum(col("c_ab")).as("c_a"))
    // localCheckpoint: the vocab-sized dictionary is consumed three
    // times (hot head, tail join, and its own build) — without it each
    // consumer re-runs the corpus-wide bigram aggregate
    val dict = counts.join(prefix, Seq("a"))
      .select(col("a"), col("b"), col("c_ab"),
        (length(bin(col("c_a"))) - length(bin(col("c_ab"))))
          .cast("long").as("bits"))
      .localCheckpoint()
    val hot = dict.orderBy(col("c_ab").desc, col("a").asc, col("b").asc)
      .limit(hotK).select(col("a"), col("b"), col("bits")) // Zipf head
    val probed = stream.join(broadcast(hot), Seq("a", "b"), "left")
    val head = probed.filter(col("bits").isNotNull)
    val tail = probed.filter(col("bits").isNull).drop("bits")
      .join(dict.select(col("a"), col("b"), col("bits")), Seq("a", "b"))
    head.unionByName(tail)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("bits")).as("surprisal_bits"))
      .withColumn("avg_bits",
        col("surprisal_bits").cast("double") / col("n_bigrams"))
  }

  /** Heaps-law vocabulary-growth curve: cumulative token volume vs
    * cumulative DISTINCT vocabulary at doc-ordered checkpoints
    * (bucket = doc_id div width) — the "is more data still adding new
    * words?" diminishing-returns read on a corpus.
    *
    * Scale shape: a token's contribution to the distinct curve is fully
    * determined by its FIRST bucket (min over occurrences — one shuffle
    * on token with map-side combine); per-bucket news and volumes are
    * bucket-grain aggregates; the cumulative window runs over the
    * BUCKET frame only, whose size the caller bounds via `width`
    * (checkpoint count, not corpus size).
    */
  def vocabGrowth(docs: DataFrame, width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val stream = docs.select(
        expr(s"doc_id div ${width}L").as("bucket"), // exact integer bucket
        explode(tokensWs(col("text"))).as("token"))
    val volume = stream.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_toks"))
    val news = stream.groupBy(col("token"))
      .agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    volume.join(news, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_new"))
      .select(col("bucket"), col("n_toks"), col("n_new"),
        sum(col("n_toks")).over(w).as("cum_toks"),
        sum(col("n_new")).over(w).as("cum_types"))
  }

  /** Per-source lexical-diversity report: token volume, type count,
    * hapax (once-only) count, and the integer-ppm type-token and
    * hapax-type ratios — the vocabulary-richness screen that separates
    * template-generated feeds (low TTR) from natural text.
    *
    * One (source, token) shuffle with map-side combine, then a
    * source-grain rollup of that vocabulary frame. All ratios are exact
    * BIGINT ppm divisions.
    */
  def lexicalDiversity(docs: DataFrame): DataFrame =
    docs.select(col("source"), explode(tokensWs(col("text"))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        count(when(col("c") === 1L, 1)).as("n_hapax"))
      .withColumn("ttr_ppm", expr("(n_types * 1000000) div n_tokens"))
      .withColumn("hapax_ppm", expr("(n_hapax * 1000000) div n_types"))

  /** Canary-string contamination scan: for each canary of a bounded
    * list, documents containing it and total occurrence count — the
    * secret-leak / eval-contamination screen run before any release.
    * One corpus scan with a ×|canaries| broadcast fan-out; occurrence
    * counts use the exact replace-length identity (non-overlapping
    * occurrences, identical in any engine). Backs `q249` and the
    * streaming ingest gate ([[graft.streaming.StreamingPipeline
    * .canaryGateStream]]), which runs the same scan per micro-batch.
    */
  def canaryScan(docs: DataFrame, canaries: Seq[String]): DataFrame = {
    require(canaries.nonEmpty && canaries.forall(_.nonEmpty),
      "canaries must be non-empty strings")
    val c = docs.sparkSession.range(1)
      .select(explode(array(canaries.map(lit(_)): _*)).as("canary"))
    docs.crossJoin(broadcast(c))
      .groupBy(col("canary"))
      .agg(
        count(when(expr("instr(text, canary)") > 0, 1)).as("n_docs"),
        sum(expr("(length(text) - length(replace(text, canary, '')))" +
          " div length(canary)").cast("long")).as("n_occurrences"))
  }
}
