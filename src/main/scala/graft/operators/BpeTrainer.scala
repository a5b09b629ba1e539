package graft.operators

import graft.functions.TextFunctions.tokensWs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training — the vocabulary-induction step
  * of an LLM data pipeline (reference analog: none; LLM-pipeline mandate).
  *
  * Structure mirrors how production BPE trainers scale:
  *  1. ONE corpus-scale pass builds the word vocabulary `(word, count)` —
  *     a single shuffle over the token stream. This is the only part of
  *     training that touches corpus-sized data.
  *  2. The merge loop runs DRIVER-SIDE over that bounded frame (the
  *     distinct words of the corpus — what SentencePiece/HF trainers hold
  *     in memory), with incremental pair-count maintenance: each merge
  *     rewrites only the words that actually contain the pair and adjusts
  *     only their pair counts. Zero Spark jobs per round — at a
  *     production merge count (32k) the k-sequential-jobs structure this
  *     replaces would be driver-scheduling-bound, ~0.7 s × k.
  *
  * The vocab collect is a bounded-frame driver fetch BY DESIGN (the same
  * contract as the KMeans centroids in `Similarity.ivfKnn`): the merge
  * table is k rules of driver state, and the working set is the distinct-
  * word frame, not the corpus. `maxVocabWords` guards the bound loudly;
  * `minCount` trims the long tail before it ever reaches the driver
  * (standard practice — hapax words can't win a merge argmax that their
  * combined weight couldn't reach anyway... they CAN contribute weight,
  * so trimming is a corpus-size/VRAM trade the caller opts into).
  *
  * Deterministic everywhere: ties break on (pair_count desc, left, right)
  * with UTF-8 BYTE order for the strings — the same total order Spark's
  * UTF8String binary comparison used when this loop was Spark-side, so
  * the merge table is bit-identical to the previous structure on any
  * corpus, including non-ASCII.
  */
object BpeTrainer {

  /** Split into per-code-point symbols (Spark's `substring(word, i, 1)`
    * indexes code points, not UTF-16 chars — surrogate pairs stay whole).
    */
  private def toSyms(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** Unsigned UTF-8 byte order — UTF8String.binaryCompare's total order
    * (== code-point order), NOT String.compareTo's UTF-16 code-unit order
    * (they disagree between supplementary and U+E000..U+FFFF).
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** The non-overlapping left-to-right rewrite — the driver twin of the
    * `graft_pair_merge` kernel (which [[encode]] still applies
    * distributed); returns null when nothing merged so callers can skip
    * untouched words.
    */
  private def mergeWord(syms: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    var changed = false
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2; changed = true
      } else { out += syms(i); i += 1 }
    }
    if (changed) out.result() else null
  }

  /** Train `k` merges; returns one row per merge:
    * (merge_rank, left, right, pair_count).
    */
  def trainMerges(docs: DataFrame, k: Int, minCount: Long = 1L,
                  maxVocabWords: Long = 20L * 1000 * 1000): Seq[(Int, String, String, Long)] = {
    // stage 1: the corpus-scale pass (one shuffle), then the bounded fetch
    val vocabDf = docs
      .select(explode(tokensWs(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .localCheckpoint(false)
    val vocabSize = vocabDf.count()
    require(vocabSize <= maxVocabWords,
      s"BpeTrainer: $vocabSize distinct words exceeds maxVocabWords " +
        s"($maxVocabWords) — raise minCount to trim the tail, or raise the " +
        "budget if the driver has the memory")
    val rows = vocabDf.collect()

    // stage 2: driver-side merge loop with incremental pair accounting
    val words = new Array[Array[String]](rows.length)
    val weight = new Array[Long](rows.length)
    val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    // word indices where a pair occurs (occurrence COUNTS live in
    // pairCounts; this is the touch-list a merge must rewrite)
    val pairWords =
      scala.collection.mutable.HashMap.empty[(String, String), scala.collection.mutable.BitSet]
    def addWord(i: Int, syms: Array[String], sign: Long): Unit = {
      var j = 0
      while (j + 1 < syms.length) {
        val p = (syms(j), syms(j + 1))
        val c = pairCounts.getOrElse(p, 0L) + sign * weight(i)
        if (c == 0L) pairCounts.remove(p) else pairCounts(p) = c
        if (sign > 0) pairWords.getOrElseUpdate(p, scala.collection.mutable.BitSet.empty) += i
        j += 1
      }
      if (sign < 0) {
        // drop stale touch-list entries for pairs this word no longer has
        j = 0
        while (j + 1 < syms.length) {
          val p = (syms(j), syms(j + 1))
          if (!pairCounts.contains(p)) pairWords.remove(p)
          j += 1
        }
      }
    }
    var i = 0
    while (i < rows.length) {
      words(i) = toSyms(rows(i).getString(0))
      weight(i) = rows(i).getLong(1)
      addWord(i, words(i), 1L)
      i += 1
    }

    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    while (rank < k && pairCounts.nonEmpty) {
      // argmax by (count desc, left, right) in UTF8 byte order — a linear
      // scan per round; a lazy-deletion heap shaves this for 32k+ rounds,
      // but the scan is already vocab-bounded, not corpus-bounded
      var best: (String, String) = null
      var bestC = Long.MinValue
      pairCounts.foreach { case (p, c) =>
        if (c > bestC || (c == bestC &&
            (utf8Less(p._1, best._1) ||
              (p._1 == best._1 && utf8Less(p._2, best._2))))) {
          best = p; bestC = c
        }
      }
      merges += ((rank, best._1, best._2, bestC))
      val touched = pairWords.getOrElse(best, scala.collection.mutable.BitSet.empty).toArray
      touched.foreach { w =>
        val next = mergeWord(words(w), best._1, best._2)
        if (next != null) {
          val old = words(w)
          words(w) = next        // membership updates see the NEW word
          addWord(w, next, 1L)
          addWord(w, old, -1L)
        }
      }
      rank += 1
    }
    merges.result()
  }

  /** Apply a trained merge table: tokenize `text` into words, split words
    * to characters, then fold the merges IN RANK ORDER into one composed
    * projection — a single corpus pass whose expression depth is the
    * merge count (fine for the demo-scale tables; a production encoder
    * compiles the merge table into a longest-match trie for O(word)
    * encoding — same output, same single-pass structure).
    * Output: (word, bpe_tokens).
    */
  def encode(docs: DataFrame,
             merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val chars = expr(
      "transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    val encoded = merges.sortBy(_._1).foldLeft(chars) { case (acc, (_, l, r, _)) =>
      call_function("graft_pair_merge", acc, lit(l), lit(r))
    }
    docs.select(explode(tokensWs(col("text"))).as("word"))
      .distinct()
      .select(col("word"), encoded.as("bpe_tokens"))
  }

  /** The merge table as a DataFrame (for the query catalog). */
  def merges(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, k)
      .toDF("merge_rank", "left", "right", "pair_count")
      .select(col("merge_rank").cast("long").as("merge_rank"), col("left"),
        col("right"), col("pair_count"))
  }
}
