package graft.operators

import graft.functions.TextFunctions.tokensWs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training — the vocabulary-induction step
  * of an LLM data pipeline (reference analog: none; LLM-pipeline mandate).
  *
  * Structure mirrors how production BPE trainers scale:
  *  1. ONE corpus-scale pass builds the word vocabulary
  *     `(word, count)` — a single shuffle; everything after runs on that
  *     BOUNDED frame (distinct words, not the token stream).
  *  2. Each training round counts weighted adjacent symbol pairs over the
  *     vocab (map-side explode + one small shuffle), picks the most
  *     frequent pair with a total-order tie-break, and rewrites the
  *     symbol arrays with the codegen-exempt `graft_pair_merge` kernel.
  *
  * The per-round argmax is a 1-row driver fetch BY DESIGN: the merge
  * table IS the trained artifact (exactly like KMeans centroids in
  * `Similarity.ivfKnn`) — k rules of driver state, not a driver loop over
  * data. Vocab lineage is localCheckpoint'd each round so k rounds stay
  * O(1) plan depth.
  *
  * Deterministic everywhere: ties break on (left, right) lexicographic;
  * re-runs produce the identical merge table on any partitioning.
  */
object BpeTrainer {

  /** Train `k` merges; returns one row per merge:
    * (merge_rank, left, right, pair_count).
    */
  def trainMerges(docs: DataFrame, k: Int): Seq[(Int, String, String, Long)] = {
    var vocab = docs
      .select(explode(tokensWs(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .select(expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        .as("syms"), col("n"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < k && !done) {
      val top = vocab
        .filter(size(col("syms")) >= 2)
        .select(posexplode(expr("slice(syms, 1, size(syms) - 1)")), col("n"),
          col("syms"))
        .select(col("col").as("left"),
          expr("element_at(syms, pos + 2)").as("right"), col("n"))
        .groupBy(col("left"), col("right"))
        .agg(sum(col("n")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("left").asc, col("right").asc)
        .limit(1)
        .collect() // 1 row: the trained merge rule (driver state by design)
      if (top.isEmpty) done = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, c))
        val next = vocab.select(
          call_function("graft_pair_merge", col("syms"), lit(l), lit(r))
            .as("syms"), col("n"))
          .localCheckpoint()
        // checkpoint blocks free via ContextCleaner once the previous
        // round's RDD is unreachable; unpersist() would be a no-op here
        vocab = next
        rank += 1
      }
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
