package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Ranked retrieval over the documents table — the scoring side of the
  * search story (the inverted-index conjunctive lookup is q81). The
  * reference has no retrieval surface (its search is DynamoDB key
  * lookups, glue_jobs/load_dynamo.py:95-117); BM25 is the standard
  * corpus-ranking operator an LLM-data pipeline needs for quality-aware
  * selection and retrieval-based decontamination.
  *
  * Engine-portability design (what makes the DuckDB oracle exact):
  *   - Robertson idf WITHOUT the log: idf = (N - df + 0.5)/(df + 0.5)
  *     = (2N-2df+1)/(2df+1). Monotone in df exactly like log-idf, but
  *     rational — no libm, whose ULP differences across engines break
  *     hash-compares (BASELINE.md, "avoid log()").
  *   - All BM25 inputs (tf, df, dl, Σdl, N) are exact integers; the two
  *     double divisions appear in the same association order on both
  *     sides, so IEEE-754 determinism makes each per-term contribution
  *     bit-identical.
  *   - Each contribution is micro-rounded (floor(x·1e6 + 0.5) as long)
  *     BEFORE the cross-term sum, so the total is an order-free integer
  *     sum — no float-accumulation-order hazard.
  *
  * Scale shape (100 TB): per-term tf and dl are map-side array ops over
  * the token split — the corpus is never exploded and never shuffled.
  * Corpus stats (N, Σdl, per-term df) reduce to ONE row, broadcast back
  * over the scorer; the only wide op is the final top-k (TakeOrdered,
  * k rows per partition then k at the driver).
  */
object Retrieval {

  /** BM25 top-k with integer parameters: k1 = k1c/100, b = bc/100.
    * Output: (doc_id, dl, score_micro) — score in millionths, ordered
    * (score_micro DESC, doc_id ASC), docs with no query term dropped.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1c: Long = 120,
           bc: Long = 75, topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // stage the token split ONCE: filter()/size() are higher-order ops
    // that get neither codegen CSE nor subexpression elimination (the
    // q57 lesson, BASELINE.md), so computing them over an aliased array
    // column keeps the split at one-per-row instead of one-per-term.
    // CollapseProject leaves the stage alone because the alias is
    // consumed more than once by non-cheap expressions
    val tokenized = docs.select(col("doc_id"),
      TextFunctions.tokensWs(col("text")).as("toks"))
    val tfCols = terms.indices.map { i =>
      size(filter(col("toks"), t => t === lit(terms(i))))
        .cast("long").as(s"tf_$i")
    }
    val withTf = tokenized.select(
      col("doc_id") +: size(col("toks")).cast("long").as("dl") +: tfCols: _*)

    // corpus stats: one row — N, Σdl, df per term
    val statCols = count(lit(1)).as("n_docs") +: sum(col("dl")).as("sum_dl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0L, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)

    // contribution of term i, micro-rounded. With S = Σdl and N = n_docs:
    //   idf      = (2N - 2df + 1) / (2df + 1)
    //   tf-part  = tf·(k1c+100)·100·S
    //            / (10000·S·tf + k1c·(100-bc)·S + k1c·bc·dl·N)
    // (the tf-part is BM25's tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)) with
    // num and den both multiplied by 10000·S to clear the fractions)
    def contrib(i: Int): Column = {
      val tf = col(s"tf_$i"); val df = col(s"df_$i")
      val idf = (lit(2L) * col("n_docs") - lit(2L) * df + lit(1L))
        .cast("double") / (lit(2L) * df + lit(1L))
      val num = (tf * lit(100L * (k1c + 100L)) * col("sum_dl")).cast("double")
      val den = lit(10000L) * col("sum_dl") * tf +
        lit(k1c * (100L - bc)) * col("sum_dl") +
        lit(k1c * bc) * col("dl") * col("n_docs")
      when(tf > 0L,
        floor(idf * (num / den) * lit(1000000L) + lit(0.5)).cast("long"))
        .otherwise(lit(0L))
    }

    withTf.crossJoin(broadcast(stats))
      .withColumn("score_micro",
        terms.indices.map(contrib).reduce(_ + _))
      .filter(col("score_micro") > 0L)
      .select(col("doc_id"), col("dl"), col("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Sparse TF-IDF cosine similarity over document PAIRS via the
    * inverted index — weighted relatedness without embeddings, the
    * vector-space complement of the set-based Jaccard family.
    *
    * Engine-exactness: linear (log-free) idf in centi — idf_c =
    * (100·N) div df, an exact BIGINT — so weights w = tf·idf_c, pair
    * dot products Σ wa·wb, and squared norms are all exact integer
    * sums; doubles appear only in the final
    * cos = dot / (sqrt(nsq_a)·sqrt(nsq_b)) (IEEE sqrt and division are
    * correctly rounded, so the DuckDB twin is bit-identical). The
    * metric is DEFINED over the df-capped vocabulary: norms use the
    * same kept weights as the dot products.
    *
    * Scale shape: tokens with df > dfCap (stopwords) are dropped before
    * the pair join, so each posting list is ≤ dfCap documents and the
    * token self-join's fan-out is bounded — the standard df-cut that
    * keeps an inverted-index pair join linear in posting volume rather
    * than quadratic in corpus size. Overflow bound: each dot term is
    * ≤ (tf·100·N)²; with tf ≲ 10³ this fits int64 up to N ≈ 10⁶ docs —
    * beyond that, drop idf to deci-scale or switch the sum to DECIMAL.
    */
  def tfidfCosinePairs(docs: DataFrame, dfCap: Long,
                       minCos: Double): DataFrame = {
    val tf = docs.select(col("doc_id"),
        explode(TextFunctions.tokensWs(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
    val w = tf.join(df, Seq("token"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
      .select(col("token"), col("doc_id"),
        (col("tf") * expr("(100 * n) div df")).as("w"))
    val norms = w.groupBy(col("doc_id")).agg(sum(col("w") * col("w")).as("nsq"))
    w.as("a")
      .join(w.as("b"),
        col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
      .join(norms.select(col("doc_id").as("doc_id_1"), col("nsq").as("nsq_1")),
        Seq("doc_id_1"))
      .join(norms.select(col("doc_id").as("doc_id_2"), col("nsq").as("nsq_2")),
        Seq("doc_id_2"))
      .withColumn("cos_sim", col("dot").cast("double") /
        (sqrt(col("nsq_1").cast("double")) * sqrt(col("nsq_2").cast("double"))))
      .filter(col("cos_sim") >= minCos)
      .select(col("doc_id_1"), col("doc_id_2"), col("dot"), col("cos_sim"))
  }
}
