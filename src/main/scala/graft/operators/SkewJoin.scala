package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the big (skewed) side, replicate the
  * small side across all salts, join on (key, salt).
  *
  * At 100 TB a handful of hot keys (the viral track, the empty-string
  * genre) can pin a shuffle join to one reducer; salting splits each hot
  * key's rows over `saltFactor` reducers at the cost of replicating the
  * small side `saltFactor`×. Result set is provably identical to the plain
  * join: every big row carries exactly one salt, and the small side is
  * present under every salt.
  *
  * AQE's skew-join handles the sort-merge case adaptively; explicit salting
  * remains the tool when AQE can't split (e.g. aggregations after the join
  * keyed on the same hot key, or hash joins under joins that must co-locate).
  */
object SkewJoin {

  /** Inner join `big ⋈ small` on `key`, spreading each key's rows across
    * `saltFactor` reducers. The salt is derived from a hash of the whole
    * big-side row — deterministic per row content, uniform across salts.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val bigCols = big.columns
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(bigCols.map(col): _*)), lit(saltFactor)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Skew DIAGNOSIS for a planned equi-join: the topK keys by estimated
    * pair cost (n_left × n_right), the number a join planner actually
    * cares about — a key can be harmless on either side alone and still
    * be the reducer that never finishes. Both sides aggregate to
    * key-cardinality frames BEFORE the (full-outer) match, so the report
    * costs two count-aggregates plus a top-k — never the join itself.
    * Null keys are excluded: an equi-join drops them, so they cannot
    * cause join skew (their scan skew shows up in Quality.profile).
    * Returns (key, n_left, n_right, cost) with a total-order tie-break.
    */
  def skewReport(left: DataFrame, right: DataFrame, key: String,
                 topK: Int): DataFrame = {
    def counts(df: DataFrame, as: String) =
      df.filter(col(key).isNotNull).groupBy(col(key))
        .agg(count(lit(1)).as(as))
    counts(left, "n_left")
      .join(counts(right, "n_right"), Seq(key), "full_outer")
      .na.fill(0L, Seq("n_left", "n_right"))
      .withColumn("cost", col("n_left") * col("n_right"))
      .orderBy(col("cost").desc, col(key))
      .limit(topK)
  }
}
