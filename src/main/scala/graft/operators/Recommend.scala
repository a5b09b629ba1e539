package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Co-occurrence recommendation primitives over a bipartite (user, item)
  * graph — "users who bought X also bought Y" is a 2-hop walk, computed
  * as a self-join on the user side.
  *
  * Scale design: the pair fan-out is quadratic PER USER (C(k,2) for a
  * user with k items), so the one thing that must be bounded at 100 TB is
  * items-per-user — a crawler or power buyer with 10⁵ items would emit
  * 5×10⁹ pairs alone. `capPerUser` enforces a deterministic per-user cut
  * (smallest item ids — stable across runs and partitionings; swap the
  * rank expression for recency when a timestamp is available), applied
  * with a WindowGroupLimit-cut row_number BEFORE pairing. The self-join's
  * two sides are byte-identical frames, so the second side rides a
  * ReusedExchange — one shuffle of the capped edge list, then map-side
  * pair expansion into the aggregation.
  */
object Recommend {

  /** Top-k co-occurring item pairs: `(item1 < item2, n_users)` with a
    * total-order tie-break. `edges` must have (user, item) columns.
    */
  def coPairs(edges: DataFrame, capPerUser: Int, k: Int): DataFrame = {
    // Round 12: a basket-collect + map-side C(k,2) pair-explode variant
    // (the q157/q314/co-occurrence-edge shape) was built, verified, and
    // REVERTED here on measurement: with capPerUser = 100 the nested
    // transform/flatten materializes up-to-4950-struct arrays per user
    // before exploding, and the query regressed 3.9 -> 9.9 s (sf0.1) /
    // 17.2 -> 24.4 s (sf1). The basket shape wins only when baskets are
    // SMALL (orders ~7 items, brand sets <= 25); at ~100-item baskets
    // the streaming self-join is the right tool.
    val w = Window.partitionBy(col("user")).orderBy(col("item"))
    val capped = edges.distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= capPerUser)
      .drop("rn")
    capped.as("a")
      .join(capped.as("b"),
        col("a.user") === col("b.user") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("part_1"), col("b.item").as("part_2"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("part_1").asc, col("part_2").asc)
      .limit(k)
  }
}
