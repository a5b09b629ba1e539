package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph measures over an edge list — the item-importance side
  * of the co-purchase story (Recommend.coPairs ranks pairs; this ranks
  * nodes). The reference has no graph surface; PageRank is the standard
  * importance score a recommendation/curation pipeline derives from a
  * co-occurrence graph.
  *
  * Engine-portability design: ranks live as integer MICROS (1.0 =
  * 1,000,000) and every step is integer arithmetic — `div` for the
  * per-edge split and for the 0.85 damping multiply — so the result is
  * bit-exact on any engine and any partitioning (integer sums are
  * order-free; the DuckDB oracle unrolls the same iterations as chained
  * CTEs with `//`, which equals `div` for non-negative operands).
  *
  * Scale shape (100 TB): the edge list with out-degree attached is
  * materialized ONCE (localCheckpoint) and reused every round; each
  * round is the canonical two-shuffle join-aggregate (rank joins edges
  * on src, contributions aggregate on dst) over edge rows only — state
  * per round is one long per node, never the input tables. Rounds are
  * a fixed small constant (the damping factor makes convergence
  * geometric), so total work is O(iters · |E|).
  */
object Graph {

  /** `iters` rounds of damped PageRank (d = 0.85, sum-to-N convention:
    * every node's base term is 0.15) over a DISTINCT directed edge list
    * (src, dst). The graph must be dangling-free — callers with
    * symmetric edge sets (co-purchase) satisfy this by construction.
    * Output: (node, rank_micro).
    */
  def pageRankMicro(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "pageRankMicro needs at least one iteration")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgeDeg = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint()
    var rank = deg.select(col("src").as("node"),
      lit(1000000L).as("rank_micro")).localCheckpoint()
    for (_ <- 1 to iters) {
      rank = edgeDeg
        .join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"), expr("rank_micro div outdeg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(85 * s) div 100")).as("rank_micro"))
        .localCheckpoint()
    }
    rank
  }
}
