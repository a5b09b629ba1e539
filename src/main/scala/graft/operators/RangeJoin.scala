package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) joins — the other operator family Spark has no
  * native form for.
  *
  * Two compositions, by selectivity structure:
  *  - `keyedPointInInterval` — an equi key bounds the candidates; Spark
  *    plans key-equality + range refine as an ordinary shuffle join with a
  *    post-filter, and the per-key interval count bounds the blowup.
  *  - `binnedPointInInterval` — no key: a naive range predicate forces a
  *    nested-loop cross product. Binning is the scale path: intervals
  *    explode to the time bins they cover, points carry their single bin,
  *    the join is EQUI on the bin, and the exact range predicate refines.
  *    Each (point, interval) pair meets in exactly one bin (the point's),
  *    so no dedup is needed. Work is |P| + Σ(interval spans) join rows
  *    instead of |P|×|I|.
  *
  * Times are integral microseconds (longs) — binning never touches
  * floating point.
  */
object RangeJoin {

  def keyedPointInInterval(points: DataFrame, intervals: DataFrame, key: String,
                           pointUs: String, startUs: String, endUs: String): DataFrame =
    points.join(intervals,
      points(key) === intervals(key) &&
        points(pointUs) >= intervals(startUs) &&
        points(pointUs) < intervals(endUs))
      .drop(intervals(key))

  /** Unkeyed interval×interval OVERLAP join — the third family member:
    * both sides are interval sets (half-open [start, end)), matches are
    * pairs with `a.start < b.end AND b.start < a.end`, and no equi key
    * bounds the candidates. Binning alone is not enough here: an
    * overlapping pair shares EVERY bin its overlap region touches, so a
    * bin-equi-join + refine emits duplicates. The OWNERSHIP rule fixes
    * that without the global distinct that usually dominates binned
    * spatial joins: a pair is emitted only in the bin that contains the
    * overlap's left edge (`greatest(a.start, b.start)`), which both
    * intervals provably cover and which is unique per pair — so the
    * output is exact with zero dedup shuffle. Work is Σ(span/bin)
    * replicated rows per side plus per-bin pair counts, never |A|×|B|;
    * a hot bin splits under AQE like any equi-join.
    *
    * Output: left columns prefixed `a_`, right prefixed `b_`, plus the
    * exact `overlap_us`. Integral microseconds throughout (`div`, never
    * floating point).
    */
  def binnedIntervalOverlap(left: DataFrame, right: DataFrame,
                            startUs: String, endUs: String,
                            binUs: Long): DataFrame = {
    require(binUs > 0, "binUs must be positive")
    // degenerate intervals (end <= start) are dropped BEFORE the explode:
    // sequence(a, b) with a > b counts DOWN (the recorded trap), so one
    // inverted row would otherwise explode to every bin between its ends
    def binned(df: DataFrame, p: String) =
      df.toDF(df.columns.map(p + _): _*)
        .filter(col(s"$p$endUs") > col(s"$p$startUs"))
        .withColumn(s"__graft_${p}bin", explode(sequence(
          expr(s"$p$startUs div $binUs"), expr(s"($p$endUs - 1) div $binUs"))))
    binned(left, "a_").join(binned(right, "b_"),
        col("__graft_a_bin") === col("__graft_b_bin") && // the equi shuffle key
        col(s"a_$startUs") < col(s"b_$endUs") &&
        col(s"b_$startUs") < col(s"a_$endUs"))
      // ownership: emit only in the bin holding the overlap's left edge
      .filter(col("__graft_a_bin") ===
        expr(s"greatest(a_$startUs, b_$startUs) div $binUs"))
      .drop("__graft_a_bin", "__graft_b_bin")
      .withColumn("overlap_us",
        least(col(s"a_$endUs"), col(s"b_$endUs"))
          - greatest(col(s"a_$startUs"), col(s"b_$startUs")))
  }

  def binnedPointInInterval(points: DataFrame, intervals: DataFrame,
                            pointUs: String, startUs: String, endUs: String,
                            binUs: Long): DataFrame = {
    val p = points.withColumn("_bin", expr(s"$pointUs div $binUs"))
    // same degenerate-interval guard as binnedIntervalOverlap: an inverted
    // interval must not explode a descending bin sequence
    val iv = intervals.filter(col(endUs) > col(startUs)).withColumn("_bin",
      explode(sequence(expr(s"$startUs div $binUs"), expr(s"($endUs - 1) div $binUs"))))
    p.join(iv, Seq("_bin"))
      .filter(col(pointUs) >= col(startUs) && col(pointUs) < col(endUs))
      .drop("_bin")
  }
}
