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

  def binnedPointInInterval(points: DataFrame, intervals: DataFrame,
                            pointUs: String, startUs: String, endUs: String,
                            binUs: Long): DataFrame = {
    val p = points.withColumn("_bin", expr(s"$pointUs div $binUs"))
    val iv = intervals.withColumn("_bin",
      explode(sequence(expr(s"$startUs div $binUs"), expr(s"($endUs - 1) div $binUs"))))
    p.join(iv, Seq("_bin"))
      .filter(col(pointUs) >= col(startUs) && col(pointUs) < col(endUs))
      .drop("_bin")
  }
}
