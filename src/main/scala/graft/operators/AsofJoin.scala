package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the greatest
  * `rightTime <= leftTime` for the same key (LEFT semantics — unmatched
  * left rows keep nulls).
  *
  * Spark has no native as-of join; the scalable composition is
  * union → per-key time sort → last-non-null carry-forward:
  * both sides are tagged and unioned, a window partitioned by key and
  * ordered by (time, right-before-left) carries the most recent right
  * payload forward, and left rows then read their carried match.
  *
  * Cost shape at 100 TB: ONE shuffle of |L|+|R| rows on the key (the
  * window), no range-condition pair blowup (a naive `L ⋈ R ON key AND
  * rt <= lt` materializes every earlier right row per left row before its
  * per-left max — quadratic in events-per-key). This is the standard
  * union-window as-of used by time-series engines, expressed declaratively
  * so Catalyst handles partial orders/codegen.
  *
  * The right side must be unique per (key, time) — pre-aggregate it if not
  * (ties would otherwise be resolved arbitrarily on either engine).
  */
object AsofJoin {

  /** @param rightPayloadCols right columns carried onto the left rows */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightPayloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val payload = struct((rightTime +: rightPayloadCols).map(col): _*)

    // NULL-key rows must obey equi-join semantics: NULL never matches
    // NULL. The window below PARTITIONS BY key, and window partitioning
    // (unlike joins) groups NULLs together — without this filter a
    // NULL-key left row would carry the latest NULL-key RIGHT payload
    // (found by the r9 adversarial sweep: 200 NULL-user events matched
    // NULL-custkey orders). Dropping NULL-key right rows leaves the NULL
    // partition with nothing to carry, so those left rows keep NULL
    // asof columns — exactly SQL ASOF LEFT JOIN.
    val matchableRight = right.filter(col(key).isNotNull)

    val taggedRight = matchableRight.select(
      (Seq(col(key), col(rightTime).as("_t"), lit(1).as("_is_right"),
        payload.as("_r")) ++ leftCols.filterNot(_ == key).map(c => lit(null).as(c))): _*)
    val taggedLeft = left.select(
      (Seq(col(key), col(leftTime).as("_t"), lit(0).as("_is_right"),
        lit(null).cast(taggedRight.schema("_r").dataType).as("_r")) ++
        leftCols.filterNot(_ == key).map(col)): _*)

    // right rows sort before left rows at equal time => `rt <= lt` inclusive
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_is_right") === 0)
      .select(
        leftCols.map(col) ++
          rightPayloadCols.map(c => col(s"_asof.$c").as(s"asof_$c")) :+
          col(s"_asof.$rightTime").as(s"asof_$rightTime"): _*)
  }
}
