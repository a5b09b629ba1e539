package graft

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def points = Seq(
    (1L, 100L), (2L, 150L), (3L, 200L), (4L, 999L)
  ).toDF("pid", "t_us")

  private def intervals = Seq(
    (10L, 100L, 200L), // [100, 200): catches 100, 150
    (11L, 180L, 300L)  // [180, 300): catches 200
  ).toDF("iid", "start_us", "end_us")

  test("binnedPointInInterval equals the naive range predicate") {
    val binned = RangeJoin.binnedPointInInterval(
        points, intervals, "t_us", "start_us", "end_us", binUs = 50L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals,
        $"t_us" >= $"start_us" && $"t_us" < $"end_us")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    binned shouldBe naive
    binned shouldBe Set((1L, 10L), (2L, 10L), (3L, 11L))
  }

  test("binned join produces each matching pair exactly once") {
    // interval spanning many bins; the point matches in its single bin only
    val wide = Seq((20L, 0L, 1000L)).toDF("iid", "start_us", "end_us")
    val r = RangeJoin.binnedPointInInterval(
      points, wide, "t_us", "start_us", "end_us", binUs = 10L)
    r.count() shouldBe 4 // all points once; no duplicates from multi-bin span
  }

  test("keyedPointInInterval bounds candidates by the key") {
    val kp = Seq((1L, 100L), (2L, 100L)).toDF("k", "t_us")
    val ki = Seq((1L, 50L, 150L), (2L, 500L, 600L)).toDF("k", "start_us", "end_us")
    val r = RangeJoin.keyedPointInInterval(kp, ki, "k", "t_us", "start_us", "end_us")
      .select("k").as[Long].collect()
    r shouldBe Array(1L) // user 2's point is outside its own interval
  }
}
