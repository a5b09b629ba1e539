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

  test("binnedIntervalOverlap: exactly-once emission, half-open edges, exact overlap") {
    val a = Seq(
      (1L, 0L, 500L),   // spans bins 0..49 at width 10
      (2L, 90L, 100L),  // touches 3's start exactly -> NO overlap (half-open)
      (3L, 700L, 710L)
    ).toDF("id", "start_us", "end_us")
    val b = Seq(
      (10L, 450L, 460L), // inside 1's span, far from its start bin
      (11L, 100L, 200L), // overlaps 1; touches 2's end -> no match with 2
      (12L, 705L, 800L)  // overlaps 3 by 5
    ).toDF("id", "start_us", "end_us")
    val r = RangeJoin.binnedIntervalOverlap(a, b, "start_us", "end_us", 10L)
      .select("a_id", "b_id", "overlap_us").as[(Long, Long, Long)]
      .collect().sorted // NOT a Set: duplicate emission must fail the spec
    // each overlapping pair appears ONCE despite sharing many bins
    r shouldBe Array((1L, 10L, 10L), (1L, 11L, 100L), (3L, 12L, 5L))
  }

  test("binnedIntervalOverlap drops degenerate intervals instead of exploding") {
    // an inverted interval would explode a DESCENDING bin sequence (the
    // recorded sequence(1, 0) trap); it must simply not participate
    val bad = Seq((1L, 1000L, 0L), (2L, 50L, 50L), (3L, 10L, 30L))
      .toDF("id", "start_us", "end_us")
    val ok = Seq((10L, 0L, 2000L)).toDF("id", "start_us", "end_us")
    val r = RangeJoin.binnedIntervalOverlap(bad, ok, "start_us", "end_us", 10L)
      .select("a_id").as[Long].collect()
    r shouldBe Array(3L) // only the well-formed interval pairs up
  }

  test("binnedIntervalOverlap equals the naive overlap join (randomized)") {
    val rng = new scala.util.Random(20260813L)
    def intervals(n: Int, idBase: Long) = (1 to n).map { i =>
      val s = rng.nextInt(10000).toLong
      (idBase + i, s, s + 1 + rng.nextInt(2000))
    }.toDF("id", "start_us", "end_us")
    val l = intervals(60, 0L)
    val r = intervals(60, 1000L)
    val binned = RangeJoin.binnedIntervalOverlap(l, r, "start_us", "end_us", 128L)
      .select("a_id", "b_id", "overlap_us").as[(Long, Long, Long)]
      .collect().sorted // sorted seq, not Set: duplicates must fail
    val naive = l.toDF("a_id", "a_s", "a_e").join(r.toDF("b_id", "b_s", "b_e"),
        $"a_s" < $"b_e" && $"b_s" < $"a_e")
      .selectExpr("a_id", "b_id", "least(a_e, b_e) - greatest(a_s, b_s)")
      .as[(Long, Long, Long)].collect().sorted
    naive should not be empty
    binned shouldBe naive
  }
}
