package graft

import graft.operators.Events
import java.sql.Timestamp

class EventsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize starts a new session when the gap exceeds the threshold") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:10:00"), 1L), // 10 min gap -> same session
      (3L, ts("2024-01-01 11:00:00"), 1L), // 50 min gap -> new session
      (4L, ts("2024-01-01 10:00:00"), 2L)
    ).toDF("event_id", "ts", "user_id")
    val r = Events.sessionize(ev, 30).as[(Long, Long, Long)].collect().sortBy(_._1)
    r shouldBe Array((1L, 3L, 2L), (2L, 1L, 1L))
  }

  test("sessionize boundary: a gap of exactly the threshold does NOT split") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:30:00"), 1L) // exactly 30 min -> not > threshold
    ).toDF("event_id", "ts", "user_id")
    Events.sessionize(ev, 30).as[(Long, Long, Long)].head()._3 shouldBe 1L
  }

  test("dedupEvents keeps the lowest event_id per (user_id, ts)") {
    val ev = Seq(
      (7L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (3L, ts("2024-01-01 10:00:00"), 1L, "click_dup"), // same key, lower id wins
      (9L, ts("2024-01-01 11:00:00"), 1L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val kept = Events.dedupEvents(ev).select("event_id").as[Long].collect().sorted
    kept shouldBe Array(3L, 9L)
  }

  test("latestDate keeps only rows of the max event date") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-03 10:00:00")),
      (3L, ts("2024-01-03 23:00:00"))
    ).toDF("event_id", "ts")
    val r = Events.latestDate(ev).select("event_id").as[Long].collect().sorted
    r shouldBe Array(2L, 3L)
  }
}
