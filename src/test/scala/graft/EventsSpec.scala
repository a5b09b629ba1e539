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

  test("scd2 collapses runs into validity intervals, latest stays open") {
    // user 1: view,view -> click -> view; user 2: one run
    val ev = Seq(
      (1L, 1000L, 1L, "view"),
      (2L, 2000L, 1L, "view"),
      (3L, 3000L, 1L, "click"),
      (4L, 4000L, 1L, "view"),
      (5L, 1000L, 2L, "click")
    ).toDF("event_id", "ts_us", "user_id", "event_type")
    val r = Events.scd2(ev)
      .select("user_id", "run_id", "event_type", "valid_from_us",
        "valid_to_us", "n_events", "is_current")
      .as[(Long, Long, String, Long, Option[Long], Long, Boolean)]
      .collect().sortBy(x => (x._1, x._2))
    r shouldBe Array(
      (1L, 1L, "view", 1000L, Some(3000L), 2L, false),
      (1L, 2L, "click", 3000L, Some(4000L), 1L, false),
      (1L, 3L, "view", 4000L, None, 1L, true),
      (2L, 1L, "click", 1000L, None, 1L, true))
  }

  test("scd2: a null-typed event opens its own run (IS DISTINCT FROM semantics)") {
    val ev = Seq(
      (1L, 1000L, 1L, Some("view")),
      (2L, 2000L, 1L, None),          // null type -> new run, not absorbed
      (3L, 3000L, 1L, None),          // consecutive nulls -> same run
      (4L, 4000L, 1L, Some("view"))
    ).toDF("event_id", "ts_us", "user_id", "event_type")
    val r = Events.scd2(ev)
      .select("user_id", "run_id", "event_type", "n_events")
      .as[(Long, Long, Option[String], Long)].collect().sortBy(_._2)
    r shouldBe Array(
      (1L, 1L, Some("view"), 1L),
      (1L, 2L, None, 2L),
      (1L, 3L, Some("view"), 1L))
  }

  test("gapFillDaily fills missing days with zeros and carries cents forward") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, Some("click"), 10.0),
      (2L, ts("2024-01-04 10:00:00"), 1L, Some("click"), 2.5), // 2-day hole
      (3L, ts("2024-01-02 10:00:00"), 2L, Some("view"), 1.0),  // 1-day span
      (4L, ts("2024-01-03 10:00:00"), 3L, None, 5.0) // null type keeps its data
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.gapFillDaily(ev)
      .select("event_type", "day", "n_events", "cents", "cents_ffill")
      .as[(Option[String], java.sql.Date, Long, Long, Long)].collect()
      .sortBy(x => (x._1.getOrElse(""), x._2.toString))
    r.map(x => (x._1, x._2.toString, x._3, x._4, x._5)) shouldBe Array(
      (None, "2024-01-03", 1L, 500L, 500L), // null-safe join keeps the group
      (Some("click"), "2024-01-01", 1L, 1000L, 1000L),
      (Some("click"), "2024-01-02", 0L, 0L, 1000L), // hole: zeros, LOCF
      (Some("click"), "2024-01-03", 0L, 0L, 1000L),
      (Some("click"), "2024-01-04", 1L, 250L, 250L),
      (Some("view"), "2024-01-02", 1L, 100L, 100L))
  }

  test("typeTransitions counts consecutive pairs per user, exact probabilities") {
    val ev = Seq(
      (1L, 1000L, 1L, "view"),
      (2L, 2000L, 1L, "view"),
      (3L, 3000L, 1L, "click"),
      (4L, 1000L, 2L, "view"),
      (5L, 2000L, 2L, "click") // user boundary: no cross-user pair
    ).toDF("event_id", "ts_us", "user_id", "event_type")
    val r = Events.typeTransitions(ev)
      .select("from_type", "to_type", "n", "p")
      .as[(String, String, Long, Double)].collect()
      .sortBy(x => (x._1, x._2))
    r shouldBe Array(
      ("view", "click", 2L, 2.0 / 3),
      ("view", "view", 1L, 1.0 / 3))
  }

  test("userSequences orders by (ts, event_id), caps the string, counts all") {
    val ev = Seq(
      (3L, 2000L, 1L, "click"),
      (1L, 1000L, 1L, "view"),
      (2L, 1000L, 1L, "play"), // same ts: event_id breaks the tie
      (4L, 3000L, 1L, "buy"),
      (5L, 1000L, 2L, "view")
    ).toDF("event_id", "ts_us", "user_id", "event_type")
    val r = Events.userSequences(ev, cap = 3)
      .select("user_id", "n_events", "seq_str")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    r shouldBe Array(
      (1L, 4L, "view>play>click"), // capped at 3 of 4, tie-broken by id
      (2L, 1L, "view"))
  }

  test("lastTouchAttribution: nearest touch wins, lookback lapses, conv is no touch") {
    val day = 86400L * 1000000L
    val ev = Seq(
      // user 1: view then click then purchase -> credited to click (nearest)
      (1L, 1L * day, 1L, "view", 0.0),
      (2L, 2L * day, 1L, "click", 0.0),
      (3L, 3L * day, 1L, "purchase", 10.0),
      // second purchase: the preceding PURCHASE is not a touch; the click
      // at day 2 is now 9 days back -> beyond the 7-day lookback -> unattributed
      (4L, 11L * day, 1L, "purchase", 5.0),
      // user 2: purchase with no prior event at all -> unattributed
      (5L, 1L * day, 2L, "purchase", 19.99),
      // user 3: touch AFTER the purchase must not attribute (preceding only)
      (6L, 2L * day, 3L, "purchase", 1.0),
      (7L, 3L * day, 3L, "click", 0.0)
    ).toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val r = Events.lastTouchAttribution(ev, 7, "purchase")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    r shouldBe Array(
      ("click", 1L, 1000L),
      ("unattributed", 3L, 2599L)) // 500 + 1999 (half-up cents) + 100
  }

  test("linearAttribution: equal split, remainder to recent, credits sum exactly") {
    val day = 86400L * 1000000L
    val ev = Seq(
      // user 1: three touches then a 10.01 purchase — 1001 cents over 3
      // touches: base 333666666 micro, remainder 2 goes to the TWO most
      // recent (click day3: +1, view day2: +1; view day1: base only)
      (1L, 1L * day, 1L, "view", 0.0),
      (2L, 2L * day, 1L, "view", 0.0),
      (3L, 3L * day, 1L, "click", 0.0),
      (4L, 4L * day, 1L, "purchase", 10.01),
      // user 2: a touch 9 days before the purchase is out of lookback
      (5L, 1L * day, 2L, "click", 0.0),
      (6L, 10L * day, 2L, "purchase", 5.0),
      // user 3: touch AFTER the purchase never credits
      (7L, 2L * day, 3L, "purchase", 1.0),
      (8L, 3L * day, 3L, "view", 0.0)
    ).toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val r = Events.linearAttribution(ev, 7L * day, "purchase")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    // 1001 cents * 1e6 = 1001000000 micro; div 3 = 333666666 rem 2
    r shouldBe Array(
      ("click", 1L, 333666667L),
      ("view", 2L, 333666667L + 333666666L))
    // and the invariant the construction guarantees: total credit equals
    // the credited purchase's micro-cents exactly
    r.map(_._3).sum shouldBe 1001L * 1000000L
  }

  test("uShapedAttribution conserves credit exactly, including refund totals") {
    val day = 86400L * 1000000L
    val ev = Seq(
      // user 1: five touches then a -10.01 REFUND — pool = -200200000,
      // pool % 3 = -1, so the earliest middle must take a -1 (the old
      // dividend-sign formula dropped it and over-credited by 1 micro)
      (1L, 1L * day, 1L, "view", 0.0), (2L, 2L * day, 1L, "click", 0.0),
      (3L, 3L * day, 1L, "view", 0.0), (4L, 4L * day, 1L, "click", 0.0),
      (5L, 5L * day, 1L, "view", 0.0),
      (6L, 6L * day, 1L, "purchase", -10.01),
      // user 2: three touches, positive purchase (the +1 remainder path)
      (7L, 1L * day, 2L, "view", 0.0), (8L, 2L * day, 2L, "click", 0.0),
      (9L, 3L * day, 2L, "view", 0.0),
      (10L, 4L * day, 2L, "purchase", 10.01),
      // user 3: two touches, negative (half-split arm)
      (11L, 1L * day, 3L, "view", 0.0), (12L, 2L * day, 3L, "click", 0.0),
      (13L, 3L * day, 3L, "purchase", -0.03),
      // user 4: single touch, negative (take-all arm)
      (14L, 1L * day, 4L, "view", 0.0),
      (15L, 2L * day, 4L, "purchase", -5.0)
    ).toDF("event_id", "ts_us", "user_id", "event_type", "value")
    val r = Events.uShapedAttribution(ev, 7L * day, "purchase")
      .as[(String, Long, Long)].collect()
    // Σcredit = Σ conversion micro-cents EXACTLY, positive and negative
    r.map(_._3).sum shouldBe (-1001L + 1001L - 3L - 500L) * 1000000L
  }

  test("scd2 plan: one exchange on user_id feeds windows and the run groupBy") {
    val ev = Seq((1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "click"))
      .toDF("event_id", "ts_us", "user_id", "event_type")
    val plan = Events.scd2(ev).queryExecution.executedPlan.toString
    // the lag/run-id window, the (user_id, run_id) aggregate, and the
    // closing lead all ride the single user_id hash exchange
    "hashpartitioning".r.findAllIn(plan.toLowerCase).size shouldBe 1
  }
}
