package graft

import graft.functions.ExactAgg
import graft.operators.Kpi
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class KpiSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events = Seq(
    // (event_id, ts, user_id, event_type, value)
    (1L, ts("2024-01-01 10:00:00"), 1L, "click", 10.0),
    (2L, ts("2024-01-01 11:00:00"), 1L, "click", 20.0),
    (3L, ts("2024-01-01 12:00:00"), 2L, "view", 30.0),
    (4L, ts("2024-01-02 09:00:00"), 2L, "click", 5.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  private def customer = Seq(
    (1L, "SEG_A"), (2L, "SEG_A")
  ).toDF("c_custkey", "c_mktsegment")

  test("dailyKpis: distinct users, exact sum, count, derived ratio") {
    val r = Kpi.dailyKpis(events, customer)
      .orderBy("event_date").collect()
    r.length shouldBe 2
    val d1 = r(0)
    d1.getAs[java.sql.Date]("event_date").toString shouldBe "2024-01-01"
    d1.getAs[Long]("unique_users") shouldBe 2L
    d1.getAs[Double]("total_value") shouldBe 60.0
    d1.getAs[Long]("event_count") shouldBe 3L
    d1.getAs[Double]("avg_value_per_user") shouldBe 30.0
  }

  test("topKPerGroup ranks by count desc with deterministic tie-break") {
    val df = Seq(
      ("g1", "a"), ("g1", "a"), ("g1", "b"), ("g1", "b"), ("g1", "c"),
      ("g2", "z")
    ).toDF("grp", "item")
    val top = Kpi.topKPerGroup(df, Seq("grp"), "item", 2)
      .select("grp", "item", "cnt", "rank").as[(String, String, Long, Int)]
      .collect().sortBy(r => (r._1, r._4))
    // a and b tie at 2; tie-break is item asc => a then b; c (cnt=1) cut
    top shouldBe Array(("g1", "a", 2L, 1), ("g1", "b", 2L, 2), ("g2", "z", 1L, 1))
  }

  test("kvItems builds composite keys and skips null-key rows") {
    val top = Seq(
      (Some("2024-01-01"), Some("SEG_A"), Some("click"), 5L, 1),
      (Some("2024-01-01"), None, Some("view"), 3L, 2) // null range key -> skipped
    ).toDF("event_date", "segment", "event_type", "cnt", "rank")
    val items = Kpi.kvItems(top, "event_date", ("segment", "event_type"), "cnt").collect()
    items.length shouldBe 1
    items(0).getAs[String]("pk") shouldBe "2024-01-01"
    items(0).getAs[String]("sk") shouldBe "SEG_A#click"
    items(0).getAs[Long]("play_count") shouldBe 5L
  }

  test("moneySum is order-independent (cents-exact) under repartitioning") {
    val vals = (1 to 1000).map(i => i * 0.01 + 0.001)
    val df1 = vals.toDF("v").repartition(1)
    val df32 = vals.toDF("v").repartition(32)
    val s1 = df1.agg(ExactAgg.moneySum(col("v")).as("s")).as[Double].head()
    val s32 = df32.agg(ExactAgg.moneySum(col("v")).as("s")).as[Double].head()
    s1 shouldBe s32 // bit-identical, not approx
  }

  test("mergeDailyAgg: delta fold equals the full recompute, new keys appear") {
    val delta = Seq(
      (5L, ts("2024-01-01 15:00:00"), 3L, "click", 2.49), // updates a key
      (6L, ts("2024-01-03 08:00:00"), 3L, "share", 1.01)  // brand-new key
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val merged = Kpi.mergeDailyAgg(Kpi.dailyAggPartial(events), delta)
      .select("event_date", "event_type", "n_events", "cents", "total_value")
      .as[(java.sql.Date, String, Long, Long, Double)].collect().toSet
    val full = Kpi.dailyAggPartial(events.unionByName(delta))
      .withColumn("total_value", col("cents").cast("double") / lit(100.0))
      .select("event_date", "event_type", "n_events", "cents", "total_value")
      .as[(java.sql.Date, String, Long, Long, Double)].collect().toSet
    merged shouldBe full
    // the updated key actually merged: 2 base clicks + 1 delta click on Jan 1
    merged.find(r => r._1.toString == "2024-01-01" && r._2 == "click")
      .get._3 shouldBe 3L
    merged.find(r => r._2 == "share").get._4 shouldBe 101L
    // re-foldable: a merge's own output (derived column included) is a
    // valid base for the next delivery
    val d2 = Seq((7L, ts("2024-01-03 09:00:00"), 4L, "share", 0.99))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val twice = Kpi.mergeDailyAgg(
        Kpi.mergeDailyAgg(Kpi.dailyAggPartial(events), delta), d2)
      .select("event_date", "event_type", "n_events", "cents", "total_value")
      .as[(java.sql.Date, String, Long, Long, Double)].collect().toSet
    val fullTwice = Kpi.dailyAggPartial(events.unionByName(delta).unionByName(d2))
      .withColumn("total_value", col("cents").cast("double") / lit(100.0))
      .select("event_date", "event_type", "n_events", "cents", "total_value")
      .as[(java.sql.Date, String, Long, Long, Double)].collect().toSet
    twice shouldBe fullTwice
  }
}
