package graft

import graft.operators.AsofJoin
import java.sql.Timestamp

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at or before each left time") {
    val quotes = Seq( // (sym, qt, price)
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 50.0)
    ).toDF("sym", "qt", "price")
    val trades = Seq( // (trade_id, sym, tt)
      (1L, 1L, ts("2024-01-01 09:00:00")), // before any quote -> null
      (2L, 1L, ts("2024-01-01 10:00:00")), // exactly at 10:00 -> inclusive match
      (3L, 1L, ts("2024-01-01 10:59:00")), // between -> 10:00 quote
      (4L, 1L, ts("2024-01-01 12:00:00")), // after all -> 11:00 quote
      (5L, 2L, ts("2024-01-01 11:00:00"))
    ).toDF("trade_id", "sym", "tt")

    val r = AsofJoin.asofJoin(trades, quotes, "sym", "tt", "qt", Seq("price"))
      .select("trade_id", "asof_price")
      .as[(Long, Option[Double])].collect().sortBy(_._1)
    r shouldBe Array(
      (1L, None), (2L, Some(100.0)), (3L, Some(100.0)),
      (4L, Some(110.0)), (5L, Some(50.0)))
  }

  test("asofJoin matches a window-free reference implementation on testdata") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select($"event_id", $"ts", $"user_id").limit(200)
    val ord = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(org.apache.spark.sql.functions.max($"o_orderkey").as("o_orderkey"))
      .withColumnRenamed("o_custkey", "user_id")
    val fast = AsofJoin.asofJoin(ev, ord, "user_id", "ts", "o_orderdate", Seq("o_orderkey"))
      .select("event_id", "asof_o_orderkey").as[(Long, Option[Long])]
      .collect().toMap
    // naive reference: max orderdate <= ts per event via a range join + agg
    val naive = ev.as("e").join(ord.as("o"),
        $"e.user_id" === $"o.user_id" && $"o.o_orderdate" <= $"e.ts", "left_outer")
      .groupBy($"e.event_id")
      .agg(org.apache.spark.sql.functions.max_by($"o.o_orderkey", $"o.o_orderdate").as("k"))
      .as[(Long, Option[Long])].collect().toMap
    fast shouldBe naive
  }
}
