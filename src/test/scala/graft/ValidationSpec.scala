package graft

import graft.operators.Validation
import org.apache.spark.sql.functions._

class ValidationSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("click"), Some(1.0)),
    (2L, None, Some(2.0)),
    (3L, Some("view"), None),
    (4L, Some("view"), Some(4.0))
  ).toDF("event_id", "event_type", "value")

  test("splitGoodBad routes rows with any null required field to bad") {
    val (good, bad) = Validation.splitGoodBad(df, Seq("event_type", "value"), "t")
    good.select("event_id").as[Long].collect().sorted shouldBe Array(1L, 4L)
    bad.select("event_id").as[Long].collect().sorted shouldBe Array(2L, 3L)
  }

  test("good and bad partition the input exactly") {
    val (good, bad) = Validation.splitGoodBad(df, Seq("event_type", "value"), "t")
    good.count() + bad.count() shouldBe df.count()
  }

  test("requireColumns throws a typed error naming the missing columns") {
    val e = intercept[Validation.MissingColumnsException] {
      Validation.requireColumns(df, Seq("event_type", "nope", "value", "gone"), "t")
    }
    e.missing shouldBe Seq("nope", "gone")
  }

  test("corruptEvents nulls value on every 97th event_id only") {
    val ev = spark.range(0, 200).toDF("event_id").withColumn("value", lit(1.0))
    val c = Validation.corruptEvents(ev)
    c.filter(col("value").isNull).select("event_id").as[Long].collect().sorted shouldBe
      Array(0L, 97L, 194L)
  }
}
