package graft

import graft.operators.Cdc
import org.apache.spark.sql.DataFrame

class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private def snap(rows: (java.lang.Long, java.lang.Double)*): DataFrame =
    rows.toDF("k", "v")

  private val base = snap(
    (1L, 10.0), (2L, 20.0), (3L, null), (4L, 40.0), (null, 99.0))
  private val target = snap(
    (1L, 10.0),  // unchanged
    (2L, 21.0),  // value changed
    (3L, 30.0),  // null -> value counts as a change
    // 4 deleted
    (5L, 50.0),  // added
    (null, 98.0)) // null KEY row changed: presence flags must track it

  private def rows(df: DataFrame) =
    df.as[(Option[Long], Option[Double])].collect().toSet

  test("changelog emits only churn, with null-safe value and key handling") {
    val log = Cdc.changelog(base, target)
      .as[(Option[Long], Option[Double], String)].collect().toSet
    log shouldBe Set(
      (Some(2L), Some(21.0), "upsert"),
      (Some(3L), Some(30.0), "upsert"),
      (Some(4L), None, "delete"),
      (Some(5L), Some(50.0), "upsert"),
      (None, Some(98.0), "upsert"))
  }

  test("round trip: applying the changelog to the base reproduces the target exactly") {
    val rebuilt = Cdc.applyChangelog(base, Cdc.changelog(base, target))
    rows(rebuilt) shouldBe rows(target)
    rebuilt.count() shouldBe target.count()
  }

  test("empty changelog is the identity apply") {
    val rebuilt = Cdc.applyChangelog(base, Cdc.changelog(base, base))
    rows(rebuilt) shouldBe rows(base)
    Cdc.changelog(base, base).count() shouldBe 0L
  }
}
