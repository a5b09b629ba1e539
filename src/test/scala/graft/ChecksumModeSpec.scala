package graft

import org.apache.spark.sql.functions._

/** Semantic guards for q121 (order-insensitive checksum) and q122
  * (deterministic mode): the checksum must be a pure function of the row
  * SET — identical under any repartitioning — and the mode tie-break must
  * be data-determined, not plan-determined.
  */
class ChecksumModeSpec extends SparkTestBase {
  import spark.implicits._

  // THE shipped expression — q121's invariance guarantee is certified on
  // the exact string the query runs, not a copy that could drift
  private val checksumExpr = SparkEntryShared.ChecksumExpr

  test("q121 checksum is invariant under repartitioning and row order") {
    val base = Seq(
      (1L, 1, 19.99, "A"), (1L, 2, 0.01, "R"), (2L, 1, 1234.56, "N"),
      (3L, 1, 7.77, "A"), (3L, 2, 7.77, "A"), (4L, 9, 999999.99, "R"))
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag")
    def sums(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("h", expr(checksumExpr))
        .groupBy($"l_returnflag")
        .agg(expr("bit_xor(h)").as("x"), count(lit(1)).as("n"))
        .as[(String, Long, Long)].collect().sortBy(_._1)
    val a = sums(base)
    val b = sums(base.repartition(7, $"l_linenumber"))
    val c = sums(base.orderBy($"l_extendedprice".desc).coalesce(1))
    a shouldBe b
    a shouldBe c
    // and it actually detects a one-cent corruption
    val corrupt = base.withColumn("l_extendedprice",
      when($"l_orderkey" === 2L, $"l_extendedprice" + 0.01)
        .otherwise($"l_extendedprice"))
    sums(corrupt) should not equal a
  }

  test("q122 mode: highest count wins, ties go to the larger type string") {
    val ev = Seq(
      // user 1: view x2, click x1 -> view
      (1L, "view"), (1L, "view"), (1L, "click"),
      // user 2: tie view x2 / click x2 -> "view" (larger string)
      (2L, "view"), (2L, "view"), (2L, "click"), (2L, "click"),
      // user 3: single event
      (3L, "purchase"))
      .toDF("user_id", "event_type")
    val r = ev.groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"user_id")
      .agg(max(struct($"cnt", $"event_type")).as("m"))
      .select($"user_id", $"m.event_type".as("mode_type"), $"m.cnt".as("cnt"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    r shouldBe Array((1L, "view", 2L), (2L, "view", 2L), (3L, "purchase", 1L))
  }
}
