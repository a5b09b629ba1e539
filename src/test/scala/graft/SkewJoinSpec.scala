package graft

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin result set is identical to the plain join") {
    // heavy skew: one hot key carries most rows
    val big = ((1 to 500).map(i => (1L, s"row$i")) ++
      (1 to 20).map(i => (2L, s"cold$i")) :+ ((99L, "unmatched")))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "cold"), (3L, "nomatch"))
      .toDF("k", "name")

    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "name").as[(Long, String, String)]
      .collect().sorted
    val salted = SkewJoin.saltedJoin(big, small, "k", 8)
      .select("k", "payload", "name").as[(Long, String, String)]
      .collect().sorted
    salted shouldBe plain
    plain.length shouldBe 520
  }

  test("saltedJoin spreads a hot key across salts") {
    val big = (1 to 100).map(i => (1L, i)).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "name")
    val nSalts = SkewJoin.saltedJoin(big, small, "k", 8).count()
    nSalts shouldBe 100 // correctness; the spread itself is the plan's shape
  }
}
