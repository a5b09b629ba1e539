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

  test("AQE splits a skewed sort-merge join partition automatically") {
    // the automatic complement of saltedJoin: with broadcast off and the
    // skew thresholds lowered, AQE's OptimizeSkewedJoin splits the hot
    // partition at runtime — assert both the marker and the result
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.shuffle.partitions" -> "4")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = ((1 to 20000).map(i => (1L, s"payload_$i")) ++
        (1 to 200).map(i => ((i % 37) + 2L, s"cold_$i"))).toDF("k", "payload")
      val small = (1L to 40L).map(k => (k, s"dim_$k")).toDF("k", "name")
      val joined = big.join(small, Seq("k"))
      // run THIS query execution (count() would plan a separate one and
      // leave this AQE plan un-finalized)
      joined.queryExecution.toRdd.count() shouldBe 20200L
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin(skew=true)") &&
        plan.contains("AQEShuffleRead coalesced and skewed"),
        s"no AQE skew handling in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("skewReport: pair cost, one-sided keys, null exclusion, tie-break") {
    val left = Seq(Some(1L), Some(1L), Some(1L), Some(2L), Some(3L), None)
      .toDF("k")
    val right = Seq(Some(1L), Some(1L), Some(2L), Some(4L), None).toDF("k")
    val r = SkewJoin.skewReport(left, right, "k", 10)
      .as[(Long, Long, Long, Long)].collect()
    // cost = n_left * n_right; keys on one side only have cost 0 and sort
    // by key; the null key appears nowhere
    r shouldBe Array(
      (1L, 3L, 2L, 6L),
      (2L, 1L, 1L, 1L),
      (3L, 1L, 0L, 0L),
      (4L, 0L, 1L, 0L))
  }
}
