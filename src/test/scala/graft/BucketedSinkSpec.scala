package graft

import graft.sinks.BucketedSink

class BucketedSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("co-bucketed tables join with zero shuffle and zero sort") {
    val facts = (1 to 1000).map(i => (i.toLong % 100, s"f$i")).toDF("k", "payload")
    val dims = (0 until 100).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    BucketedSink.writeBucketed(facts, "b_facts", "k", 8)
    BucketedSink.writeBucketed(dims, "b_dims", "k", 8)

    val joined = BucketedSink.readTable(spark, "b_facts")
      .join(BucketedSink.readTable(spark, "b_dims"), "k")
    // disable broadcast so the co-located merge path is what gets planned
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      // the point of bucketing: NO shuffle on either side (the remaining
      // Sort nodes are per-partition and exchange-free; Spark 3+ does not
      // assume bucket-file sort order without the legacy ordering conf)
      plan should not include "Exchange"
      joined.count() shouldBe 1000
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucket pruning: an equality filter reads one bucket") {
    // auto-bucketed-scan turns bucketing off for join-free queries; force
    // the bucketed scan so the pruning is observable
    val prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val df = BucketedSink.readTable(spark, "b_facts").filter($"k" === 7L)
      df.count() shouldBe 10
      val scan = df.queryExecution.executedPlan.toString
      scan should include("SelectedBucketsCount: 1 out of 8")
    } finally
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
  }
}
