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

  test("z-ordered buckets: zero-exchange join AND tight per-file spans") {
    import org.apache.spark.sql.functions.{input_file_name, max, min, avg}
    // join key decorrelated from the two skip dimensions: every bucket
    // holds a uniform sample of the 128x128 grid, so any span tightness
    // must come from the z-banding, not the bucketing
    val facts = (for { x <- 0 until 128; y <- 0 until 128 }
      yield ((x * 131 + y * 17) % 100L, x.toLong, y.toLong))
      .toDF("k", "x", "y")
    val dims = (0 until 100).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    BucketedSink.writeBucketedZOrdered(facts, "bz_facts", "k", 8, "x", "y",
      filesPerBucket = 4)
    BucketedSink.writeBucketed(dims, "bz_dims", "k", 8)

    // 1) the join-key property survives: co-bucketed join, no Exchange
    val joined = BucketedSink.readTable(spark, "bz_facts")
      .join(BucketedSink.readTable(spark, "bz_dims"), "k")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange"
      joined.count() shouldBe 128L * 128L
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // 2) the layout property: per-file min/max rectangles are small in
    // BOTH dims (4 z-bands/bucket ~ the 4 Morton quadrants: span ~63 of
    // 127; an unordered bucket file would span ~127 in each)
    val spans = BucketedSink.readTable(spark, "bz_facts")
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .agg(avg("sx"), avg("sy")).as[(Double, Double)].head()
    assert(spans._1 < 100.0, s"x span too wide: $spans")
    assert(spans._2 < 100.0, s"y span too wide: $spans")

    // 3) bucket pruning still applies on the key filter
    val prevScan = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val one = BucketedSink.readTable(spark, "bz_facts").filter($"k" === 7L)
      one.queryExecution.executedPlan.toString should
        include("SelectedBucketsCount: 1 out of 8")
    } finally
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prevScan)
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
