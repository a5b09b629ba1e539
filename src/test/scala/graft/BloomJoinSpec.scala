package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def probe = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"), (1L, "f")
  ).toDF("k", "payload")

  private def build = Seq((1L, "x"), (3L, "y")).toDF("bk", "tag")

  test("bloomPrefilteredJoin equals the plain inner join") {
    val viaBloom = BloomJoin
      .bloomPrefilteredJoin(probe, build, "k", "bk", 100L, 0.03)
      .select("k", "payload", "tag").as[(Long, String, String)]
      .collect().sorted
    val plain = probe.join(build, col("k") === col("bk"))
      .select("k", "payload", "tag").as[(Long, String, String)]
      .collect().sorted
    viaBloom shouldBe plain
    viaBloom.map(_._1).toSeq shouldBe Seq(1L, 1L, 3L)
  }

  test("bloomPrefilteredJoin works when both sides name the key identically") {
    val b = Seq((1L, "x")).toDF("k", "tag")
    val r = BloomJoin.bloomPrefilteredJoin(
        probe.select(col("k"), col("payload")), b, "k", "k", 100L, 0.03)
      .select("payload", "tag").as[(String, String)].collect().sorted
    r shouldBe Array(("a", "x"), ("f", "x"))
  }

  test("bloom probe never false-negatives on build keys") {
    val keys = (1L to 5000L).map(k => Tuple1(k)).toDF("bk")
    val bytes = BloomJoin.buildBloom(keys, "bk", 5000L, 0.01)
    val survivors = keys.select(col("bk"))
      .filter(call_function("graft_bloom_might_contain", col("bk"), lit(bytes)))
      .count()
    survivors shouldBe 5000L
  }

  test("bloom probe prunes most absent keys at the stated fpp") {
    val bytes = BloomJoin.buildBloom(build, "bk", 100L, 0.01)
    val absent = (1000L to 3000L).map(k => Tuple1(k)).toDF("k")
    val passed = absent
      .filter(call_function("graft_bloom_might_contain", col("k"), lit(bytes)))
      .count()
    // 2001 absent keys at fpp 0.01 -> expect ~20 false positives; allow 5x
    assert(passed <= 100L, s"bloom passed $passed of 2001 absent keys")
  }

  test("null probe keys are dropped by the prefilter, matching join semantics") {
    val withNull = Seq(Some(1L), None, Some(9L)).toDF("k")
    val bytes = BloomJoin.buildBloom(build, "bk", 100L, 0.01)
    val kept = withNull
      .filter(call_function("graft_bloom_might_contain", col("k"), lit(bytes)))
      .as[Long].collect()
    kept shouldBe Array(1L)
  }

  test("empty build side: result is the empty inner join, not a crash") {
    // round-9 empty-facts sweep finding: Spark's stat.bloomFilter NPEs on
    // zero input rows ("buf is null"), and the q65 crash hid behind the
    // compare gate's stale-dump trap (also closed: tools/compare.py now
    // fails oracle keys with no dump). buildBloom substitutes an
    // explicitly-empty filter — mightContain false for every key — so the
    // prefiltered join equals the (empty) plain join, schema intact.
    val emptyBuild = build.filter(lit(false))
    val viaBloom = BloomJoin
      .bloomPrefilteredJoin(probe, emptyBuild, "k", "bk", fpp = 0.03)
    viaBloom.columns.toSeq shouldBe Seq("k", "payload", "bk", "tag")
    viaBloom.count() shouldBe 0L
    // the fixed-capacity path too (expectedItems > 0 skips the count)
    BloomJoin.bloomPrefilteredJoin(probe, emptyBuild, "k", "bk", 100L, 0.03)
      .count() shouldBe 0L
  }

  test("the prefilter sits below the join in the physical plan") {
    // a file-backed probe side: filters over LocalRelation constant-fold
    // at optimization time, hiding the node this test pins down
    val dir = java.nio.file.Files.createTempDirectory("bloomplan").toString
    probe.write.mode("overwrite").parquet(dir)
    val fileProbe = spark.read.parquet(dir)
    val plan = BloomJoin
      .bloomPrefilteredJoin(fileProbe, build, "k", "bk", 100L, 0.03)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_might_contain"),
      s"expected bloom probe in plan:\n$plan")
    // the probe evaluates in the scan stage, before the join
    assert(plan.indexOf("graft_bloom_might_contain") >
      plan.indexOf("Join"), s"bloom probe should be below the join:\n$plan")
  }
}
