package graft

import graft.operators.Recommend

class RecommendSpec extends SparkTestBase {
  import spark.implicits._

  test("coPairs counts distinct co-occurring users per pair") {
    val edges = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L),
      (3L, 10L) // duplicate edge must not double-count
    ).toDF("user", "item")
    val r = Recommend.coPairs(edges, capPerUser = 10, k = 10)
      .as[(Long, Long, Long)].collect()
    r shouldBe Array((10L, 20L, 3L), (10L, 30L, 1L), (20L, 30L, 1L))
  }

  test("capPerUser bounds the quadratic fan-out deterministically") {
    // power user 1 has 5 items; cap 3 keeps the smallest item ids only
    val edges = ((1 to 5).map(i => (1L, i * 10L)) ++
      Seq((2L, 10L), (2L, 20L))).toDF("user", "item")
    val r = Recommend.coPairs(edges, capPerUser = 3, k = 100)
      .as[(Long, Long, Long)].collect()
    // user 1 contributes only pairs of {10,20,30}; user 2 adds to (10,20)
    r.toSet shouldBe Set((10L, 20L, 2L), (10L, 30L, 1L), (20L, 30L, 1L))
    // a non-binding cap equals the uncapped result
    val loose = Recommend.coPairs(edges, capPerUser = 100, k = 100)
      .as[(Long, Long, Long)].collect().toSet
    loose.size shouldBe 10 + 1 - 1 // C(5,2) pairs, (10,20) merged with user 2
  }
}
