package graft

import graft.operators.Sketches

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("sketch summary stays within error bounds of the exact values") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val rows = Sketches.summary(docs).collect()
    rows.length should be > 0
    rows.foreach { r =>
      val approxU = r.getAs[Long]("approx_users").toDouble
      val exactU = r.getAs[Long]("exact_users").toDouble
      // HLL++ at rsd=0.05: allow 3 sigma
      math.abs(approxU - exactU) / exactU should be <= 0.15
      val approxP = r.getAs[Double]("approx_p50")
      val exactP = r.getAs[Double]("exact_p50")
      // approx_percentile returns an actual data value near the true median
      math.abs(approxP - exactP) / math.max(exactP, 1.0) should be <= 0.10
    }
  }
}
