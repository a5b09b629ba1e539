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

  test("summaryContract: booleans hold and exact columns mirror summary") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val rows = Sketches.summaryContract(docs).collect()
    rows.length should be > 0
    rows.foreach { r =>
      withClue(s"${r.getAs[String]("event_type")}: ") {
        r.getAs[Boolean]("users_in_bound") shouldBe true
        r.getAs[Boolean]("p50_in_bound") shouldBe true
      }
    }
    // the exact columns are the same aggregates summary computes
    val exact = Sketches.summary(docs)
      .select("event_type", "exact_users", "exact_p50", "n_events")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    rows.foreach { r =>
      exact(r.getAs[String]("event_type")) shouldBe
        ((r.getAs[Long]("exact_users"), r.getAs[Double]("exact_p50"),
          r.getAs[Long]("n_events")))
    }
  }

  test("count-min estimates are one-sided and within eps*N") {
    import spark.implicits._
    // skewed stream: key 1 is hot, a long tail of cold keys
    val rows = ((1 to 5000).map(_ => 1L) ++
      (1 to 5000).map(i => (i % 500 + 2).toLong)).map(Tuple1(_))
    val df = rows.toDF("k")
    val exact = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val eps = 0.001
    val n = rows.size
    val probes = Seq(1L, 2L, 100L, 999999L) // incl. an absent key
    val est = graft.operators.Sketches.cmsEstimates(df, "k", eps, 0.99, probes)
    est.foreach { case (k, e) =>
      val truth = exact.getOrElse(k, 0L)
      e should be >= truth                      // never undercounts
      e should be <= truth + (eps * n).toLong + 1 // eps*N overcount bound
    }
  }

  test("HLL sketch merge equals the full recompute exactly (non-monoid arm)") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val rng = new scala.util.Random(7)
    def mkEvents(ids: Seq[Long]) = ids.map { i =>
      (i, ts(s"2024-01-0${1 + (i % 3)} 10:00:00"), (i % 40) + rng.nextInt(3) * 0L)
    }.toDF("event_id", "ts", "user_id")
    val base = mkEvents(1L to 300L)
    val delta = mkEvents(301L to 400L) // overlapping user ids across folds
    val merged = graft.operators.Sketches.estimateUsers(
        graft.operators.Sketches.mergeDailyUserSketch(
          graft.operators.Sketches.dailyUserSketch(base), delta))
      .as[(java.sql.Date, Long)].collect().toMap
    val full = graft.operators.Sketches.estimateUsers(
        graft.operators.Sketches.dailyUserSketch(base.unionByName(delta)))
      .as[(java.sql.Date, Long)].collect().toMap
    merged shouldBe full // register-wise max union: EXACT equality, not ~
    // and a second fold accepts the first fold's output as its base
    val twice = graft.operators.Sketches.estimateUsers(
        graft.operators.Sketches.mergeDailyUserSketch(
          graft.operators.Sketches.mergeDailyUserSketch(
            graft.operators.Sketches.dailyUserSketch(base), delta),
          mkEvents(401L to 430L)))
      .collect()
    twice.length shouldBe merged.size
    // estimates track the true distinct counts within sketch error
    val exactUsers = base.unionByName(delta)
      .withColumn("d", org.apache.spark.sql.functions.to_date($"ts"))
      .groupBy("d")
      .agg(org.apache.spark.sql.functions.countDistinct($"user_id").as("n"))
      .as[(java.sql.Date, Long)].collect().toMap
    merged.foreach { case (d, est) =>
      math.abs(est - exactUsers(d)).toDouble / exactUsers(d) should be < 0.05
    }
  }
}
