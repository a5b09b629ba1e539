package graft

import org.apache.spark.sql.functions._

/** The plan-fingerprint regression gate (VERDICT r7 item 3): the
  * scale-critical family's join strategies and exchange counts must
  * match the committed tools/plan_fingerprints.txt. A deliberate plan
  * change re-baselines by regenerating the file
  * (`sbt "runMain graft.PlanFingerprint"`) AND noting the flip in
  * BASELINE.md; anything else failing here is the q97 failure class —
  * a silent strategy flip that correctness tests cannot see.
  */
class PlanFingerprintSpec extends SparkTestBase {
  import spark.implicits._

  test("scale-critical family matches the committed fingerprints") {
    val committed = PlanFingerprint.load(PlanFingerprint.DefaultFile)
    PlanFingerprint.Gated.foreach { name =>
      withClue(s"$name: plan fingerprint drifted — if the new plan is " +
        "deliberate, regenerate tools/plan_fingerprints.txt and note the " +
        "flip in BASELINE.md: ") {
        committed.get(name) shouldBe defined
        PlanFingerprint.fingerprint(spark, PlanFingerprint.DefaultSfDir,
          name) shouldBe committed(name)
      }
    }
  }

  test("every gated query has a committed fingerprint and vice versa") {
    val committed = PlanFingerprint.load(PlanFingerprint.DefaultFile)
    committed.keySet shouldBe PlanFingerprint.Gated.toSet
  }

  test("negative control: a broadcast<->sort-merge flip changes the fingerprint") {
    // the r7 trap class, reproduced in miniature: the same equi-join
    // planned both ways MUST yield different fingerprints, or the gate
    // is vacuous. (q97's sf10 failure was exactly this flip, invisible
    // to every correctness test.)
    val a = (1L to 100L).toDF("k").withColumn("v", col("k") * 2)
    val b = (1L to 10L).toDF("k").withColumn("w", col("k") * 3)
    val asBroadcast = PlanFingerprint.fingerprint(
      a.join(broadcast(b), "k"))
    val asSortMerge = PlanFingerprint.fingerprint(
      a.hint("merge").join(b.hint("merge"), "k"))
    asBroadcast should not be asSortMerge
    asBroadcast should include("bhj=1")
    asSortMerge should include("smj=1")
  }
}
