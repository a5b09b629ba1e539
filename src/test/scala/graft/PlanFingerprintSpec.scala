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

  test("rung-scale fingerprint file: no dangerous strategy at the 10x rung") {
    // VERDICT r8 item 3: the sf0.001 gate cannot see size-ESTIMATE flips,
    // so once per round the same 15 queries are re-fingerprinted at the
    // 10x rung with the bench session shape (testdata-ext/sf1, local[32])
    // into tools/plan_fingerprints_sf1.txt. Regenerating needs the sf1
    // data, so the spec gates the COMMITTED ARTIFACT, not a recompute:
    //   (a) both scales: zero cartesian products anywhere, and no
    //       broadcast-nested-loop join at the rung that isn't in the
    //       sf0.001 gate too (q97 carries one deliberate bnlj over a
    //       ONE-ROW bound frame; a NEW bnlj appearing only at scale
    //       would be an estimate-driven degradation);
    //   (b) the q97 pin holds AT SCALE: its segment join must stay
    //       sort-merge (bhj=0) in the sf1 file — the exact broadcast
    //       flip that DNF'd at sf10 before the hint;
    //   (c) every gated query appears in the sf1 file too.
    // The six benign small->large flips (broadcast at sf0.001, SMJ at
    // sf1, over corpus-derived frames with accurate scan statistics) are
    // adjudicated in BASELINE.md round 9 — they are the optimizer doing
    // its job, not the q97 class, and this spec deliberately does NOT
    // freeze them.
    val sf1File = "tools/plan_fingerprints_sf1.txt"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sf1File)),
      s"$sf1File not committed yet")
    val rung = PlanFingerprint.load(sf1File)
    rung.keySet shouldBe PlanFingerprint.Gated.toSet
    val gate = PlanFingerprint.load(PlanFingerprint.DefaultFile)
    def field(fp: String, k: String): Int =
      s"$k=(\\d+)".r.findFirstMatchIn(fp).map(_.group(1).toInt)
        .getOrElse(fail(s"no $k= in fingerprint '$fp'"))
    (rung.toSeq ++ gate.toSeq).foreach { case (name, fp) =>
      withClue(s"$name ($fp): ") { field(fp, "cart") shouldBe 0 }
    }
    PlanFingerprint.Gated.foreach { name =>
      withClue(s"$name: bnlj at the rung vs the sf0.001 gate: ") {
        field(rung(name), "bnlj") should be <= field(gate(name), "bnlj")
      }
    }
    withClue("q97's segment-join hint must keep it sort-merge at the rung " +
      "(the exact sf10 broadcast flip the pin exists for): ") {
      rung("q97_edit_distance_pairs") should include("bhj=0")
      rung("q97_edit_distance_pairs") should not include "smj=0"
    }
  }

  test("negative control: a perturbed CATALOG plan trips its committed fingerprint (VERDICT r11 item 7)") {
    // the gate's own wiring under test (the oracle gate has negative
    // controls; until round 12 the plan gate had none): take a GATED
    // catalog query whose committed fingerprint carries auto-planned
    // broadcasts (q20: bhj=3, no explicit broadcast() hints), disable
    // auto-broadcast, and recompute IN THE GATE ENVIRONMENT — the
    // fingerprint MUST differ from the committed line, i.e. exactly the
    // estimate-driven strategy flip the gate exists to catch produces a
    // red diff, not a silent pass.
    val committed = PlanFingerprint.load(PlanFingerprint.DefaultFile)
    val name = "q20_minhash_lsh_pairs"
    committed(name) should include("bhj=3") // control is meaningful
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val perturbed = PlanFingerprint.fingerprint(
        spark, PlanFingerprint.DefaultSfDir, name)
      withClue("perturbed plan vs committed fingerprint — equality here " +
        "means the gate is vacuous: ") {
        perturbed should not be committed(name)
      }
      perturbed should include("bhj=0") // every broadcast was auto-planned
    } finally spark.conf.set(key, prev)
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
