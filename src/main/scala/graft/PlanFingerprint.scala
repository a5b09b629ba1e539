package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-plan fingerprints for the scale-critical query family —
  * the regression gate VERDICT r7 item 3 asked for.
  *
  * Round 7's q97 finding proved the residual risk class is SILENT PLAN
  * FLIPS, not code edits: Catalyst's Generate size estimate planned the
  * PassJoin segment join as a BroadcastHashJoin whose build side was
  * 15.8 GiB at sf10 — over the 8 GiB broadcast hard cap at any large
  * scale — and nothing in the test suite noticed, because every
  * correctness gate passes with either join strategy. The fingerprint
  * pins the STRATEGY: per query, the count of each join-operator kind
  * plus shuffle/broadcast exchanges and generates in the initial
  * physical plan. A code or Spark-version change that flips any of
  * these fails `PlanFingerprintSpec` against the committed
  * `tools/plan_fingerprints.txt` until the flip is re-baselined
  * deliberately (regenerate via this main + note it in BASELINE.md).
  *
  * Scope note: fingerprints are taken at sf0.001 in the spec gate, so
  * they catch CODE-side flips (a lost join hint, an equi-join condition
  * degrading to nested-loop, a new exchange). Scale-DEPENDENT flips —
  * the kind driven by size estimates crossing thresholds — are the
  * probe protocol's job; the fix for those is a pin in code (join
  * hint), which this gate then keeps pinned.
  */
object PlanFingerprint {

  /** The scale-critical family: every query whose 100× story BASELINE.md
    * tracks (the r7 verdict list) plus this round's approximate arms.
    */
  val Gated: Seq[String] = Seq(
    "q20_minhash_lsh_pairs", "q21_simhash_pairs", "q49_neardup_corpus",
    "q51_ppjoin_pairs", "q53_weighted_lsh_pairs", "q97_edit_distance_pairs",
    "q142_dup_substrings", "q154_triangles", "q194_link_scores",
    "q208_semdedup", "q321_semantic_decontaminate",
    "q326_triangles_doulion", "q327_link_scores_sampled",
    "q328_minhash_lsh_rows8", "q329_weighted_lsh_rows8",
    // round 9: the screened twins that carry the 50x claim
    "q331_minhash_lsh_screened", "q332_weighted_lsh_screened",
    // round 11 (VERDICT r10 item 3): the role-split triangle-grid family
    // — round 10's biggest plan change was guarded only by PlanShapeSpec's
    // no-BNLJ check — plus the arms-only DOULION error model
    "q19_ngram_jaccard_pairs", "q45_dedup_clusters", "q333_pair_grid_audit",
    "q334_doulion_errmodel",
    // round 12 (VERDICT r11 item 2): the iterative-graph band — the most
    // expensive catalog family (11.9/8.7/8.5/7.3 s at sf0.1, 1.86 GB
    // shuffle at sf1 for q248) had no gate entries and no beyond-sf1
    // rung record; plus the round's operator, the screened incremental
    // LSH gate arm
    "q248_label_propagation", "q174_kcore", "q268_modularity",
    "q110_pagerank", "q335_incremental_lsh_screened")

  // category -> node-name pattern over the plan tree's toString. The
  // shuffle pattern excludes BroadcastExchange and ReusedExchange via
  // lookbehind (ShuffleExchangeExec prints as bare "Exchange ...").
  private val Cats: Seq[(String, scala.util.matching.Regex)] = Seq(
    "smj" -> "SortMergeJoin".r,
    "bhj" -> "BroadcastHashJoin".r,
    "shj" -> "ShuffledHashJoin".r,
    "bnlj" -> "BroadcastNestedLoopJoin".r,
    "cart" -> "CartesianProduct".r,
    "bcast" -> "BroadcastExchange".r,
    "shuf" -> "(?<!Broadcast)(?<!Reused)Exchange".r,
    "gen" -> "Generate".r)

  def fingerprint(df: DataFrame): String = {
    val s = df.queryExecution.executedPlan.toString
    Cats.map { case (k, re) => s"$k=${re.findAllIn(s).length}" }
      .mkString(" ")
  }

  def fingerprint(spark: SparkSession, sfDir: String, name: String): String =
    fingerprint(SparkEntry.queries(name)(spark, sfDir))

  val DefaultFile = "tools/plan_fingerprints.txt"
  val DefaultSfDir = "/root/testdata/sf0.001"

  /** Parse a fingerprint file into name -> fingerprint. */
  def load(path: String): Map[String, String] =
    scala.io.Source.fromFile(path, "UTF-8").getLines()
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.indexOf(' ')
        require(i > 0, s"malformed fingerprint line (no 'name fp' split): $l")
        l.substring(0, i) -> l.substring(i + 1)
      }
      .toMap

  /** Regenerate the committed fingerprint file:
    * `runMain graft.PlanFingerprint [sfDir] [outFile] [cpus]`. The
    * default (no args) MUST use the same session shape as the spec gate
    * (local[4], 4 shuffle partitions) so the committed values are what
    * the gate recomputes.
    *
    * RUNG-SCALE pass (VERDICT r8 item 3 — the gate's scale blind spot):
    * the sf0.001 gate catches code-side flips but NOT size-ESTIMATE
    * flips, which only manifest once statistics cross planner
    * thresholds (the q97-at-sf10 class). Once per round, re-fingerprint
    * the same 15 queries at the 10x rung with the bench session shape:
    *   sbt "runMain graft.PlanFingerprint testdata-ext/sf1 \
    *        tools/plan_fingerprints_sf1.txt 32"
    * and diff against tools/plan_fingerprints.txt — a query whose join
    * strategy differs BETWEEN THE TWO SCALES is estimate-sensitive and
    * needs an explicit join hint pinned in code (which both files then
    * keep pinned). Protocol + current diff adjudication: BASELINE.md.
    */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else DefaultSfDir
    val outFile = if (args.length > 1) args(1) else DefaultFile
    val cpus = if (args.length > 2) args(2) else "4"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lines = Gated.map(n => s"$n ${fingerprint(spark, sfDir, n)}")
    val header =
      s"""# Physical-plan fingerprints of the scale-critical query family
         |# (join strategies + exchange/generate counts at $sfDir,
         |# local[$cpus] / $cpus shuffle partitions${
           if (cpus == "4") " — the PlanFingerprintSpec gate\n# environment"
           else " — the RUNG-SCALE estimate\n# sensitivity pass; diff vs tools/plan_fingerprints.txt per BASELINE.md"
         }). A diff here without a BASELINE.md note is a
         |# silent plan flip — the q97-at-sf10 failure class. Regenerate:
         |#   sbt "runMain graft.PlanFingerprint${
           if (cpus == "4") "" else s" $sfDir $outFile $cpus"}"
         |""".stripMargin
    Files.writeString(Paths.get(outFile),
      header + lines.mkString("", "\n", "\n"))
    println(s"[plan-fingerprint] wrote ${lines.length} fingerprints to $outFile")
    spark.stop()
  }
}
