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
    "q328_minhash_lsh_rows8", "q329_weighted_lsh_rows8")

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
    * `runMain graft.PlanFingerprint [sfDir] [outFile]`. MUST use the same
    * session shape as the spec gate (local[4], 4 shuffle partitions) so
    * the committed values are what the gate recomputes.
    */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else DefaultSfDir
    val outFile = if (args.length > 1) args(1) else DefaultFile
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lines = Gated.map(n => s"$n ${fingerprint(spark, sfDir, n)}")
    val header =
      s"""# Physical-plan fingerprints of the scale-critical query family
         |# (join strategies + exchange/generate counts at $sfDir,
         |# local[4] / 4 shuffle partitions — the PlanFingerprintSpec gate
         |# environment). A diff here without a BASELINE.md note is a
         |# silent plan flip — the q97-at-sf10 failure class. Regenerate:
         |#   sbt "runMain graft.PlanFingerprint"
         |""".stripMargin
    Files.writeString(Paths.get(outFile),
      header + lines.mkString("", "\n", "\n"))
    println(s"[plan-fingerprint] wrote ${lines.length} fingerprints to $outFile")
    spark.stop()
  }
}
