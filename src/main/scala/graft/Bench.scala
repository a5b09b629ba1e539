package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run the headline queries on
  * SPARK_GRAFT_SF_DIR and print ONE JSON line.
  *
  * Each query is fully materialized through the noop sink (a bare `count()`
  * would let Catalyst prune most of the work for scan-shaped queries).
  * Two timed runs per query, min taken — first run pays JIT/codegen warmup.
  */
object Bench {
  val Headline: Seq[String] = Seq(
    "q03_daily_kpis", "q07_pricing_summary", "q08_top_parts_brand_month",
    "q09_revenue_by_nation", "q19_ngram_jaccard_pairs", "q22_knn_brute",
    // dedup family, tracked from round 2 (baseline rows in BASELINE.md)
    "q20_minhash_lsh_pairs", "q45_dedup_clusters", "q47_fuzzy_part_names",
    "q49_neardup_corpus",
    // global set-similarity + decontamination, tracked late round 2
    "q51_ppjoin_pairs", "q55_decontaminate")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    val results = Headline.map { name =>
      val t = try math.min(runOnce(name), runOnce(name))
              catch { case e: Throwable =>
                System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
