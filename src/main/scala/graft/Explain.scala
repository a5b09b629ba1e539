package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-dump tool: `runMain graft.Explain <sfDir> <outFile> [query...]` —
  * writes the formatted physical plan of every (or each named) query.
  * Source material for PLANS.md and for diffing plan shapes across rounds.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outFile = if (args.length > 1) args(1) else "/tmp/graft_plans.txt"
    val names = if (args.length > 2) args.drop(2).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    names.foreach { name =>
      sb.append("== " + name + " ==\n")
      try sb.append(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(FormattedMode)).append("\n")
      catch { case e: Throwable => sb.append("ERROR: " + e.getMessage + "\n") }
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"[explain] wrote ${names.length} plans to $outFile")
    spark.stop()
  }
}
