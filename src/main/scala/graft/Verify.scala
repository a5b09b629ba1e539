package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names — builder-local
    // spot-checks of a new batch without re-dumping the whole catalog.
    // The driver passes exactly two args, so its behavior is unchanged.
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").filter(_.nonEmpty).toSet
      else Set.empty
    if (only.nonEmpty) {
      val unknown = only -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(s"[verify] WARNING: unknown query names: ${unknown.mkString(",")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var failed = List.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.nonEmpty && !only(name)) ()
      else try {
        val out = fn(spark, sfDir)
        // coalesce(1) preserves a 0-partition plan (e.g. an empty
        // LocalRelation on an empty input table), which writes a parquet
        // DIRECTORY with no part files — unreadable by the oracle side.
        // repartition(1) guarantees exactly one (possibly empty) file.
        val one =
          if (out.rdd.getNumPartitions == 0) out.repartition(1)
          else out.coalesce(1)
        one.write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Subset mode must also subset the oracle manifest: compare.py hard-
    // FAILs any oracle key with no dump dir (the round-9 stale-dump fix),
    // so a spot-check run that wrote 3 dumps but the full 332-key
    // oracle_sql.json would grade 329 deliberate skips as crashes.
    val oracleOut =
      if (only.isEmpty) SparkEntry.oracleSql
      else SparkEntry.oracleSql.filter { case (k, _) => only(k) }
    val json = oracleOut
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // A crashed query must not be indistinguishable from an unwritten one:
    // fail the whole run loudly (after dumping everything that did succeed).
    if (failed.nonEmpty) {
      System.err.println(
        s"[verify] ${failed.size} quer${if (failed.size == 1) "y" else "ies"} FAILED: ${failed.reverse.mkString(",")}")
      sys.exit(1)
    }
  }
}
