package graft

import graft.operators.{Kpi, Validation}
import graft.sinks.{KeyValueSink, PartitionedSink}
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Batch orchestrator: the Spark-native form of the reference's Airflow DAG
  * (reference: dags/music_etl_pipeline.py:142-145 — sense file → idempotency
  * check → validate → transform → load → mark processed → archive).
  *
  * The ProcessedStreams DynamoDB tracking table becomes a tiny local ledger
  * file (one processed filename per line); the archive step is a file move.
  * Exactly-once per input file: a file present in the ledger is skipped.
  */
class Pipeline(spark: SparkSession, workDir: String) {
  private val ledger = Paths.get(workDir, "processed_files.txt")
  private val archiveDir = Paths.get(workDir, "archive")
  Files.createDirectories(Paths.get(workDir))
  Files.createDirectories(archiveDir)

  def processedFiles(): Set[String] =
    if (Files.exists(ledger)) Files.readAllLines(ledger).asScala.toSet else Set.empty

  private def markProcessed(name: String): Unit =
    Files.writeString(ledger, name + "\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)

  /** Files rejected by schema validation (the DAG's branch-on-validation
    * failure path, music_etl_pipeline.py's end_pipeline branch): recorded,
    * never retried, never partially transformed.
    */
  def rejectedFiles(): Set[String] = {
    val f = Paths.get(workDir, "rejected_files.txt")
    if (Files.exists(f)) Files.readAllLines(f).asScala.toSet else Set.empty
  }

  private def markRejected(name: String, reason: String): Unit =
    Files.writeString(Paths.get(workDir, "rejected_files.txt"),
      s"$name\t$reason\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)

  /** Run validate → transform → load for one input file; skip if already
    * processed (music_etl_pipeline.py:34-45). Returns true if processed.
    * A file whose schema fails validation branches to the rejected ledger
    * (no partial outputs) and returns false.
    */
  def processFile(eventsFile: String, customer: DataFrame,
                  requiredCols: Seq[String] = Seq("user_id", "event_type", "ts")): Boolean = {
    val name = Paths.get(eventsFile).getFileName.toString
    if (processedFiles().contains(name)) return false
    if (rejectedFiles().exists(_.startsWith(name + "\t")) ||
        rejectedFiles().contains(name)) return false

    val raw = spark.read.parquet(eventsFile)
    // validate (glue_jobs/validate.py); schema failure -> rejected branch
    val (good, bad) =
      try Validation.splitGoodBad(raw, requiredCols, "events")
      catch {
        case e: Validation.MissingColumnsException =>
          markRejected(name, e.missing.mkString(","))
          return false
      }
    bad.write.mode("overwrite").parquet(s"$workDir/bad-records/$name")
    // transform (glue_jobs/transform.py)
    val kpis = Kpi.dailyKpis(good, customer)
    PartitionedSink.writeDaily(kpis, "event_date", s"$workDir/processed/daily_kpis")
    val top3 = Kpi.topKPerGroup(
      Kpi.enrich(good, customer), Seq("event_date", "segment"), "event_type", 3)
    // load (glue_jobs/load_dynamo.py)
    KeyValueSink.write(
      Kpi.kvItems(top3, "event_date", ("segment", "event_type"), "cnt"),
      "TopTypesPerSegment", "pk", "sk")
    // mark processed + archive (music_etl_pipeline.py:47-63). Every Spark
    // action above has completed, so the input is no longer being read;
    // the move is an atomic same-filesystem rename for files AND parquet
    // directories.
    markProcessed(name)
    val target = archiveDir.resolve(name)
    val src = Paths.get(eventsFile)
    if (Files.exists(src))
      Files.move(src, target, StandardCopyOption.REPLACE_EXISTING)
    true
  }
}
