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
    *
    * Full reference surface per file:
    *  - validate BOTH inputs (validate.py:59-61 validates users, songs AND
    *    streams): bad rows of each land in bad-records/, good rows in
    *    validated/ — downstream stages read only validated data;
    *  - transform writes THREE processed outputs (transform.py:53-55 —
    *    avg_metrics, top_songs, top_genres analogs), each date-partitioned;
    *  - load provisions THREE KV tables with declared hash+range key
    *    schemas (load_dynamo.py:83-117) and loads each from its transform
    *    output (load_dynamo.py:157-173).
    *
    * The enriched fact⋈dim frame feeds all three outputs: it is persisted
    * for the span of the three write actions (one scan + one broadcast join
    * total, three aggregations off the cached frame), then released.
    */
  def processFile(eventsFile: String, customer: DataFrame,
                  requiredCols: Seq[String] = Seq("user_id", "event_type", "ts"),
                  dimRequiredCols: Seq[String] = Seq("c_custkey", "c_mktsegment")): Boolean = {
    val name = Paths.get(eventsFile).getFileName.toString
    if (processedFiles().contains(name)) return false
    val rejected = rejectedFiles() // one ledger read for both checks
    if (rejected.exists(_.startsWith(name + "\t")) ||
        rejected.contains(name)) return false

    val raw = spark.read.parquet(eventsFile)
    // validate (glue_jobs/validate.py:34-47), both datasets; schema failure
    // on either input -> rejected branch, no partial outputs
    val ((good, bad), (dimGood, dimBad)) =
      try (Validation.splitGoodBad(raw, requiredCols, "events"),
        Validation.splitGoodBad(customer, dimRequiredCols, "customer"))
      catch {
        case e: Validation.MissingColumnsException =>
          markRejected(name, e.missing.mkString(","))
          return false
      }
    bad.write.mode("overwrite").parquet(s"$workDir/bad-records/events/$name")
    dimBad.write.mode("overwrite").parquet(s"$workDir/bad-records/customer/$name")
    good.write.mode("overwrite").parquet(s"$workDir/validated/events/$name")
    dimGood.write.mode("overwrite").parquet(s"$workDir/validated/customer/$name")
    val vGood = spark.read.parquet(s"$workDir/validated/events/$name")
    val vDim = spark.read.parquet(s"$workDir/validated/customer/$name")

    // transform (glue_jobs/transform.py:26-55): three processed outputs
    val enriched = Kpi.enrich(vGood, vDim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val kpis = Kpi.kpisFromEnriched(enriched)
      PartitionedSink.writeDaily(kpis, "event_date", s"$workDir/processed/daily_kpis")
      val top3 = Kpi.topKPerGroup(enriched, Seq("event_date", "segment"), "event_type", 3)
      PartitionedSink.writeDaily(top3, "event_date", s"$workDir/processed/top_types")
      val top5 = Kpi.topKPerGroup(enriched, Seq("event_date"), "segment", 5)
      PartitionedSink.writeDaily(top5, "event_date", s"$workDir/processed/top_segments")

      // load (glue_jobs/load_dynamo.py:83-175): provision with declared key
      // schemas, then load all three tables from the processed outputs
      KeyValueSink.createTableIfNotExists("DailyKpis",
        KeyValueSink.KeySchema("date", "segment"))
      KeyValueSink.createTableIfNotExists("TopTypesPerSegment",
        KeyValueSink.KeySchema("pk", "sk"))
      KeyValueSink.createTableIfNotExists("TopSegmentsPerDay",
        KeyValueSink.KeySchema("date", "segment"))
      KeyValueSink.write(Kpi.kvDailyKpis(kpis), "DailyKpis", "date", "segment")
      KeyValueSink.write(
        Kpi.kvItems(top3, "event_date", ("segment", "event_type"), "cnt"),
        "TopTypesPerSegment", "pk", "sk")
      KeyValueSink.write(Kpi.kvTopSegments(top5), "TopSegmentsPerDay", "date", "segment")
    } finally enriched.unpersist()
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

  private def alreadySeen(processed: Set[String], rejected: Set[String])
                         (name: String): Boolean =
    processed.contains(name) ||
      rejected.exists(_.startsWith(name + "\t")) || rejected.contains(name)

  /** Oldest-first inbox discovery (reference: music_etl_pipeline.py:19-25 —
    * get_next_stream_file sorts the bucket listing by LastModified and
    * takes the first unarchived key): list the inbox, sort by modification
    * time with the name as a deterministic tie-break, and return the first
    * entry in neither ledger. The listing is driver-side metadata only —
    * no data is read until the file is actually processed.
    */
  def nextFile(inboxDir: String): Option[String] = {
    val dir = Paths.get(inboxDir)
    if (!Files.isDirectory(dir)) return None
    // read each ledger ONCE per listing, not once per inbox entry
    val seen = alreadySeen(processedFiles(), rejectedFiles()) _
    val listing = Files.list(dir)
    try listing.iterator().asScala
      .map(p => (p, Files.getLastModifiedTime(p).toMillis, p.getFileName.toString))
      .toSeq
      .sortBy { case (_, mtime, name) => (mtime, name) }
      .collectFirst { case (p, _, name) if !seen(name) => p.toString }
    finally listing.close()
  }

  /** Sense → process ONE file: the DAG-trigger unit (one Airflow run picks
    * one file). Returns the chosen file's name and whether it processed
    * (false = validation-rejected); None when the inbox holds nothing new.
    */
  def processNext(inboxDir: String, customer: DataFrame,
                  requiredCols: Seq[String] = Seq("user_id", "event_type", "ts"),
                  dimRequiredCols: Seq[String] = Seq("c_custkey", "c_mktsegment")): Option[(String, Boolean)] =
    nextFile(inboxDir).map { path =>
      val name = Paths.get(path).getFileName.toString
      (name, processFile(path, customer, requiredCols, dimRequiredCols))
    }

  /** Drain the inbox oldest-first; returns the names in processing order.
    * Rejected files are recorded by their ledger and never retried, so the
    * loop always terminates.
    */
  def processAll(inboxDir: String, customer: DataFrame,
                 requiredCols: Seq[String] = Seq("user_id", "event_type", "ts"),
                 dimRequiredCols: Seq[String] = Seq("c_custkey", "c_mktsegment")): Seq[String] = {
    val out = Seq.newBuilder[String]
    var next = processNext(inboxDir, customer, requiredCols, dimRequiredCols)
    while (next.isDefined) {
      out += next.get._1
      next = processNext(inboxDir, customer, requiredCols, dimRequiredCols)
    }
    out.result()
  }
}
