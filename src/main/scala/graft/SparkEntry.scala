package graft

import graft.functions.ExactAgg
import graft.operators._
import graft.sources.CsvSource
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import SparkEntryShared.qDailyKpis

/** Driver contract: one `queries` entry per ☑ item in SURVEY.md §2, plus a
  * DuckDB `oracleSql` twin with IDENTICAL column names for every
  * SQL-expressible query (the driver sorts columns by name and hashes
  * values, so names and value bit-patterns must both line up).
  *
  * Exactness ground rules (what makes the hashes match AND makes results
  * reproducible on any cluster size — see SURVEY.md §4):
  *  - money sums go through integer cents (`ExactAgg`) — order-independent;
  *  - `events.ts` flows as integral epoch-micros (`ts_us`, Tables.scala) —
  *    bit-identical to DuckDB's nanos→micros truncation;
  *  - every window carries a total-order tie-break;
  *  - vector dot products are sequential left folds in double precision,
  *    mirrored 1:1 by the oracle's `list_reduce`;
  *  - `row_number`/`size`/`count` outputs are cast to BIGINT on both sides.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qDailyKpis(spark, "/root/testdata/sf0.001")

  // ---- the catalog: per-family maps concatenated (round-6 split) ----

  private lazy val allQueries: Map[String, (SparkSession, String) => DataFrame] = {
    val parts = Seq(
      SparkEntryCore.queries, SparkEntryAnalytics1.queries,
      SparkEntryAnalytics2.queries, SparkEntryAnalytics3.queries,
      SparkEntryDedup.queries,
      SparkEntryVector.queries, SparkEntryText.queries)
    val all = parts.reduce(_ ++ _)
    // a query name accidentally defined in two family files would
    // silently shadow — fail loudly instead
    require(all.size == parts.map(_.size).sum,
      "duplicate query names across SparkEntry family files")
    all
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = allQueries

  // Round 6 closed the rows-only list entirely: q83's merge recursion
  // unrolls to k SQL stages (full exact oracle), and the former LSH/
  // quantizer rows (q20/q21/q23/q26/q53/q94) carry boolean recall
  // contracts — an exact oracle-recomputable anchor plus measured recall
  // floors the oracle states as literal TRUEs.
  private lazy val allOracles: Map[String, String] = {
    val parts = Seq(
      SparkEntryCore.oracleSql, SparkEntryAnalytics1.oracleSql,
      SparkEntryAnalytics2.oracleSql, SparkEntryAnalytics3.oracleSql,
      SparkEntryDedup.oracleSql,
      SparkEntryVector.oracleSql, SparkEntryText.oracleSql)
    val all = parts.reduce(_ ++ _)
    require(all.size == parts.map(_.size).sum,
      "duplicate oracle names across SparkEntry family files")
    all
  }

  def oracleSql: Map[String, String] = allOracles
}
