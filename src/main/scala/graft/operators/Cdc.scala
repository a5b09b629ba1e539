package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture primitives over keyed `(k, v)` snapshots: the
  * row-level changelog between two snapshots, and its inverse — applying
  * a changelog to a base snapshot. Together they give the minimal-delta
  * replication path the reference's nightly full-reload sidesteps
  * (reference: glue_jobs/load_dynamo.py:95-117 rewrites every KV item;
  * shipping `changelog(old, new)` touches only changed keys).
  *
  * Contract: `applyChangelog(before, changelog(before, after)) == after`,
  * exactly — the spec and the q120 oracle both assert this identity.
  * PRECONDITION: snapshots are KEYED — at most one row per `k`. On a
  * duplicate key the full-outer joins fan out n×m and the identity
  * silently breaks; callers with at-least-once feeds must dedup first
  * (e.g. [[Events.dedupEvents]]). Checking uniqueness here would cost a
  * shuffle per call, so it is the caller's contract, not a runtime gate.
  *
  * Scale shape: each primitive is ONE full-outer equi-join on the key —
  * the join both sides already shuffle on, no residual state. A changelog
  * is usually tiny next to the snapshots, so Spark broadcasts it in the
  * apply; nothing here pins that choice, AQE stays free. Null keys are
  * legal: presence is tracked by literal flags, never `key IS NULL`
  * (which cannot tell an absent row from a present null-keyed one), and
  * every key comparison is null-safe (`<=>`).
  */
object Cdc {

  /** Row-level changelog: `upsert` rows (keys added or value-changed,
    * carrying the AFTER value) and `delete` rows (keys gone). Unchanged
    * keys emit nothing — the changelog size tracks churn, not snapshot
    * size. Value change is IS DISTINCT FROM (null-safe), so null→value
    * and value→null both count as changes.
    */
  def changelog(before: DataFrame, after: DataFrame): DataFrame = {
    val b = before.select(col("k").as("b_k"), col("v").as("b_v"),
      lit(1).as("b_present"))
    val a = after.select(col("k").as("a_k"), col("v").as("a_v"),
      lit(1).as("a_present"))
    b.join(a, col("b_k") <=> col("a_k"), "full_outer")
      .filter(col("b_present").isNull || col("a_present").isNull ||
        !(col("b_v") <=> col("a_v")))
      .select(
        when(col("a_present").isNotNull, col("a_k")).otherwise(col("b_k"))
          .as("k"),
        col("a_v").as("v"),
        when(col("a_present").isNull, "delete").otherwise("upsert").as("op"))
  }

  /** Apply a changelog to a base snapshot: upserts replace (or add) the
    * key's row, deletes remove it, untouched keys pass through.
    */
  def applyChangelog(base: DataFrame, changelog: DataFrame): DataFrame = {
    val b = base.select(col("k").as("b_k"), col("v").as("b_v"),
      lit(1).as("b_present"))
    val c = changelog.select(col("k").as("c_k"), col("v").as("c_v"),
      col("op"), lit(1).as("c_present"))
    b.join(c, col("b_k") <=> col("c_k"), "full_outer")
      .filter(!(col("op") <=> "delete"))
      .select(
        when(col("c_present").isNotNull, col("c_k")).otherwise(col("b_k"))
          .as("k"),
        when(col("c_present").isNotNull, col("c_v")).otherwise(col("b_v"))
          .as("v"))
  }
}
