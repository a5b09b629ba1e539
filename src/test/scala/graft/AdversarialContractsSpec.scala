package graft

import org.apache.spark.sql.functions._
import graft.functions.ExactAgg
import graft.operators.{AsofJoin, Cdc, Events}

/** Round-9 adversarial-sweep contracts, pinned at unit level so the
  * hostile corpora (testdata-ext/advA0.01 / advE0.01 / advD0.01) are not
  * the only thing holding them. Each test names the defect the sweep
  * found; see ADVERSARIAL_r09.json for the sweep record.
  */
class AdversarialContractsSpec extends SparkTestBase {
  import spark.implicits._

  test("scaledLong quarantines non-finite money to NULL (not 0, not a crash)") {
    // the trap is double-layered: Spark's floor(double) returns BIGINT
    // and converts NaN to 0 SILENTLY (NaN money = $0.00) while ±Inf
    // saturates to ±Long.MaxValue whose ANSI sum then overflows the job.
    // The kernel guards the DOUBLE before flooring.
    val df = Seq(
      1.01, -2.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1e300).toDF("v")
    val got = df.select(ExactAgg.cents(col("v")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    got.toSeq shouldBe Seq(Some(101L), Some(-200L), None, None, None, None)
    // and the aggregate path survives (this exact shape crashed 28
    // catalog queries whole-job with ARITHMETIC_OVERFLOW before the fix)
    val s = df.agg(sum(ExactAgg.cents(col("v")))).head().getLong(0)
    s shouldBe -99L
  }

  test("null value stays null through the kernel") {
    val df = Seq(Some(2.0), None).toDF("v")
    val got = df.select(ExactAgg.cents(col("v"))).collect()
    got(0).getLong(0) shouldBe 200L
    got(1).isNullAt(0) shouldBe true
  }

  test("asof join: NULL keys never match (equi-join, not window, semantics)") {
    // the union+window composition PARTITIONS BY key, and window
    // partitioning groups NULLs — without the operator's right-side
    // filter, a NULL-key left row silently carried the latest NULL-key
    // right payload (200 wrong matches in the sweep)
    val left = Seq((Some(1L), 10L, "a"), (None, 10L, "b"))
      .toDF("k", "t", "tag")
    val right = Seq((Some(1L), 5L, 100L), (None, 7L, 999L))
      .toDF("k", "t", "payload")
    val out = AsofJoin.asofJoin(left, right, "k", "t", "t", Seq("payload"))
      .orderBy(col("tag")).collect()
    out(0).getAs[Long]("asof_payload") shouldBe 100L // key 1 matches
    out(1).isNullAt(out(1).fieldIndex("asof_payload")) shouldBe true // NULL never
  }

  test("sessionFunnel counts NULL-user sessions (struct, not multi-col countDistinct)") {
    // Spark's count(DISTINCT a, b) drops rows where ANY column is NULL;
    // the fix counts DISTINCT struct(a, b), which keeps the NULL-user
    // session in the denominator like both engines' grouping does
    val ev = Seq(
      (1L, Some(10L), "click", 1000000L),
      (2L, Some(10L), "purchase", 2000000L),
      (3L, None: Option[Long], "view", 3000000L))
      .toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val r = Events.sessionFunnel(ev, 30, "click", "purchase").head()
    r.getAs[Long]("n_sessions") shouldBe 2L // user 10 + the NULL-user session
    r.getAs[Long]("n_converted") shouldBe 1L
  }

  test("rank statistics have finite support (NaN breaks DuckDB's quantile sort)") {
    val df = Seq(1.0, 2.0, 3.0, Double.NaN, Double.PositiveInfinity)
      .toDF("value")
    val p50 = df.agg(
      percentile(SparkEntryShared.finiteVal(col("value")), lit(0.5)))
      .head().getDouble(0)
    p50 shouldBe 2.0 // over {1,2,3}; NaN/Inf excluded by contract
  }

  test("rollup/cube on an EMPTY table emit 0 rows (the pinned Spark shape)") {
    // ANSI SQL emits an all-NULL grand-total row on empty input; Spark's
    // Expand-based rollup emits nothing. The library contract is the
    // Spark shape, mirrored in the q29/q63 oracles via HAVING count(*)>0
    val empty = spark.emptyDataset[(String, Long)].toDF("g", "v")
    empty.rollup(col("g")).agg(count(lit(1))).count() shouldBe 0L
    empty.cube(col("g")).agg(count(lit(1))).count() shouldBe 0L
  }

  test("Cdc roundtrip survives a duplicated-key feed once canonicalized first-write-wins") {
    val before = Seq((1L, Some(1.0), 100L), (1L, Some(9.0), 200L),
      (2L, Some(2.0), 150L)).toDF("k", "v", "ts_us")
    val after = Seq((1L, Some(5.0), 100L), (3L, Some(3.0), 300L))
      .toDF("k", "v", "ts_us")
    def firstWrite(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      df.withColumn("rn", row_number().over(
          Window.partitionBy(col("k")).orderBy(col("ts_us"))))
        .filter(col("rn") === 1).select(col("k"), col("v"))
    }
    val b = firstWrite(before); val a = firstWrite(after)
    val applied = Cdc.applyChangelog(b, Cdc.changelog(b, a))
      .orderBy(col("k")).collect().map(r => (r.getLong(0), r.getDouble(1)))
    applied.toSeq shouldBe Seq((1L, 5.0), (3L, 3.0))
  }

  test("attribution skips conversions whose value is non-finite (NULL cents)") {
    // under the pre-fix kernel a NaN-valued purchase attributed its
    // touches with cents = 0 (floor(NaN) = 0) — silently crediting
    // channels for unmeasurable revenue
    val ev = Seq(
      (1L, 10L, "click", 1000000L, Some(1.0)),
      (2L, 10L, "purchase", 2000000L, Some(Double.NaN)),
      (3L, 10L, "click", 3000000L, Some(1.0)),
      (4L, 10L, "purchase", 4000000L, Some(8.0)))
      .toDF("event_id", "user_id", "event_type", "ts_us", "value")
    val out = Events.linearAttribution(ev, 86400000000L, "purchase")
      .collect()
    out.length shouldBe 1
    out(0).getAs[String]("event_type") shouldBe "click"
    // click-1's nearest FOLLOWING conversion is the NaN purchase, so it
    // is dropped with it; only click-3 (nearest = the finite purchase)
    // earns credit — the NaN conversion contributes no touches at all
    out(0).getAs[Long]("n_touches") shouldBe 1L
    out(0).getAs[Long]("credit_micro") shouldBe 800000000L
  }
}
