package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered join: build a Bloom filter of the build side's keys
  * (distributed `treeAggregate` via `DataFrameStatFunctions.bloomFilter`,
  * only the ~MB bit array returns to the driver — the same driver
  * footprint as a broadcast, without needing the full rows to fit), then
  * drop probe rows whose key cannot match BEFORE the join shuffle.
  *
  * The follow-up equi-join makes the result exactly equal to the plain
  * join — Bloom false positives merely travel through the shuffle and
  * fail the real match. The win at 100 TB: when the build side filters to
  * 1% of the fact's keys, ~99% of the fact never shuffles; this is what
  * Spark's AQE `InjectRuntimeFilter` does for semi-join-able shapes,
  * exposed here as an explicit operator for when the optimizer's
  * size/selectivity heuristics won't fire (or the filter must cross a
  * stage boundary the optimizer can't see).
  *
  * Reference analog: none — the reference joins whole tables
  * (transform.py:37-40); this is the scale path for those same joins.
  */
object BloomJoin {

  /** Serialized Bloom filter of `df(key)` sized for `expectedItems` at
    * false-positive rate `fpp`. `knownEmpty` lets a caller that already
    * ran an action over `df` (e.g. the capacity `count()` in
    * [[bloomPrefilteredJoin]]) settle emptiness for free instead of
    * paying an extra `isEmpty` job here.
    */
  def buildBloom(df: DataFrame, key: String, expectedItems: Long,
                 fpp: Double, knownEmpty: Option[Boolean] = None): Array[Byte] = {
    // Spark's stat.bloomFilter NPEs on EMPTY input (its aggregate
    // returns a null buffer — found by the round-9 empty-facts sweep);
    // an explicitly-empty filter has the right semantics: mightContain
    // is false for every key, so the prefilter drops everything and the
    // join stays exactly equal to the (empty) plain join
    val bloom =
      if (knownEmpty.getOrElse(df.isEmpty))
        org.apache.spark.util.sketch.BloomFilter.create(
          math.max(64L, expectedItems), fpp)
      else df.stat.bloomFilter(key, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** `probe ⋈ build` on `probeKey = buildKey`, with the probe side
    * Bloom-prefiltered at the scan. Result is exactly the inner join.
    *
    * `expectedItems <= 0` (the default) derives the filter capacity from a
    * `count()` of the build side — one extra job over the SMALL side of
    * the join (small is the build side's contract here). A hard-coded
    * capacity that the real cardinality outgrows keeps the join correct
    * (false positives die in the real join) but silently saturates the
    * filter, and the operator's entire purpose — shuffle reduction —
    * quietly disappears; sizing from the data can't rot that way.
    */
  def bloomPrefilteredJoin(probe: DataFrame, build: DataFrame,
                           probeKey: String, buildKey: String,
                           expectedItems: Long = -1L,
                           fpp: Double = 0.01): DataFrame = {
    // default path: one count() over the small side both sizes the filter
    // AND settles emptiness, so buildBloom skips its isEmpty job; only a
    // caller-supplied capacity (no count run) pays the isEmpty check
    val (capacity, knownEmpty) =
      if (expectedItems > 0) (expectedItems, None)
      else {
        val n = build.count()
        (math.max(64L, n), Some(n == 0L))
      }
    val bytes = buildBloom(build, buildKey, capacity, fpp, knownEmpty)
    val filtered = probe.filter(call_function("graft_bloom_might_contain",
      col(probeKey), lit(bytes)))
    // frame-qualified keys: stays unambiguous when both sides name the
    // key column identically
    filtered.join(build, filtered(probeKey) === build(buildKey))
  }
}
