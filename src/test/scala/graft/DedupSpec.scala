package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions.{col, count, expr, lit, sum}

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    // (doc_id, lang, text) — 1 and 2 identical after normalization; 4 near-dup of 1
    (1L, "en", "the quick brown fox jumps over the lazy dog"),
    (2L, "en", "The  Quick Brown Fox jumps over the lazy dog"),
    (3L, "en", "completely different content about spark engines"),
    (4L, "en", "the quick brown fox jumps over the lazy cat")
  ).toDF("doc_id", "lang", "text")
    .withColumn("n_chars", expr("length(text)"))

  test("exact dedup groups normalized copies, keeps min doc_id") {
    val r = Dedup.exact(docs).select("doc_id", "n_copies").as[(Long, Long)]
      .collect().sortBy(_._1)
    r.map(_._1) should contain(1L) // representative of the {1,2} group
    r.find(_._1 == 1L).get._2 shouldBe 2L
    r.length shouldBe 3 // {1,2}, {3}, {4}
  }

  test("ngramJaccardPairs finds near-dups with exact jaccard values") {
    // identical-length docs share the band; near-dups 1-4 differ by one word
    val pairs = Dedup.ngramJaccardPairs(docs, 0.5)
      .select("doc_id_1", "doc_id_2", "jaccard").as[(Long, Long, Double)]
      .collect().sortBy(p => (p._1, p._2))
    val p14 = pairs.find(p => p._1 == 1L && p._2 == 4L)
    p14 should be(defined)
    p14.get._3 should be > 0.7 // one-word difference in a 43-char doc
    pairs.map(p => (p._1, p._2)) should not contain ((1L, 3L))
  }

  test("ngramJaccardPairs jaccard matches a hand-computed value") {
    val tiny = Seq((1L, "en", "abcd"), (2L, "en", "bcde"))
      .toDF("doc_id", "lang", "text").withColumn("n_chars", expr("length(text)"))
    // shingles {abc,bcd} vs {bcd,cde}: |inter|=1, |union|=3
    val j = Dedup.ngramJaccardPairs(tiny, 0.3)
      .select("jaccard").as[Double].head()
    j shouldBe 1.0 / 3.0
  }

  test("triangle-grid split emits every in-block pair exactly once (600-doc hot block)") {
    // One (lang, band) block of 600 docs — over the 512-doc split floor, so
    // the adaptive grid is ACTIVE (g = ceil(600/512) = 2, 3 cells) and this
    // pins both halves of its contract: no pair lost across cells, no pair
    // emitted twice by the replicas. Expected set computed driver-side
    // from first principles (distinct char-3-grams, exact jaccard).
    val texts = (0 until 600).map { i =>
      val base = s"shared template text block number ${i % 30} with payload"
      if (i < 30) base else s"$base variant ${('a' + i / 30).toChar}"
    }
    val big = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, "en", t) }
      .toDF("doc_id", "lang", "text")
      .withColumn("n_chars", lit(55)) // force one band for all 180
    val got = Dedup.ngramJaccardPairs(big, 0.5)
      .select("doc_id_1", "doc_id_2", "jaccard").as[(Long, Long, Double)]
      .collect()
    got.length shouldBe got.map(p => (p._1, p._2)).distinct.length // exactly-once
    def grams(s: String): Set[String] = s.sliding(3).toSet
    val expected = (for {
      i <- texts.indices; j <- texts.indices if i < j
      a = grams(texts(i)); b = grams(texts(j))
      inter = (a & b).size
      jac = inter.toDouble / (a.size + b.size - inter)
      if jac >= 0.5
    } yield (i.toLong, j.toLong)).toSet
    expected.size should be > 1000 // the template makes the block genuinely hot
    got.map(p => (p._1, p._2)).toSet shouldBe expected
    // the jaccard VALUES agree with the driver-side computation too
    val gotMap = got.map(p => (p._1, p._2) -> p._3).toMap
    expected.take(50).foreach { case (i, j) =>
      val a = grams(texts(i.toInt)); val b = grams(texts(j.toInt))
      val inter = (a & b).size
      gotMap((i, j)) shouldBe inter.toDouble / (a.size + b.size - inter)
    }
  }

  test("pairGridAudit reports hand-computed block volumes and grid widths") {
    // block A: 600 docs in (en, band 1) -> over the 512 floor, g = 2;
    // block B: 10 docs in (en, band 10) -> g = 1. total_vol = 179 745
    // keeps cap at the 262 144 floor (179745/256 = 702 < floor).
    val docs = ((0 until 600).map(i => (i.toLong, "en", s"doc text $i", 55L)) ++
      (0 until 10).map(i => (1000L + i, "en", s"other $i", 500L)))
      .toDF("doc_id", "lang", "text", "n_chars")
    val r = Dedup.pairGridAudit(docs, 32)
      .select("band", "n_docs", "pair_vol", "g_b", "n_units", "repl_rows")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    r shouldBe Array(
      (1L, 600L, 179700L, 2L, 3L, 1800L),
      (10L, 10L, 45L, 1L, 1L, 20L))
  }

  test("minhashLshPairs recovers the high-jaccard pairs (verified candidates)") {
    val lsh = Dedup.minhashLshPairs(docs, 64, 16, 0.5)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    // exact duplicates are always found (all bands agree)
    lsh should contain((1L, 2L))
    // verification step bounds false positives
    lsh should not contain ((1L, 3L))
  }

  test("minhash signature of identical docs is identical") {
    val two = Seq((1L, "same text here"), (2L, "same text here")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(two, 32).select("mh").as[Seq[Long]].collect()
    sigs(0) shouldBe sigs(1)
  }

  test("simhashPairs: identical token streams at hamming 0, unrelated docs apart") {
    val tiny = Seq(
      (1L, "en", "spark shuffles data across the cluster"),
      (2L, "en", "spark shuffles data across the cluster"),
      (3L, "en", "ducks swim on quiet ponds at dawn today")
    ).toDF("doc_id", "lang", "text")
    val pairs = Dedup.simhashPairs(tiny, 3)
      .select("doc_id_1", "doc_id_2", "hamming").as[(Long, Long, Long)]
      .collect()
    pairs.find(p => p._1 == 1L && p._2 == 2L).map(_._3) shouldBe Some(0L)
    pairs.map(p => (p._1, p._2)) should not contain ((1L, 3L))
  }

  test("simhashPairs pigeonhole banding agrees with the all-pairs baseline") {
    // varied corpus: exact dups, one-token edits, and unrelated docs in two langs
    val words = Array("spark", "data", "cluster", "shuffle", "join", "scan",
      "parquet", "column", "row", "partition", "stage", "task")
    val corpus = (0 until 40).map { i =>
      val base = (0 until 8).map(j => words((i / 4 + j) % words.length))
      val text =
        if (i % 4 == 1) base.mkString(" ")                       // dup of i-1
        else if (i % 4 == 2) base.updated(3, "edited").mkString(" ") // near-dup
        else base.mkString(" ")
      (i.toLong, if (i % 2 == 0) "en" else "fr", text)
    }.toDF("doc_id", "lang", "text")
    val maxH = 8
    val banded = Dedup.simhashPairs(corpus, maxH)
      .select("doc_id_1", "doc_id_2", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    // all-pairs baseline straight off the signatures
    val sh = Dedup.simhash(corpus)
      .join(corpus.select(col("doc_id"), col("lang")), "doc_id")
      .select("doc_id", "lang", "simhash").as[(Long, String, Long)].collect()
    val baseline = (for {
      a <- sh; b <- sh
      if a._2 == b._2 && a._1 < b._1
      h = java.lang.Long.bitCount(a._3 ^ b._3)
      if h <= maxH
    } yield (a._1, b._1, h.toLong)).toSet
    baseline should not be empty // the corpus must actually exercise the bound
    banded shouldBe baseline
  }

  test("simhashPairs plan is a segment-bucket equi-join, not an intra-lang cross product") {
    val plan = Dedup.simhashPairs(docs, 3).queryExecution.executedPlan.toString
    plan should include("segval") // join key carries the pigeonhole segment
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("duplicateClusters: transitive closure to the min doc_id, singletons canonical") {
    val nodes = (1L to 7L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    // chain 1-2-3 (one cluster via transitivity), pair 5-6, singletons 4 and 7
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_id_1", "doc_id_2")
    val r = Dedup.duplicateClusters(nodes, pairs)
      .select("doc_id", "component", "is_canonical")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    r shouldBe Array(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 5L, false), (7L, 7L, true))
  }

  test("duplicateClusters handles a deep path graph (diameter > 5) without plan blowup") {
    val n = 12L // path 1-2-...-12: needs ~11 propagation rounds
    val nodes = (1L to n).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_id_1", "doc_id_2")
    val r = Dedup.duplicateClusters(nodes, pairs, maxIter = 20)
      .select("doc_id", "component").as[(Long, Long)].collect()
    r.map(_._2).distinct shouldBe Array(1L)
  }

  test("duplicateClusters matches union-find on a random mixed graph " +
    "(pre-contraction equivalence, round 13)") {
    // stars, chains, and cross-links — exercises both the contracted-away
    // fast path and the multi-hop remainder loop plus their composition
    val rnd = new scala.util.Random(42)
    val n = 200L
    val pairEdges = (1 to 260).map { _ =>
      val a = 1L + rnd.nextInt(200); val b = 1L + rnd.nextInt(200)
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val nodes = (1L to n).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = pairEdges.toDF("doc_id_1", "doc_id_2")
    // ground truth: plain union-find with min-id representatives
    val parent = Array.tabulate(n.toInt + 1)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairEdges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
        parent(hi) = lo }
    }
    val expected = (1L to n).map(i => i -> find(i.toInt).toLong).toMap
    val got = Dedup.duplicateClusters(nodes, pairs)
      .select("doc_id", "component").as[(Long, Long)].collect().toMap
    got shouldBe expected
  }

  test("duplicateClusters throws instead of returning partial components at maxIter") {
    val nodes = (1L to 8L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = (1L until 8L).map(i => (i, i + 1)).toDF("doc_id_1", "doc_id_2")
    an[IllegalStateException] should be thrownBy
      Dedup.duplicateClusters(nodes, pairs, maxIter = 2)
  }

  test("nearDupCorpus composes LSH -> exact verify -> clusters end to end") {
    val corpus = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog and runs away"),
      (2L, "en", "The  Quick Brown Fox jumps over the lazy dog and runs away"), // dup of 1
      (3L, "en", "completely different content about spark engines and shuffles"),
      (4L, "en", "the quick brown fox jumps over the lazy dog and runs home"), // near-dup of 1
      (5L, "en", "unrelated fifth document mentioning parquet column pruning")
    ).toDF("doc_id", "lang", "text").withColumn("n_chars", expr("length(text)"))
    val r = Dedup.nearDupCorpus(corpus, numHashes = 128, bands = 32, threshold = 0.8)
      .select("doc_id", "component", "is_canonical")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    r.filter(_._1 <= 2L).map(_._2).distinct shouldBe Array(1L) // {1,2} clustered
    r.find(_._1 == 3L).get._2 shouldBe 3L // singleton
    r.count(_._3) shouldBe (r.map(_._2).distinct.length) // one canonical per cluster
  }

  // ---- PPJoin (prefix-filtered global jaccard) + weighted family ----------

  /** Scala-side shingle reference, mirroring shinglesW (distinct char
    * 5-grams of the RAW text — the ppjoin default width).
    */
  private def triSet(text: String): Set[String] =
    if (text.length < 5) Set.empty
    else (0 to text.length - 5).map(i => text.substring(i, i + 5)).toSet

  private def bruteJaccard(rows: Seq[(Long, String)], t: Double) =
    (for {
      (d1, t1) <- rows; (d2, t2) <- rows
      if d1 < d2
      a = triSet(t1); b = triSet(t2)
      inter = (a intersect b).size
      denom = a.size + b.size - inter
      if denom > 0
      j = inter.toDouble / denom
      if j >= t
    } yield ((d1, d2), j)).toMap

  private def ppCorpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and then runs away home"),
    (2L, "the quick brown fox jumps over the lazy dog and then runs away hom!"), // near-dup of 1
    (3L, "completely different content talking about spark catalyst optimizers"),
    (4L, "the quick brown fox jumps over the lazy cat and then runs away home"), // near-dup of 1
    (5L, "short doc"),
    (6L, "yet another unrelated document about parquet column chunk statistics"),
    (7L, ""), // empty: never pairs
    (8L, "completely different content talking about spark catalyst optimizer!") // near-dup of 3
  )

  test("ppjoinJaccardPairs equals the brute-force global jaccard, values exact") {
    val df = ppCorpus.toDF("doc_id", "text")
    val got = Dedup.ppjoinJaccardPairs(df, 0.5)
      .select("doc_id_1", "doc_id_2", "jaccard").as[(Long, Long, Double)]
      .collect().map(r => ((r._1, r._2), r._3)).toMap
    val want = bruteJaccard(ppCorpus, 0.5)
    got.keySet shouldBe want.keySet
    got.foreach { case (k, j) => j shouldBe want(k) }
    want should not be empty
  }

  test("ppjoin prefix+positional pruning collapses a skewed corpus's candidate space") {
    // every doc shares one hot template; only id pairs (2k, 2k+1) are
    // near-dups (same random tail, one-char edit). rarest-first prefixes are
    // filled by the per-doc random-tail trigrams and exclude the hot
    // template's, so candidates stay near the true-pair count, not all-pairs.
    val hot = "shared boilerplate header that every single document carries along "
    val n = 60
    val corpus = (0 until n).map { i =>
      val rng = new scala.util.Random(i / 2) // tail shared within a dup pair
      val tail = Array.fill(40)(('a' + rng.nextInt(26)).toChar).mkString
      (i.toLong, hot + tail + (if (i % 2 == 1) "!" else ""))
    }
    val df = corpus.toDF("doc_id", "text")
    val cands = Dedup.ppjoinCandidates(df, 0.8).count()
    val allPairs = n.toLong * (n - 1) / 2
    cands should be < (allPairs / 4)
    // and the pruned join still returns exactly the brute-force answer
    val got = Dedup.ppjoinJaccardPairs(df, 0.8)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    got shouldBe bruteJaccard(corpus, 0.8).keySet
    got should not be empty
  }

  /** Scala-side weighted reference: multiset trigrams of NORMALIZED text,
    * weighted jaccard = Σmin / Σmax, computed with the operator's
    * inter / (na + nb - inter) arithmetic for bit-identical doubles.
    */
  private def bruteWeighted(rows: Seq[(Long, String)], t: Double) = {
    def norm(s: String) = s.toLowerCase.replaceAll("\\s+", " ").trim
    def multi(text: String): Map[String, Int] = {
      val nt = norm(text)
      if (nt.length < 5) Map.empty
      else (0 to nt.length - 5).map(i => nt.substring(i, i + 5))
        .groupBy(identity).view.mapValues(_.length).toMap
    }
    (for {
      (d1, t1) <- rows; (d2, t2) <- rows
      if d1 < d2
      a = multi(t1); b = multi(t2)
      inter = a.map { case (g, c) => math.min(c, b.getOrElse(g, 0)) }.sum
      na = a.values.sum; nb = b.values.sum
      denom = na + nb - inter
      if denom > 0
      j = inter.toDouble / denom
      if j >= t
    } yield ((d1, d2), j)).toMap
  }

  test("weightedJaccardPairs: tf multiplicity changes the answer and matches Σmin/Σmax") {
    // "aaaaaa" = {aaaaa×2}, "aaaaaaa" = {aaaaa×3}: weighted 2/3,
    // unweighted would be 1.0
    val tiny = Seq((1L, "aaaaaa"), (2L, "aaaaaaa")).toDF("doc_id", "text")
    val j = Dedup.weightedJaccardPairs(tiny, 0.5)
      .select("wjaccard").as[Double].head()
    j shouldBe 2.0 / 3.0
  }

  test("weightedJaccardPairs equals the brute-force weighted jaccard") {
    val got = Dedup.weightedJaccardPairs(ppCorpus.toDF("doc_id", "text"), 0.5)
      .select("doc_id_1", "doc_id_2", "wjaccard").as[(Long, Long, Double)]
      .collect().map(r => ((r._1, r._2), r._3)).toMap
    val want = bruteWeighted(ppCorpus, 0.5)
    got.keySet shouldBe want.keySet
    got.foreach { case (k, j) => j shouldBe want(k) }
    want should not be empty
  }

  test("weightedMinhashLshPairs at (128, 32) recovers the exact weighted pairs") {
    val df = ppCorpus.toDF("doc_id", "text")
    val exact = Dedup.weightedJaccardPairs(df, 0.5)
      .select("doc_id_1", "doc_id_2", "wjaccard").as[(Long, Long, Double)]
      .collect().toSet
    val lsh = Dedup.weightedMinhashLshPairs(df, 128, 32, 0.5)
      .select("doc_id_1", "doc_id_2", "wjaccard").as[(Long, Long, Double)]
      .collect().toSet
    lsh shouldBe exact
    exact should not be empty
  }

  // ---- round 7: engine-portable (md5-affine) variants. The recall
  // contracts that lived in the q20/q21/q53 entries through round 6 move
  // here: the entries now emit the pair sets themselves (full-hash
  // oracles), and the spec pins found ⊆ truth + total recall on corpora
  // that exercise the bound.

  test("minhashLshPairsMd5 equals the exact ppjoin pairs, jaccard values exact") {
    val df = ppCorpus.toDF("doc_id", "text")
    val exact = Dedup.ppjoinJaccardPairs(df, 0.5)
      .select("doc_id_1", "doc_id_2", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    val lsh = Dedup.minhashLshPairsMd5(df, 64, 16, 0.5, 5)
      .select("doc_id_1", "doc_id_2", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    // subset holds by construction (candidates exactly verified in the
    // same space); equality = measured 100% band recall on this corpus
    lsh shouldBe exact
    exact should not be empty
  }

  test("screened LSH: 2-bit pack-popcount equals the direct minima-parity screen at every cut") {
    // the screen's observable semantics: output(cut) = unscreened output
    // restricted to pairs whose count of matching (sm_k % 4) slots >= cut,
    // where sm_k = min(h1 XOR screenConst(k)) is the xor-family screen
    // minimum (NOT the h1-dominated banding minima — see the operator's
    // scaladoc for the measured correlation that rules those out). The
    // reference recomputes the screen minima INDEPENDENTLY (plain SQL
    // expressions — the oracle's arithmetic) and counts slot matches
    // directly, so this pins the bit-twiddling in the operator: pack two
    // bits per slot into two longs, then
    // 32 - popcount((x | x>>1) & 0x5555..5) per long on the XOR. A wrong
    // mask, shift, sign-extension, or constant bug breaks equality at
    // some cut.
    val df = ppCorpus.toDF("doc_id", "text")
    val el = df.filter(expr("length(text) >= 5"))
      .select(col("doc_id"), expr(
        "explode(array_distinct(transform(sequence(1, length(text) - 4)," +
          " x -> substring(text, x, 5))))").as("e"))
    val hv = el.select(col("doc_id"),
      expr("CAST(conv(substring(md5(CAST(e AS BINARY)), 1, 15), 16, 10) AS LONG)").as("h1"))
    // derive the constants exactly as the operator documents them: top 60
    // bits of md5("graft-bbit-k") — an independent reimplementation
    val consts = (0 until 64).map { k =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-bbit-$k".getBytes("UTF-8"))
      new java.math.BigInteger(1, md).shiftRight(68).longValue()
    }
    val minExprs = (0 until 64).map(k =>
      org.apache.spark.sql.functions.min(
        expr(s"h1 ^ ${consts(k)}L")).as(s"sm$k"))
    val sig = hv.groupBy(col("doc_id")).agg(minExprs.head, minExprs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 64).map(r.getLong).toArray).toMap
    def matches(a: Long, b: Long): Int =
      (0 until 64).count(k => sig(a)(k) % 4 == sig(b)(k) % 4)
    val unscreened = Dedup.minhashLshPairsMd5(df, 64, 8, 0.5, 5)
      .select("doc_id_1", "doc_id_2", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    unscreened should not be empty
    for (cut <- Seq(1, 41, 55, 62, 64)) {
      val got = Dedup.minhashLshPairsScreenedMd5(df, 64, 8, 0.5, 5, cut)
        .select("doc_id_1", "doc_id_2", "jaccard").as[(Long, Long, Double)]
        .collect().toSet
      withClue(s"cut=$cut: ") {
        got shouldBe unscreened.filter(p => matches(p._1, p._2) >= cut)
      }
    }
    // non-vacuity: the screen must BIND somewhere on this corpus — a
    // j < 1 pair's parities cannot all 64 agree, so cut=64 drops it
    val loose = unscreened.filter(p => matches(p._1, p._2) >= 1)
    val tight = unscreened.filter(p => matches(p._1, p._2) >= 64)
    tight should not equal loose
  }

  test("weighted screened LSH: subset of unscreened, binds at cut=64, passes all at cut=1") {
    // the weighted twin shares the 64-slot xor screen (sm_k derives from
    // h1 alone, so the g#k occurrence expansion plugs in unchanged); the
    // full screen-count identity is pinned by the unweighted 5-cut test
    // above and by q332's DuckDB oracle replay — here: containment, the
    // trivial cut, and non-vacuity at the tight cut
    val df = ppCorpus.toDF("doc_id", "text")
    val un = Dedup.weightedMinhashLshPairsMd5(df, 128, 32, 0.5, 5)
      .select("doc_id_1", "doc_id_2", "wjaccard").as[(Long, Long, Double)]
      .collect().toSet
    un should not be empty
    val atOne = Dedup.weightedMinhashLshPairsScreenedMd5(df, 128, 32, 0.5, 5, 1)
      .select("doc_id_1", "doc_id_2", "wjaccard").as[(Long, Long, Double)]
      .collect().toSet
    atOne shouldBe un
    val at64 = Dedup.weightedMinhashLshPairsScreenedMd5(df, 128, 32, 0.5, 5, 64)
      .select("doc_id_1", "doc_id_2", "wjaccard").as[(Long, Long, Double)]
      .collect().toSet
    at64.subsetOf(un) shouldBe true
    at64 should not equal un
  }

  test("weightedMinhashLshPairsMd5 equals the exact weighted pairs") {
    val df = ppCorpus.toDF("doc_id", "text")
    val exact = Dedup.weightedJaccardPairs(df, 0.5)
      .select("doc_id_1", "doc_id_2", "wjaccard").as[(Long, Long, Double)]
      .collect().toSet
    val lsh = Dedup.weightedMinhashLshPairsMd5(df, 128, 32, 0.5, 5)
      .select("doc_id_1", "doc_id_2", "wjaccard").as[(Long, Long, Double)]
      .collect().toSet
    lsh shouldBe exact
    exact should not be empty
  }

  test("lshBucketAudit prices the candidate volume from signatures alone") {
    // two identical docs + one distinct: the identical pair shares every
    // band bucket (all 64 minima equal), the distinct doc sits alone
    val tiny = Seq(
      (1L, "the quick brown fox jumps over it"),
      (2L, "the quick brown fox jumps over it"),
      (3L, "completely different content here now")).toDF("doc_id", "text")
    val r = Dedup.lshBucketAudit(tiny, 64, 16, 5)
      .select("band", "n_buckets", "max_bucket", "candidate_pairs", "n_docs")
      .as[(Long, Long, Long, Long, Long)].collect()
    r.length shouldBe 16
    r.map(_._1).sorted shouldBe (0L until 16L).toArray
    r.foreach { case (_, nBuckets, maxBucket, candPairs, nDocs) =>
      nDocs shouldBe 3
      maxBucket shouldBe 2 // the identical pair, in every band
      candPairs shouldBe 1 // C(2,2) = 1 implied candidate per band
      nBuckets shouldBe 2
    }
  }

  test("simhashPairsMd5 pigeonhole banding equals the all-pairs baseline") {
    val words = Array("spark", "data", "cluster", "shuffle", "join", "scan",
      "parquet", "column", "row", "partition", "stage", "task")
    val corpus = (0 until 40).map { i =>
      val base = (0 until 8).map(j => words((i / 4 + j) % words.length))
      val text =
        if (i % 4 == 2) base.updated(3, "edited").mkString(" ")
        else base.mkString(" ")
      (i.toLong, if (i % 2 == 0) "en" else "fr", text)
    }.toDF("doc_id", "lang", "text")
    val maxH = 8
    val banded = Dedup.simhashPairsMd5(corpus, maxH)
      .select("doc_id_1", "doc_id_2", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val sh = Dedup.simhashMd5(corpus)
      .join(corpus.select(col("doc_id"), col("lang")), "doc_id")
      .select("doc_id", "lang", "simhash").as[(Long, String, Long)].collect()
    val baseline = (for {
      a <- sh; b <- sh
      if a._2 == b._2 && a._1 < b._1
      h = java.lang.Long.bitCount(a._3 ^ b._3)
      if h <= maxH
    } yield (a._1, b._1, h.toLong)).toSet
    baseline should not be empty
    banded shouldBe baseline
  }

  test("simhashMd5 signature: identical token multisets agree, independent of partitioning") {
    val two = Seq((1L, "same tokens here again"), (2L, "same tokens here again"))
      .toDF("doc_id", "text")
    val sigs = Dedup.simhashMd5(two).select("simhash").as[Long].collect()
    sigs(0) shouldBe sigs(1)
    val rep = Dedup.simhashMd5(two.repartition(7)).select("simhash").as[Long].collect()
    rep.toSet shouldBe sigs.toSet
  }

  test("ppjoin plan: token equi-join with reused exchange, no cross product") {
    // at test scale AQE would broadcast the self-join (also fine); disable
    // auto-broadcast to see the real-scale shape: one exchange, reused.
    // AQE materializes reuse only in the EXECUTED QueryExecution (collect
    // uses this one; count()/write re-plan), so execute before asserting.
    // the reuse depends on graft_sorted_collect being deterministic — with
    // collect_list (non-deterministic) the preprocessing would run twice.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Dedup.ppjoinJaccardPairs(ppCorpus.toDF("doc_id", "text"), 0.6)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      plan should include("ReusedExchange")
      plan should not include "BroadcastNestedLoopJoin"
      plan should not include "CartesianProduct"
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("ppjoin refuses a vocabulary over the broadcast budget") {
    // an over-budget vocab (budget forced tiny) must fail with the
    // contract message, not OOM the rank broadcast at scale
    val df = ppCorpus.toDF("doc_id", "text")
    val e = the[IllegalArgumentException] thrownBy
      Dedup.ppjoinJaccardPairs(df, 0.6, maxVocab = 10)
    e.getMessage should include("vocabulary")
    // at the real default the same corpus ranks fine
    Dedup.ppjoinJaccardPairs(df, 0.6).count() should be > 0L
  }

  test("containmentJoin flags asymmetric n-gram containment") {
    val needles = Seq(
      (100L, "alpha beta gamma delta"),       // 2 trigrams, both in doc 1
      (101L, "zeta eta theta iota"),          // disjoint from the haystack
      (102L, "one two")                       // below n tokens: no grams
    ).toDF("doc_id", "text")
    val hay = Seq(
      (1L, "intro words alpha beta gamma delta outro trailing text"),
      (2L, "alpha beta unrelated gamma delta") // shares NO trigram
    ).toDF("doc_id", "text")
    val r = Dedup.containmentJoin(needles, hay, 3, 0.8)
      .as[(Long, Long, Double)].collect()
    // only (100, 1): both of needle 100's trigrams appear in doc 1;
    // containment is asymmetric (doc 1 is much larger — jaccard would be
    // far below 0.8); needle 102 has no trigrams and must emit nothing
    r.map(t => (t._1, t._2)).toSet shouldBe Set((100L, 1L))
    r.head._3 shouldBe 1.0
  }

  test("embeddingNearDupPairs finds same-label near-identical vectors") {
    val emb = Seq(
      (1L, 0, Array(1.0f, 0.0f, 0.0f)),
      (2L, 0, Array(0.99f, 0.01f, 0.0f)),
      (3L, 0, Array(0.0f, 1.0f, 0.0f)),
      (4L, 1, Array(1.0f, 0.0f, 0.0f)) // near-dup of 1 but different label/block
    ).toDF("vec_id", "label", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(emb, 0.95)
      .select("vec_id_1", "vec_id_2").as[(Long, Long)].collect().toSet
    pairs shouldBe Set((1L, 2L))
  }

  // 40 base directions in dim 8, each with a near-identical twin: the 40
  // twin pairs are the ground truth; cross-pair cosines sit far below the
  // threshold with this seed. No label/block key anywhere — the blocking
  // must come from the quantizer.
  private def twinCorpus = {
    val rng = new scala.util.Random(20260813L)
    (0 until 40).flatMap { c =>
      val base = Array.fill(8)(rng.nextGaussian().toFloat)
      Seq((c * 2L, base),
        (c * 2L + 1, base.map(v => v + 0.01f * rng.nextGaussian().toFloat)))
    }.toDF("vec_id", "embedding")
  }

  test("embeddingNearDup (IVF-cell) recovers the all-pairs near-dups") {
    val df = twinCorpus
    // exact all-pairs baseline through the explicit-block variant with one
    // global block (quadratic — fine at spec scale, it IS the definition)
    val exact = Dedup.embeddingNearDupPairs(df.withColumn("label", lit(0)), 0.95)
      .select(col("vec_id_1"), col("vec_id_2"))
      .as[(Long, Long)].collect().toSet
    val ivf = Dedup.embeddingNearDup(df, 0.95, nCells = 6, nProbe = 2)
      .select("vec_id_1", "vec_id_2").as[(Long, Long)].collect().toSet
    exact should not be empty
    // precision 1.0 by construction: scoring is exact, same threshold
    ivf.subsetOf(exact) shouldBe true
    // recall bound (twins agree on their nearest cells; spill covers the
    // boundary straddlers)
    ivf.size.toDouble / exact.size should be >= 0.95
  }

  test("embeddingNearDupDet: subset of all-pairs, twin recall, repartition-invariant") {
    val df = twinCorpus
    val exact = Dedup.embeddingNearDupPairs(df.withColumn("label", lit(0)), 0.95)
      .select(col("vec_id_1"), col("vec_id_2"))
      .as[(Long, Long)].collect().toSet
    val det = Dedup.embeddingNearDupDet(df, 0.95, nCells = 6, nProbe = 2)
      .select("vec_id_1", "vec_id_2").as[(Long, Long)].collect().toSet
    exact should not be empty
    det.subsetOf(exact) shouldBe true
    det.size.toDouble / exact.size should be >= 0.95
    // unlike the KMeans variant, the caught-pair SET is a pure function of
    // the data — identical under any physical layout (q94's oracle
    // contract rests on this)
    val det2 = Dedup.embeddingNearDupDet(df.repartition(7), 0.95,
      nCells = 6, nProbe = 2)
      .select("vec_id_1", "vec_id_2").as[(Long, Long)].collect().toSet
    det2 shouldBe det
  }

  test("soft-dedup weights: each cluster carries ~unit sampling mass") {
    // the q324 invariant: Σ weight_ppm over a cluster's members is
    // size·(1e6 div size) — within truncation of exactly 1e6 per cluster,
    // so a sampler draws clusters, not copies
    import org.apache.spark.sql.expressions.Window
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val r = Dedup.duplicateClusters(d, Dedup.ngramJaccardPairs(d, 0.6))
      .withColumn("cluster_size", count(lit(1))
        .over(Window.partitionBy(col("component"))).cast("long"))
      .select(col("component"), col("cluster_size"),
        expr("1000000 div cluster_size").as("weight_ppm"))
      .groupBy(col("component"), col("cluster_size"))
      .agg(sum(col("weight_ppm")).as("mass"))
      .as[(Long, Long, Long)].collect()
    r.length should be > 0
    r.foreach { case (_, size, mass) =>
      mass should be <= 1000000L
      mass should be > 1000000L - size
    }
    // dedup genuinely bites on this corpus: some cluster has size > 1
    r.map(_._2).max should be > 1L
  }

  test("q94 recall floor holds on the pinned sf0.001 corpus") {
    // the measured-on-testdata evidence behind the round-6 catalog entry
    // (its hash gate now checks the exact pair set; this keeps the
    // quality statement): >= 93% of all-pairs cos >= 0.35 pairs caught at
    // nCells=8/nProbe=3
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Dedup.embeddingNearDupPairs(
        emb.withColumn("label", lit(0)), 0.35)
      .select(col("vec_id_1"), col("vec_id_2"))
      .as[(Long, Long)].collect().toSet
    val det = Dedup.embeddingNearDupDet(emb, 0.35, nCells = 8, nProbe = 3)
      .select("vec_id_1", "vec_id_2").as[(Long, Long)].collect().toSet
    det.subsetOf(exact) shouldBe true
    det.size.toDouble / exact.size should be >= 0.93
  }

  test("embeddingNearDupDet plan: pair generation is an equi-join on cell") {
    val df = twinCorpus
    val plan = Dedup.embeddingNearDupDet(df, 0.95, nCells = 4, nProbe = 2)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should include regex "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[cell"
  }

  test("embeddingNearDup plan: pair generation is an equi-join on cell") {
    val df = twinCorpus
    val plan = Dedup.embeddingNearDup(df, 0.95, nCells = 4, nProbe = 2)
      .queryExecution.executedPlan.toString
    // the only nested-loop is the bounded nCells-row centroid probe; the
    // corpus×corpus pair join must hash/sort-merge on the cell key
    plan should not include "CartesianProduct"
    plan should include regex "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[cell"
  }

  test("embeddingNearDup plan at sf0.1: AQE's FINAL pair join is still an equi-join on cell") {
    // q94's layout, executed so AQE commits its runtime join choice — spec-
    // scale plan checks can't see an AQE rewrite to broadcast nested loop
    // at real cell sizes (VERDICT r3 item 9)
    val emb = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val out = Dedup.embeddingNearDup(emb, 0.35, nCells = 8, nProbe = 2)
    out.write.mode("overwrite").format("noop").save()
    val finalPlan = out.queryExecution.executedPlan.toString
    // the bounded centroid probe is a legit nested-loop; the corpus-pair
    // join must still hash/merge on the cell key (if AQE had degraded it
    // to a nested loop, no equi-join on [cell would remain in the plan)
    finalPlan should not include "CartesianProduct"
    finalPlan should include regex "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[cell"
  }

  test("incrementalLshScreenedMd5 equals the batch-involving subset of the screened self-join") {
    // the round-12 gate scale arm's semantics contract: bipartite
    // banding + in-band screen + survivor-staged verify over (corpus,
    // batch) must emit EXACTLY the screened self-join's pairs that touch
    // the batch — same signatures, same bands, same screen, same exact
    // h1-space jaccard — with the batch doc as new_id and batch pairs
    // ordered new_id < dup_id. Holds at any recall point because both
    // sides share the banding (a missed band collision is missed by
    // both), so this is an identity, not a recall bound.
    val df = ppCorpus.toDF("doc_id", "text")
    val batchIds = Set(2L, 4L, 8L)
    val batch = df.filter(col("doc_id").isin(batchIds.toSeq.map(Long.box): _*))
    val corpus = df.filter(!col("doc_id").isin(batchIds.toSeq.map(Long.box): _*))
    for (cut <- Seq(1, 41, 64)) {
      val full = Dedup.minhashLshPairsScreenedMd5(df, 64, 8, 0.5, 5, cut)
        .select("doc_id_1", "doc_id_2", "jaccard").as[(Long, Long, Double)]
        .collect().toSet
      val expected = full.collect {
        case (a, b, j) if batchIds(a) && batchIds(b) => (a, b, "batch", j)
        case (a, b, j) if batchIds(a) => (a, b, "corpus", j)
        case (a, b, j) if batchIds(b) => (b, a, "corpus", j)
      }
      val inc = Dedup.incrementalLshScreenedMd5(corpus, batch, 64, 8, 0.5, 5, cut)
        .select("new_id", "dup_id", "dup_source", "jaccard")
        .as[(Long, Long, String, Double)].collect().toSet
      withClue(s"cut=$cut: ") {
        if (cut <= 41) expected should not be empty
        inc shouldBe expected
        // corpus×corpus never pairs: the new side is always the batch
        inc.foreach { case (n, _, _, _) => batchIds(n) shouldBe true }
      }
    }
    // first-delivery case: an EMPTY corpus degrades to the batch-only
    // self-join — every pair tagged 'batch', ordered new_id < dup_id
    val emptyCorpus = df.filter(lit(false))
    val batchOnly = Dedup.incrementalLshScreenedMd5(emptyCorpus, batch, 64, 8, 0.5, 5, 41)
      .select("new_id", "dup_id", "dup_source", "jaccard")
      .as[(Long, Long, String, Double)].collect().toSet
    val selfPairs = Dedup.minhashLshPairsScreenedMd5(batch, 64, 8, 0.5, 5, 41)
      .select("doc_id_1", "doc_id_2", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    batchOnly shouldBe selfPairs.map { case (a, b, j) => (a, b, "batch", j) }
  }

  test("incrementalNearDup equals the batch-involving subset of the full join") {
    val batchIds = Set(2L, 4L)
    val batch = docs.filter(col("doc_id").isin(batchIds.toSeq.map(Long.box): _*))
    val corpus = docs.filter(!col("doc_id").isin(batchIds.toSeq.map(Long.box): _*))
    val inc = Dedup.incrementalNearDup(corpus, batch, 0.5)
      .select("new_id", "dup_id", "dup_source", "jaccard")
      .as[(Long, Long, String, Double)].collect().toSet
    // baseline: the full corpus self-join, restricted to pairs that touch
    // the batch — incremental ingest must see exactly these, no more
    val full = Dedup.ngramJaccardPairs(docs, 0.5)
      .select("doc_id_1", "doc_id_2", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    val expected = full.collect {
      case (a, b, j) if batchIds(a) && batchIds(b) => (a, b, "batch", j)
      case (a, b, j) if batchIds(a) => (a, b, "corpus", j)
      case (a, b, j) if batchIds(b) => (b, a, "corpus", j)
    }
    expected should not be empty
    inc shouldBe expected
    // the new_id side is always from the batch: corpus×corpus never pairs
    inc.foreach { case (n, _, _, _) => batchIds(n) shouldBe true }
  }
}
