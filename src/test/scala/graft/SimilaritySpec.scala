package graft

import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  // two tight clusters around orthogonal axes (4-dim), fixed noise
  private def clustered = {
    val base = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f))
    val rows = for {
      (b, c) <- base.zipWithIndex
      i <- 0 until 5
    } yield (c * 5L + i, c, b.zipWithIndex.map { case (v, j) =>
      v + 0.01f * ((i + j) % 3) }.toArray)
    rows.toDF("vec_id", "label", "embedding")
  }

  test("vdot/cosine: exact values on known vectors") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    df.select(VectorFunctions.vdot(col("a"), col("b")).as("d"))
      .as[Double].head() shouldBe 32.0
    val c = df.select(VectorFunctions.cosine(col("a"), col("a")).as("c"))
      .as[Double].head()
    c shouldBe 1.0 +- 1e-15
  }

  test("bruteKnn returns own-cluster neighbors ranked by cosine") {
    val emb = clustered
    val r = Similarity.bruteKnn(emb, emb.filter(col("vec_id") === 0), 4)
      .select("neighbor_id").as[Long].collect()
    r.length shouldBe 4
    r.toSet shouldBe Set(1L, 2L, 3L, 4L) // cluster 0 members
  }

  test("bruteKnn rank is deterministic: neighbor_id breaks cosine ties") {
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0f)), (2L, Array(1f, 0f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.bruteKnn(emb, emb.filter(col("vec_id") === 0), 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    r shouldBe Array((1L, 1), (2L, 2))
  }

  test("lshKnn achieves full recall on well-separated clusters") {
    val emb = clustered
    val queries = emb.filter(col("vec_id").isin(0L, 5L))
    val brute = Similarity.bruteKnn(emb, queries, 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshKnn(emb, queries, 4, nBits = 6, dim = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // near-identical vectors share every hyperplane sign -> same bucket
    lsh shouldBe brute
  }

  test("lshKnn rejects mismatched dims on either side; empty frames pass through") {
    val emb = clustered
    val queries = emb.filter(col("vec_id") === 0L)
    // wrong configured dim fails loudly on the corpus side
    an[IllegalArgumentException] should be thrownBy
      Similarity.lshKnn(emb, queries, 2, nBits = 6, dim = 8)
    // wrong-dim queries fail loudly too (same hyperplanes hash both sides)
    val q2 = Seq((99L, 99, Array(1f, 0f))).toDF("vec_id", "label", "embedding")
    an[IllegalArgumentException] should be thrownBy
      Similarity.lshKnn(emb, q2, 2, nBits = 6, dim = 4)
    // an empty corpus yields an empty result, not a crash
    Similarity.lshKnn(emb.filter(col("vec_id") < 0), queries, 2,
      nBits = 6, dim = 4).count() shouldBe 0L
  }

  test("ivfKnn achieves full recall on well-separated clusters") {
    val emb = clustered
    val queries = emb.filter(col("vec_id").isin(0L, 5L))
    val brute = Similarity.bruteKnn(emb, queries, 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // 2 cells, probe 1: each cluster collapses into its own cell
    val ivf = Similarity.ivfKnn(emb, queries, 4, nCells = 2, nProbe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    ivf shouldBe brute
  }

  test("lshKnn cosine scores are exact (same fold as brute force)") {
    val emb = clustered
    val queries = emb.filter(col("vec_id") === 0)
    val brute = Similarity.bruteKnn(emb, queries, 4)
      .select("neighbor_id", "cos_sim").as[(Long, Double)].collect().toMap
    val lsh = Similarity.lshKnn(emb, queries, 4, nBits = 6, dim = 4)
      .select("neighbor_id", "cos_sim").as[(Long, Double)].collect().toMap
    lsh.foreach { case (id, c) => c shouldBe brute(id) } // bit-identical
  }

  test("lshKnn multi-table: well-separated recall holds and scores stay exact") {
    val emb = clustered
    val queries = emb.filter(col("vec_id").isin(0L, 5L))
    val brute = Similarity.bruteKnn(emb, queries, 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh4 = Similarity.lshKnn(emb, queries, 4, nBits = 6, dim = 4,
      nTables = 4)
    lsh4.select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().toSet shouldBe brute
    // a pair that meets in several tables appears once, with the exact fold
    val bruteScores = Similarity.bruteKnn(emb, queries, 4)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    val rows = lsh4.select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    rows.map(r => (r._1, r._2)).distinct.length shouldBe rows.length
    rows.foreach { case (q, n, c) => c shouldBe bruteScores((q, n)) }
  }

  test("fitQuantizerDet is a pure function of the data: repartition-invariant") {
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(4)(j => ((i * 7 + j * 3) % 11).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    def centsOf(df: org.apache.spark.sql.DataFrame) =
      Similarity.fitQuantizerDet(df, 4, iters = 3).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    val a = centsOf(emb.repartition(3))
    val b = centsOf(emb.repartition(13))
    a shouldBe b // bit-exact, not approximately equal
    a.size shouldBe 4
  }

  test("fitQuantizerDet: Lloyd refinement recovers well-separated cluster means") {
    val emb = clustered
    val cents = Similarity.fitQuantizerDet(emb, 2, iters = 3)
      .collect().map(r => r.getSeq[Double](1).toArray)
    cents.length shouldBe 2
    // each centroid sits on one axis: its max component dominates
    cents.foreach { c =>
      val mx = c.max
      mx should be > 0.9
      c.count(_ > 0.5) shouldBe 1
    }
    // and the two centroids take DIFFERENT axes
    cents.map(_.indexWhere(_ > 0.5)).toSet.size shouldBe 2
  }

  test("fitQuantizerDet survives nCells above distinct-vector count") {
    val emb = clustered.limit(3)
    val cents = Similarity.fitQuantizerDet(emb, 8, iters = 2).collect()
    cents.length should be <= 8
    cents.length should be >= 1
  }

  test("q23/q26 recall floors hold on the pinned sf0.001 corpus") {
    // the measured-on-testdata recall evidence behind the round-6 catalog
    // entries (their hash gates now check the EXACT ranking; this spec
    // keeps the quality statement): at 4 LSH tables >= 12/40 brute-force
    // top-5 hits over the 8 probes, and >= 2/5 per probe for IVF at
    // nProbe=5 of 16 deterministic Lloyd cells
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val probes = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteKnn(emb, probes, 5)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val lshHits = Similarity.lshKnn(emb, probes, 5, nTables = 4)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().count(exact)
    lshHits should be >= 12
    val cents = Similarity.fitQuantizerDet(emb, 16)
    val ivf = Similarity.ivfKnnFrom(cents, emb, probes, 5, nProbe = 5)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect()
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      rows.count(exact) should be >= 2
    }
  }

  test("ivfKnnFrom achieves full recall on well-separated clusters") {
    val emb = clustered
    val queries = emb.filter(col("vec_id").isin(0L, 5L))
    val brute = Similarity.bruteKnn(emb, queries, 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val cents = Similarity.fitQuantizerDet(emb, 2, iters = 3)
    val ivf = Similarity.ivfKnnFrom(cents, emb, queries, 4, nProbe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    ivf shouldBe brute
  }

  test("minMaxNormalize rescales per dimension; constant dims map to zero") {
    val emb = Seq(
      (0L, Array(0f, 10f, 7f)),
      (1L, Array(5f, 10f, 3f)),
      (2L, Array(10f, 10f, 5f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.minMaxNormalize(emb)
      .select("vec_id", "embedding_std").as[(Long, Array[Double])]
      .collect().sortBy(_._1)
    r(0)._2 shouldBe Array(0.0, 0.0, 1.0)   // dim1 constant -> 0
    r(1)._2 shouldBe Array(0.5, 0.0, 0.0)
    r(2)._2 shouldBe Array(1.0, 0.0, 0.5)
  }

  test("hardNegatives picks the semi-hard band and applies the margin") {
    val emb = clustered
    val knn = Similarity.bruteKnn(emb, emb.filter(col("vec_id") === 0), 9)
    val ranked = knn.select("neighbor_id", "cos_sim", "rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    val pos = ranked.head
    // wide margin: every rank in [3, 5] must appear, paired with rank 1
    val all = Similarity.hardNegatives(knn, 3, 5, margin = 2.0)
      .select("query_id", "pos_id", "pos_sim", "neg_id", "neg_sim", "neg_rank")
      .as[(Long, Long, Double, Long, Double, Long)].collect()
    all.map(_._6).sorted shouldBe Array(3L, 4L, 5L)
    all.foreach { case (q, p, ps, n, ns, r) =>
      q shouldBe 0L
      p shouldBe pos._1
      ps shouldBe pos._2
      val expect = ranked.find(_._3 == r).get
      (n, ns) shouldBe ((expect._1, expect._2))
    }
    // tight margin: only negatives with pos_sim - neg_sim <= m survive
    val m = pos._2 - ranked.find(_._3 == 4).get._2
    val tight = Similarity.hardNegatives(knn, 3, 5, margin = m)
      .select("neg_rank").as[Long].collect()
    tight.sorted shouldBe Array(3L, 4L)
    // the band may not touch rank 1 (the positive)
    an[IllegalArgumentException] should be thrownBy
      Similarity.hardNegatives(knn, 1, 5, margin = 1.0)
  }

  test("pqEncode: hand-computed argmin codes on a 2-subspace toy set") {
    // 4-dim vectors, 2 subspaces of 2 dims; nCodes = 2 — the codebook is
    // the two vectors with the smallest md5(vec_id), code = vec_id rank
    val emb = Seq(
      (1L, Array(0f, 0f, 10f, 10f)),
      (2L, Array(4f, 4f, 0f, 0f)),
      (3L, Array(1f, 1f, 9f, 9f)), // sub0 near? sub1 near vec1's (10,10)
      (4L, Array(3f, 3f, 1f, 1f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.pqEncode(emb, nSub = 2, dim = 4, nCodes = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getLong(3))).toMap
    // which two ids the md5 sample picks is an implementation detail of
    // the hash — recover it from the zero-distance property instead:
    // a sampled vector IS its own codeword in every subspace
    val sampled = (1L to 4L).filter(id =>
      (0 to 1).forall(sidx => r((id, sidx.toLong))._2 == 0L))
    sampled.size shouldBe 2
    // every (vec, sub) picks the truly nearest codeword: recompute naively
    val vecs = Map(1L -> Array(0f, 0f, 10f, 10f), 2L -> Array(4f, 4f, 0f, 0f),
      3L -> Array(1f, 1f, 9f, 9f), 4L -> Array(3f, 3f, 1f, 1f))
    val codeOf = sampled.sorted.zipWithIndex.toMap // code = rank of vec_id
    for (id <- 1L to 4L; sidx <- 0 to 1) {
      val v = vecs(id).slice(sidx * 2, sidx * 2 + 2)
      val best = sampled.map { sid =>
        val c = vecs(sid).slice(sidx * 2, sidx * 2 + 2)
        val d = v.zip(c).map { case (a, b) =>
          (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum
        (d, codeOf(sid).toLong)
      }.min
      r((id, sidx.toLong)) shouldBe ((best._2,
        math.floor(best._1 * 1e6 + 0.5).toLong))
    }
  }

  test("adcTopK: sampled candidates score at their exact micro distance") {
    // vectors whose codes reconstruct EXACTLY (the codebook sample) must
    // get adc == the micro-rounded exact per-subspace distance sum;
    // the (i·16 + j·3) mod 23 ramp keeps every subvector distinct across
    // vectors (verified), so ONLY the sample has all-zero dist_micro
    val emb = Seq.tabulate(12)(i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 16 + j * 3) % 23).toFloat)))
      .toDF("vec_id", "embedding")
    val pq = Similarity.pqEncode(emb, 4, 8, 3).collect()
    val sampled = pq.groupBy(_.getLong(0)).collect {
      case (id, rows) if rows.forall(_.getLong(3) == 0L) => id
    }.toSet
    sampled.size shouldBe 3
    val adc = Similarity.adcTopK(emb, probeIds = Seq(0L, 7L), k = 11,
      nSub = 4, dim = 8, nCodes = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val vecs = Seq.tabulate(12)(i =>
      i.toLong -> Array.tabulate(8)(j => ((i * 16 + j * 3) % 23).toDouble)).toMap
    for (p <- Seq(0L, 7L); c <- sampled if c != p) {
      val exact = (0 until 4).map { s =>
        val d = (0 until 2).map { j =>
          val df = vecs(p)(s * 2 + j) - vecs(c)(s * 2 + j); df * df
        }.sum
        math.floor(d * 1e6 + 0.5).toLong
      }.sum
      adc((p, c)) shouldBe exact
    }
  }

  test("pqEncode is a pure function of the data: repartition-invariant") {
    val emb = Seq.tabulate(20)(i =>
      (i.toLong, Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toFloat)))
      .toDF("vec_id", "embedding")
    val a = Similarity.pqEncode(emb, 4, 8, 4).collect().toSet
    val b = Similarity.pqEncode(emb.repartition(7), 4, 8, 4).collect().toSet
    a shouldBe b
    a.size shouldBe 20 * 4
  }

  // independent md5 (JDK MessageDigest, not Spark's expression) — used to
  // replicate the deterministic hash-sample centroid rule in plain Scala
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def l2(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) =>
      (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum

  private def cosMicro(a: Array[Float], b: Array[Float]): Long = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    math.floor(dot / (na * nb) * 1e6 + 0.5).toLong
  }

  // plain-Scala replica of detAssign: nearest of the nCells smallest-md5
  // vectors by L2, ties to the lower cell id
  private def detAssignScala(vecs: Seq[(Long, Array[Float])], nCells: Int)
      : (Map[Long, Long], Map[Long, Array[Float]]) = {
    val sampled = vecs.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(nCells)
    val cents = sampled.map(_._1).sorted.zipWithIndex
      .map { case (id, i) => i.toLong -> vecs.toMap.apply(id) }
    val cellOf = vecs.map { case (id, v) =>
      id -> cents.map { case (c, cv) => (l2(v, cv), c) }.min._2 }.toMap
    (cellOf, cents.toMap)
  }

  private def bundles(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val axis = i % 2
      val base = Array.fill(4)(0f)
      base(axis) = 1f
      base((axis + 2) % 4) = 0.02f * (i / 2 % 7) // distinct tilts
      (i.toLong, base)
    }

  test("semDedup: hand-replicated assignment + keep-min-id pruning") {
    val vecs = bundles(16)
    val emb = vecs.toDF("vec_id", "embedding")
    val r = Similarity.semDedup(emb, nCells = 2, threshMicro = 990000L)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2))))
      .toMap
    val (cellOf, _) = detAssignScala(vecs, 2)
    val expected = vecs.map { case (id, v) =>
      val pruned = vecs.exists { case (id2, v2) =>
        id2 < id && cellOf(id2) == cellOf(id) && cosMicro(v2, v) >= 990000L }
      id -> ((cellOf(id), pruned))
    }.toMap
    r shouldBe expected
    // the toy set genuinely exercises both arms
    r.values.count(_._2) should be > 0
    r.values.count(!_._2) should be > 0
    // a cell's minimum vec_id is never pruned (it has no lower-id mate)
    r.groupBy(_._2._1).foreach { case (_, m) =>
      m.filter(_._2._2 == false).keys.min shouldBe m.keys.min }
  }

  test("semDupPairs is the pair table behind semDedup's pruned set") {
    val emb = bundles(16).toDF("vec_id", "embedding")
    val pairs = Similarity.semDupPairs(emb, 2, 990000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // orientation: a < b always; threshold honored
    pairs.foreach { case (a, b, cm) =>
      a should be < b
      cm should be >= 990000L
    }
    // pruned(vec) ⇔ vec appears as the HIGHER id of some pair
    val prunedFromPairs = pairs.map(_._2).toSet
    val pruned = Similarity.semDedup(emb, 2, 990000L)
      .filter("pruned").collect().map(_.getLong(0)).toSet
    prunedFromPairs shouldBe pruned
  }

  test("semDedup is repartition-invariant") {
    val emb = bundles(16).toDF("vec_id", "embedding")
    val a = Similarity.semDedup(emb, 2, 990000L).collect().toSet
    val b = Similarity.semDedup(emb.repartition(7), 2, 990000L)
      .collect().toSet
    a shouldBe b
  }

  test("prototypicality: hand-replicated ranks flag the bottom decile") {
    val vecs = bundles(24) // two cells of ~12 → the decile band is live
    val emb = vecs.toDF("vec_id", "embedding")
    val r = Similarity.prototypicality(emb, nCells = 2)
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getBoolean(3)))).toMap
    val (cellOf, cents) = detAssignScala(vecs, 2)
    val scored = vecs.map { case (id, v) =>
      (id, cellOf(id), cosMicro(v, cents(cellOf(id)))) }
    val expected = scored.groupBy(_._2).flatMap { case (_, members) =>
      val ranked = members.sortBy { case (id, _, cm) => (cm, id) }
      val n = ranked.size
      ranked.zipWithIndex.map { case ((id, cell, cm), i) =>
        id -> ((cell, cm, 10L * (i + 1) <= n)) }
    }
    r shouldBe expected
    r.values.count(_._3) should be > 0
  }

  test("semanticDecontaminate flags exactly the cell-mate near pairs") {
    // eval = two axis vectors; train = one near-dup of each, one novel
    // diagonal; cells are eval-anchored, so each train vector lands with
    // its nearest eval anchor and only genuine near pairs survive 0.99
    val eval_ = Seq(
      (100L, Array(1f, 0f, 0f, 0f)), (101L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Array(1f, 0.05f, 0f, 0f)),  // ~cos 0.999 to eval 100
      (2L, Array(0f, 1f, 0.05f, 0f)),  // ~cos 0.999 to eval 101
      (3L, Array(1f, 1f, 1f, 1f)))     // novel
      .toDF("vec_id", "embedding")
    val r = Similarity.semanticDecontaminate(train, eval_, nCells = 2,
        threshMicro = 990000L)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2))))
      .toMap
    r.keySet shouldBe Set(1L, 2L)
    r(1L)._1 shouldBe 1L // one eval hit each
    r(2L)._1 shouldBe 1L
    all(r.values.map(_._2)) should be >= 990000L
  }

  test("ivf cell-balance invariants: shares partition the corpus") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = Similarity.fitQuantizerDet(emb, 16)
    val counts = Similarity.assignCellsFrom(cents, emb, nProbe = 1)
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
    counts.map(_._2).sum shouldBe emb.count()
    counts.length should be <= 16
    // nProbe=1 assignment is a partition: no vector counted twice
    Similarity.assignCellsFrom(cents, emb, nProbe = 1)
      .groupBy(col("vec_id")).count().filter(col("count") > 1)
      .count() shouldBe 0L
  }

  test("incrementalSemDedup on an empty corpus equals batch semDedup") {
    val emb = bundles(16).toDF("vec_id", "embedding")
    val empty = emb.filter(col("vec_id") < 0)
    val incDups = Similarity.incrementalSemDedup(empty, emb, 2, 990000L)
      .select("new_id").as[Long].collect().toSet
    val batchPruned = Similarity.semDedup(emb, 2, 990000L)
      .filter(col("pruned")).select("vec_id").as[Long].collect().toSet
    incDups shouldBe batchPruned
    // and all sources are "batch" (there is no corpus to dup against)
    Similarity.incrementalSemDedup(empty, emb, 2, 990000L)
      .select("dup_source").distinct().as[String].collect() shouldBe
        Array("batch")
  }

  test("incrementalSemDedup: hand-replicated corpus + in-batch pairs") {
    val corpusVecs: Seq[(Long, Array[Float])] = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(1f, 0.05f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)), (3L, Array(0f, 1f, 0.05f, 0f)))
    // batch: 10 duplicates corpus-X, 11 and 12 duplicate corpus-Y and
    // each other, 13 is novel (45° between axes)
    val batchVecs: Seq[(Long, Array[Float])] = Seq(
      (10L, Array(1f, 0f, 0f, 0f)),
      (11L, Array(0f, 1f, 0f, 0f)), (12L, Array(0f, 1f, 0f, 0f)),
      (13L, Array(1f, 1f, 1f, 1f)))
    val corpus = corpusVecs.toDF("vec_id", "embedding")
    val batch = batchVecs.toDF("vec_id", "embedding")
    val r = Similarity.incrementalSemDedup(corpus, batch, 2, 990000L)
      .select("new_id", "dup_id", "dup_source")
      .as[(Long, Long, String)].collect().toSet
    // plain-Scala replica: centroids from the CORPUS, both sides assigned
    val (corpusCell, cents) = detAssignScala(corpusVecs, 2)
    def cellOfVec(v: Array[Float]): Long =
      cents.toSeq.map { case (c, cv) => (l2(v, cv), c) }.min._2
    val expected = (for {
      (nid, nv) <- batchVecs
      (did, dv, src) <- corpusVecs.map { case (i, v) =>
          (i, v, "corpus") } ++
        batchVecs.filter(_._1 < nid).map { case (i, v) => (i, v, "batch") }
      if (if (src == "corpus") corpusCell(did) else cellOfVec(dv)) ==
        cellOfVec(nv)
      if cosMicro(dv, nv) >= 990000L
    } yield (nid, did, src)).toSet
    r shouldBe expected
    // the toy set genuinely hits both sources and spares the novel vector
    r.map(_._3) shouldBe Set("corpus", "batch")
    r.map(_._1) should not contain 13L
  }

  test("incrementalSemDedup: empty batch and sub-nCells corpus degenerate cleanly") {
    val emb = bundles(16).toDF("vec_id", "embedding")
    val empty = emb.filter(col("vec_id") < 0)
    // empty delivery against a standing corpus: no pairs, no crash
    Similarity.incrementalSemDedup(emb, empty, 2, 990000L).count() shouldBe 0L
    // corpus smaller than nCells: centroid sample is just smaller
    val tiny = bundles(16).take(1).toDF("vec_id", "embedding")
    val r = Similarity.incrementalSemDedup(tiny,
      bundles(16).drop(1).take(2).toDF("vec_id", "embedding"), 8, 990000L)
    r.count() should be >= 0L
  }

  test("maxSimTopK: hand-computed late-interaction scores on 3-vector docs") {
    // 4 docs × 3 vectors, deterministic tilts
    val vecs = (0 until 12).map { i =>
      val base = Array.fill(4)(0f)
      base(i % 4) = 1f
      base((i + 1) % 4) = 0.1f * (i % 5)
      (i.toLong, base)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val r = Similarity.maxSimTopK(emb, docSize = 3, probeDocs = Seq(0L),
      k = 3).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3)))).toMap
    val docOf = vecs.map { case (id, _) => id -> id / 3 }.toMap
    val probeVecs = vecs.filter { case (id, _) => docOf(id) == 0L }
    val scores = (1L to 3L).map { d =>
      val dv = vecs.filter { case (id, _) => docOf(id) == d }
      d -> probeVecs.map { case (_, q) =>
        dv.map { case (_, c) => cosMicro(q, c) }.max }.sum
    }
    val expected = scores.sortBy { case (d, s) => (-s, d) }.zipWithIndex
      .take(3).map { case ((d, s), i) => (0L, d) -> ((s, i + 1L)) }.toMap
    r shouldBe expected
  }
}
