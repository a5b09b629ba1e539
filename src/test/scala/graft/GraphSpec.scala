package graft

import graft.operators.Graph

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("pageRankMicro: a regular graph is a fixed point at 1.0") {
    // symmetric triangle: every node has outdeg 2 and two in-neighbors,
    // so rank stays 1e6: 150000 + (85 * (2 * (1e6 div 2))) div 100
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val r = Graph.pageRankMicro(tri, 4).as[(Long, Long)].collect().toMap
    r shouldBe Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L)
  }

  test("pageRankMicro: path graph matches the hand-computed rounds") {
    // symmetric path 1-2-3: outdeg(1)=outdeg(3)=1, outdeg(2)=2
    val path = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    // round 1: ends get 150000+(85*500000)div 100 = 575000;
    //          middle gets 150000+(85*2000000)div 100 = 1850000
    val r1 = Graph.pageRankMicro(path, 1).as[(Long, Long)].collect().toMap
    r1 shouldBe Map(1L -> 575000L, 2L -> 1850000L, 3L -> 575000L)
    // round 2: ends 150000+(85*(1850000 div 2))div 100 = 936250;
    //          middle 150000+(85*(575000+575000))div 100 = 1127500
    val r2 = Graph.pageRankMicro(path, 2).as[(Long, Long)].collect().toMap
    r2 shouldBe Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L)
  }

  test("pageRankMicro: total mass stays near N (integer truncation only leaks down)") {
    val star = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val total = Graph.pageRankMicro(star, 5).as[(Long, Long)]
      .collect().map(_._2).sum
    total should be <= 4000000L
    total should be > 3990000L
  }

  test("labelPropagation: barbell graph separates its two triangles") {
    // triangles {1,2,3} and {4,5,6} bridged by 3-4. Hand-stepped
    // synchronous rounds with the (count DESC, label ASC) tie-break:
    // r1 = (2,1,1,3,4,4), r2 = (1,1,1,4,3,3), r3 = (1,1,1,3,3,3) —
    // each triangle settles on its own min-id label despite the bridge
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r = Graph.labelPropagation(edges, 3).as[(Long, Long)].collect().toMap
    r shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L)
    // intermediate round pinned too: the synchronous schedule is the
    // determinism contract, so r1 must be exactly the hand computation
    val r1 = Graph.labelPropagation(edges, 1).as[(Long, Long)].collect().toMap
    r1 shouldBe Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 4L, 6L -> 4L)
  }

  test("kCoreSurvivors: K4 with a tail peels the tail in cascading rounds") {
    // K4 on {1,2,3,4} + tail 4-5-6: degrees 3,3,3,4,2,1. The 3-core is
    // the K4 — but reaching it takes TWO synchronized rounds (5 and 6
    // drop in round 1, 4's degree then falls to 3 and stays)
    def sym(pairs: (Long, Long)*) =
      (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val g = sym((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val r = Graph.kCoreSurvivors(g, k = 3, rounds = 3)
      .as[(Long, Long)].collect().sortBy(_._1)
    r shouldBe Array((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L))
    // a path has no 2-core: cascading peel empties it from the ends in
    val path = sym((1L, 2L), (2L, 3L), (3L, 4L))
    Graph.kCoreSurvivors(path, k = 2, rounds = 3).count() shouldBe 0L
  }

  test("triangleCounts: K4, star, and mixed graphs match hand counts") {
    // K4: 4 triangles, every node participates in C(3,2) = 3
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("a", "b")
    Graph.triangleCounts(k4).as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)

    // star: no triangles at all (hub orientation must not explode either)
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    Graph.triangleCounts(star).count() shouldBe 0L

    // two triangles sharing edge (1,2): nodes 1,2 in both, 3,4 in one
    val bowtie = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
      .toDF("a", "b")
    Graph.triangleCounts(bowtie).as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L)
  }

  test("triangleCounts equals the naive three-way join on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 120).map(_ => (rnd.nextInt(18).toLong,
        rnd.nextInt(18).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val eset = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val expected = (for {
      a <- nodes; b <- nodes if a < b; c <- nodes if b < c
      if eset((a, b)) && eset((b, c)) && eset((a, c))
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = Graph.triangleCounts(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    got shouldBe expected
  }

  test("linkScores: square-with-diagonal matches hand-computed overlaps") {
    // 1-2, 1-3, 2-3, 2-4, 3-4: N(1)={2,3} N(2)={1,3,4} N(3)={1,2,4} N(4)={2,3}
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val got = Graph.linkScores(edges)
      .select("a", "b", "common", "union_size", "jaccard_micro")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    got shouldBe Set(
      (1L, 2L, 1L, 4L, 250000L),
      (1L, 3L, 1L, 4L, 250000L),
      (2L, 3L, 2L, 4L, 500000L), // shares BOTH 1 and 4
      (2L, 4L, 1L, 4L, 250000L),
      (3L, 4L, 1L, 4L, 250000L))
  }

  test("linkScores covers only edges with a shared neighbor") {
    // path 1-2-3: no edge has a common neighbor -> empty
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    Graph.linkScores(path).count() shouldBe 0L
  }

  /** Reference md5 edge keep-filter, computed independently of Spark. */
  private def mdKeep(a: Long, b: Long, keep: Set[Char]): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$a:$b".getBytes("UTF-8"))
    keep(f"${d(0) & 0xff}%02x".charAt(0))
  }

  test("sampleEdges is the md5-prefix filter, exactly") {
    val edges = (for { a <- 1L to 30L; b <- 1L to 30L if a < b } yield (a, b))
    val keep = Set('0', '1', '2', '3')
    val got = Graph.sampleEdges(edges.toDF("a", "b"),
        Seq("0", "1", "2", "3")).as[(Long, Long)].collect().toSet
    got shouldBe edges.filter(e => mdKeep(e._1, e._2, keep)).toSet
    // p = 1/4 sanity on the 435-edge fixture: kept count near a quarter
    val frac = got.size.toDouble / edges.size
    frac should be > 0.15
    frac should be < 0.35
  }

  test("triangleCountsApprox: sampled counts are exact on the sampled subgraph, rescale is 64x") {
    // dense-ish deterministic graph so the p^3 = 1/64 survival leaves
    // triangles: K12 has C(12,3) = 220
    val edges = (for { a <- 1L to 12L; b <- 1L to 12L if a < b } yield (a, b))
    val keep = Set('0', '1', '2', '3')
    val sampled = edges.filter(e => mdKeep(e._1, e._2, keep)).toSet
    val nodes = (1L to 12L).toSeq
    val expected = (for {
      a <- nodes; b <- nodes if a < b; c <- nodes if b < c
      if sampled((a, b)) && sampled((b, c)) && sampled((a, c))
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = Graph.triangleCountsApprox(edges.toDF("a", "b"),
        Seq("0", "1", "2", "3"))
      .select("node", "n_sampled", "est_triangles")
      .as[(Long, Long, Long)].collect()
    got.map(r => r._1 -> r._2).toMap shouldBe expected
    got.foreach(r => r._3 shouldBe r._2 * 64)
  }

  test("triangleCountsApprox estimates the exact global count within DOULION bounds") {
    // estimator pin vs exact triangleCounts on a graph big enough for
    // T·p³ concentration: K40 (T = C(40,3) = 9880, E[T·p³] ≈ 154).
    // Everything is deterministic (md5 sample), so this is a fixed
    // arithmetic fact, not a flaky statistical assertion — the bound
    // just documents WHY the observed value is acceptable.
    val edges = (for { a <- 1L to 40L; b <- 1L to 40L if a < b } yield (a, b))
      .toDF("a", "b")
    val exact = Graph.triangleCounts(edges)
      .agg(org.apache.spark.sql.functions.sum("n_triangles"))
      .as[Long].collect().head / 3
    val est = Graph.triangleCountsApprox(edges, Seq("0", "1", "2", "3"))
      .agg(org.apache.spark.sql.functions.sum("est_triangles"))
      .as[Long].collect().head / 3
    est.toDouble should be > exact * 0.6
    est.toDouble should be < exact * 1.4
  }

  test("linkScoresApprox: counts are exact on the sampled subgraph, rescale is 16x") {
    val edges = (for { a <- 1L to 12L; b <- 1L to 12L if a < b } yield (a, b))
    val keep = Set('0', '1', '2', '3')
    val sampled = edges.filter(e => mdKeep(e._1, e._2, keep)).toSet
    val adj = sampled.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expected = sampled.toSeq.flatMap { case (a, b) =>
      val c = (adj.getOrElse(a, Set.empty) & adj.getOrElse(b, Set.empty)).size
      if (c > 0) Some((a, b) -> c.toLong) else None
    }.toMap
    val got = Graph.linkScoresApprox(edges.toDF("a", "b"),
        Seq("0", "1", "2", "3"))
      .select("a", "b", "common_sampled", "common_est")
      .as[(Long, Long, Long, Long)].collect()
    got.map(r => (r._1, r._2) -> r._3).toMap shouldBe expected
    got.foreach(r => r._4 shouldBe r._3 * 16)
  }

  test("sampleEdges rejects non-power-of-2 keepHex sizes (inexact 1/p^d rescale)") {
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Graph.sampleEdges(edges, Seq("0", "1", "2"))
    }
    e.getMessage should include("1, 2, 4 or 8")
  }

  test("DOULION p-sweep accuracy: every arm within 4 FULL-variance sigma of exact " +
      "(q330 instrument, VERDICT r8 item 4)") {
    // q330 on the sf0.001 co-purchase graph carries the whole sweep:
    // keepHex k in {1,2,4,8}, exact count, measured error, and the
    // KDD'09 plug-in stderr INCLUDING the shared-edge covariance term
    // 2r(1-p)/p — which dominates here (r ~ 65T), so the folklore
    // binomial bound would NOT hold (the k=8 arm sits at 10 binomial
    // sigma). The assertion uses the full stderr the query emits.
    val rows = SparkEntry.queries("q330_doulion_accuracy")(
        spark, "/root/testdata/sf0.001")
      .select("keep_hex", "est_tri", "exact_tri", "stderr_tri")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    rows.map(_._1).toSeq shouldBe Seq(1L, 2L, 4L, 8L)
    val exact = rows.head._3
    exact should be > 0L
    rows.foreach { case (k, est, ex, se) =>
      ex shouldBe exact
      se should be > 0.0
      math.abs(est - ex).toDouble should be <= 4.0 * se
    }
    // determinism: the md5 sample is a pure function of the edge set
    val again = SparkEntry.queries("q330_doulion_accuracy")(
        spark, "/root/testdata/sf0.001")
      .select("keep_hex", "est_tri").as[(Long, Long)].collect().sortBy(_._1)
    again.toSeq shouldBe rows.map(r => (r._1, r._2)).toSeq
  }

  test("arms-only DOULION error model: estimates match q330's arms, the " +
      "sampled-r̂ plug-in stderr tracks the exact-based one (q334, VERDICT r10 item 6)") {
    val plugin = SparkEntry.queries("q334_doulion_errmodel")(
        spark, "/root/testdata/sf0.001")
      .select("keep_hex", "sampled_tri", "est_tri", "r_hat", "stderr_tri")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    plugin.map(_._1).toSeq shouldBe Seq(1L, 2L, 4L)
    val exactRows = SparkEntry.queries("q330_doulion_accuracy")(
        spark, "/root/testdata/sf0.001")
      .select("keep_hex", "sampled_tri", "est_tri", "exact_tri", "stderr_tri")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    plugin.foreach { case (k, st, est, rHat, se) =>
      val (_, st330, est330, exact, se330) = exactRows(k)
      // the sampled count and estimator are the same md5-deterministic
      // functions q330 evaluates — must agree exactly
      st shouldBe st330
      est shouldBe est330
      rHat should be > 0L
      // the plug-in stderr (est_tri and r̂ substituted for exact T and r)
      // must track the exact-based stderr — measured within 7% on this
      // graph; the band allows plug-in noise at the sparse k=1 arm
      se should be > 0.5 * se330
      se should be < 2.0 * se330
      // and the error model must actually cover the measured error
      math.abs(est - exact).toDouble should be <= 4.0 * se
    }
    // determinism: pure function of the edge set
    val again = SparkEntry.queries("q334_doulion_errmodel")(
        spark, "/root/testdata/sf0.001")
      .select("keep_hex", "est_tri", "r_hat")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    again.toSeq shouldBe plugin.map(r => (r._1, r._3, r._4)).toSeq
  }

  test("q334 sparse-graph arm: sampled_tri = 0 emits NULL stderr, not a silent 0 (VERDICT r11 item 4)") {
    // One order containing parts {1, 12, 14} — one triangle whose three
    // edge hexes are md5('1:12')='1', md5('1:14')='0', md5('12:14')='2'
    // (found by construction), so the k=1 arm keeps one edge, k=2 keeps
    // two (no triangle either way → sampled_tri = 0 → NULL stderr: "no
    // signal at this rate", not "perfectly estimated"), and k=4 keeps
    // all three (sampled_tri = 1: est_tri = 4096 div 64 = 64, rc2 = 0 →
    // stderr = sqrt(64·(4096−64)/64) = sqrt(4032)).
    val dir = java.nio.file.Files.createTempDirectory("q334sparse").toString
    Seq((1L, 1L), (1L, 12L), (1L, 14L))
      .toDF("l_orderkey", "l_partkey")
      .repartition(1).write.parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q334_doulion_errmodel")(spark, dir)
      .select("keep_hex", "sampled_tri", "est_tri", "r_hat", "stderr_tri")
      .collect().sortBy(_.getLong(0))
    rows.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L, 4L)
    rows.take(2).foreach { r =>
      r.getLong(1) shouldBe 0L          // sampled_tri
      r.getLong(2) shouldBe 0L          // est_tri
      r.getLong(3) shouldBe 0L          // r_hat
      r.isNullAt(4) shouldBe true       // stderr: NULL, never 0
    }
    val k4 = rows(2)
    k4.getLong(1) shouldBe 1L
    k4.getLong(2) shouldBe 64L
    k4.getLong(3) shouldBe 0L
    k4.getDouble(4) shouldBe math.sqrt(4032.0)
  }

  test("sampleEdges keeps exactly the md5-prefix edges (k=8 half-sample)") {
    val edges = (for { a <- 1L to 30L; b <- 1L to 30L if a < b } yield (a, b))
    val keep = "01234567".toSet
    val expected = edges.filter(e => mdKeep(e._1, e._2, keep)).toSet
    val got = Graph.sampleEdges(edges.toDF("a", "b"),
        "01234567".map(_.toString))
      .as[(Long, Long)].collect().toSet
    got shouldBe expected
  }
}
