package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph measures over an edge list — the item-importance side
  * of the co-purchase story (Recommend.coPairs ranks pairs; this ranks
  * nodes). The reference has no graph surface; PageRank is the standard
  * importance score a recommendation/curation pipeline derives from a
  * co-occurrence graph.
  *
  * Engine-portability design: ranks live as integer MICROS (1.0 =
  * 1,000,000) and every step is integer arithmetic — `div` for the
  * per-edge split and for the 0.85 damping multiply — so the result is
  * bit-exact on any engine and any partitioning (integer sums are
  * order-free; the DuckDB oracle unrolls the same iterations as chained
  * CTEs with `//`, which equals `div` for non-negative operands).
  *
  * Scale shape (100 TB): the edge list with out-degree attached is
  * materialized ONCE (localCheckpoint) and reused every round; each
  * round is the canonical two-shuffle join-aggregate (rank joins edges
  * on src, contributions aggregate on dst) over edge rows only — state
  * per round is one long per node, never the input tables. Rounds are
  * a fixed small constant (the damping factor makes convergence
  * geometric), so total work is O(iters · |E|).
  */
object Graph {

  /** Distinct co-occurrence edges (a < b) from a two-column (o, p)
    * frame — the shared edge build of the co-purchase graph family.
    *
    * Round 12 (optimization): the former shape was
    * `po.distinct self-join on o + pair distinct` — three edge-volume
    * exchanges (the (o, p) distinct, the join re-key on o, the pair
    * distinct) plus a join. This build collapses the first two into ONE
    * `groupBy(o)` basket collect (partial collect_set dedups (o, p)
    * map-side) and generates the C(k, 2) ordered pairs MAP-SIDE from the
    * sorted basket (the q233 triple-mining pattern; basket size is
    * bounded by lines-per-order, a schema constant), so only the li rows
    * and the pair stream are ever shuffled: 3 exchanges + join → 2
    * exchanges, no join. Output is bit-identical (same distinct a < b
    * pair set — verified by full-frame hash at sf0.01).
    */
  def coOccurrenceEdges(op: DataFrame): DataFrame =
    op.groupBy(col("o"))
      .agg(sort_array(collect_set(col("p"))).as("ps"))
      .filter(size(col("ps")) > 1)
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"
      )).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()

  /** Symmetric (both-directions) co-occurrence edge list (src, dst) from
    * a (o, p) frame — the input shape of the iterative operators
    * (PageRank / k-core / LPA / modularity). Built as the a < b half
    * mirrored AFTER its distinct, so the distinct exchange runs on half
    * the rows (the halves are swaps of each other; the pre-r12 shape
    * distinct'ed the full symmetric pair stream).
    */
  def symmetricCoOccurrenceEdges(op: DataFrame): DataFrame = {
    val half = coOccurrenceEdges(op)
    half.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(half.select(col("b").as("src"), col("a").as("dst")))
  }

  /** `iters` rounds of damped PageRank (d = 0.85, sum-to-N convention:
    * every node's base term is 0.15) over a DISTINCT directed edge list
    * (src, dst). The graph must be dangling-free — callers with
    * symmetric edge sets (co-purchase) satisfy this by construction.
    * Output: (node, rank_micro).
    */
  def pageRankMicro(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "pageRankMicro needs at least one iteration")
    // Round 13 (optimization): NO per-round localCheckpoint. The round
    // count is a fixed constant and the query has exactly one action, so
    // the rounds compose into ONE plan above a single checkpoint of the
    // RAW edge list (lineage cut at the point of maximum reuse — a fully
    // checkpoint-free variant duplicated the whole edge-build subplan
    // per round and lost its shuffle savings to planning time). The
    // repeated edgeDeg subplan above the checkpoint is deduplicated at
    // runtime by AQE's stage cache (canonically equal exchanges
    // materialize once), and — the real win — partitioning stays VISIBLE
    // to EnsureRequirements across rounds, which the old per-round
    // checkpoints erased (LogicalRDD reports UnknownPartitioning under
    // AQE, so every round re-shuffled the edge frame). Shape now:
    // edgeDeg is hash(src) from its build join; each round's rank frame
    // arrives hash(dst→node→src) via alias-aware partitioning from the
    // previous round's aggregate — BOTH join sides are co-partitioned,
    // so a round's only exchange is its contribution groupBy(dst).
    val e = edges.localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // SHUFFLE_HASH on the node-sized deg side — the per-round driver-
    // broadcast trap (round 12) applies to the build join too
    val edgeDeg = e.join(deg.hint("shuffle_hash"), "src")
      .select(col("src"), col("dst"), col("outdeg"))
    // rank init straight from deg: its keys ARE the distinct srcs, and
    // deg's stages are shared with edgeDeg's build side, so no separate
    // distinct pass runs (the round-12 "init re-executed the edge build"
    // problem was a checkpoint-boundary artifact — one plan, one build)
    var rank = deg.select(col("src").as("node"),
      lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iters) {
      rank = edgeDeg
        .join(rank.withColumnRenamed("node", "src").hint("shuffle_hash"),
          Seq("src"))
        .select(col("dst"), expr("rank_micro div outdeg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(85 * s) div 100")).as("rank_micro"))
    }
    rank
  }

  /** `rounds` synchronized peel rounds toward the k-core: each round
    * drops every node whose degree among current survivors is below k,
    * then restricts the edge set to surviving endpoints. A fixed small
    * round count makes the operator deterministic and oracle-expressible
    * (the DuckDB twin unrolls the same rounds); callers pick `rounds`
    * large enough to reach the fixpoint for their graph — peeling
    * removes at least one node per non-converged round, and the spec
    * asserts fixpoint at spec scale.
    *
    * Input: UNDIRECTED distinct symmetric edges (src, dst) — both
    * directions present, like the co-purchase graph. Output: surviving
    * (node, degree) after the final round. Scale: each round is one
    * degree aggregate + one semi-join-shaped edge restriction over edge
    * rows only, checkpointed so lineage stays flat — O(rounds · |E|).
    */
  def kCoreSurvivors(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(rounds >= 1 && k >= 1, "kCore needs rounds >= 1 and k >= 1")
    // Round 13 (optimization): checkpoint every OTHER round instead of
    // every round (and never checkpoint the node-sized keep frame) — a
    // 2-round SPAN is one plan, so inside it partitioning stays visible:
    // the span's second round restricts the endpoint the first round's
    // last exchange already clustered by (free), and the degree
    // aggregate always groups on the key of the last restriction. That
    // grouping key alternates between src and dst across rounds — valid
    // because restricting BOTH endpoints by the same keep set preserves
    // the edge set's symmetry ((s,d) survives iff (d,s) does), so
    // per-node dst-counts equal src-counts exactly, every round.
    // Per 2 rounds: 3 edge exchanges + 1 materialization, down from 4
    // edge exchanges + 2 edge + 2 keep materializations. The duplicated
    // in-span subplans (each round references its predecessor twice:
    // once for the keep set's degree, once as the restricted stream)
    // share their exchanges through AQE's runtime stage cache; spans are
    // capped at 2 so the duplication never compounds past 4 leaf scans.
    def degOn(f: DataFrame, key: String): DataFrame =
      f.groupBy(col(key).as("node")).agg(count(lit(1)).as("deg"))
    def restrict(f: DataFrame, keep: DataFrame, key: String): DataFrame =
      // LEFT SEMI shuffled-hash (round 12, guide §2.4/§3.1): keep's
      // nodes are unique so inner ≡ semi; the hash build is the
      // node-sized keep frame while the edge side streams unsorted
      f.join(keep.withColumnRenamed("node", key).hint("shuffle_hash"),
        Seq(key), "left_semi")
    var e = edges.select(col("src"), col("dst")).localCheckpoint()
    var degKey = "src"
    var deg = degOn(e, degKey)
    var r = 0
    while (r < rounds) {
      val span = math.min(2, rounds - r)
      for (_ <- 0 until span) {
        val keep = deg.filter(col("deg") >= k).select(col("node"))
        // restrict the CURRENT clustering key first (no exchange), the
        // other endpoint second — the round ends clustered by the other
        // endpoint, which the next degree aggregate then reuses
        val other = if (degKey == "src") "dst" else "src"
        e = restrict(restrict(e, keep, degKey), keep, other)
          .select(col("src"), col("dst"))
        degKey = other
        deg = degOn(e, degKey)
      }
      e = e.localCheckpoint()
      // re-derive deg from the materialized frame so the NEXT span's
      // keep doesn't re-execute this span's lineage
      deg = degOn(e, degKey)
      r += span
    }
    deg.filter(col("deg") >= k).select(col("node"), col("deg"))
  }

  /** Synchronous label-propagation community detection over UNDIRECTED
    * distinct symmetric edges (src, dst): every node starts labeled with
    * its own id, and each round every node adopts the most frequent label
    * among its NEIGHBORS (ties to the smallest label — with the
    * synchronous schedule this makes the whole run a pure function of the
    * edge set, unlike the asynchronous textbook variant whose result
    * depends on visit order). Fixed `iters` rounds (the DuckDB twin
    * unrolls the same rounds); LPA's classic oscillation risk on
    * bipartite-ish structure is bounded by the fixed round count — this
    * is the community SCREEN, not a converged partition.
    *
    * Scale: each round is one edge⋈labels equi-join on the dst key, one
    * map-side-combining (node, label) count, and one per-node argmax
    * window partitioned by node — all linear in |E| with no fan-out
    * beyond the label-frequency frame; checkpointed per round so lineage
    * stays flat, like the peel/rank loops above.
    */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "labelPropagation needs iters >= 1")
    // Round 13 (optimization): NO per-round localCheckpoint — fixed
    // round count + single action means the rounds compose into ONE
    // plan (see pageRankMicro). The explicit repartition pins the edge
    // frame hash(dst): every round's join consumes it with no further
    // exchange (its REPARTITION_BY_COL shuffle materializes once and is
    // stage-cache-shared by all rounds), and each round's labels arrive
    // already hash(src→node→dst) from the argmax aggregate via alias-
    // aware partitioning — so a round's only exchanges are its two
    // aggregates. The old shape re-shuffled edges AND labels every
    // round because the checkpoint boundary erased the partitioning.
    // REPARTITION_BY_NUM (explicit width = spark.sql.shuffle.partitions,
    // scale-adaptive, not a constant): the un-numbered variant is fair
    // game for AQE byte-based coalescing, which halved task parallelism
    // on these CPU-bound join/aggregate rounds (measured: 16 of 32
    // cores busy) — the same AQE-vs-CPU-stage lesson as q97 (round 12).
    val parts = edges.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val e = edges.repartition(parts, col("dst"))
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      // SHUFFLE_HASH on the node-sized labels side (round 12): letting
      // the planner broadcast the labels costs a serial driver
      // collect+build+ship per iteration, and at 100 TB node counts a
      // broadcast of the label frame is not viable at all. The hinted
      // build side stays the per-partition node slice; the edge side
      // streams unsorted.
      //
      // ONE exchange per round (round 13): hash(src) satisfies the
      // clustering requirement of BOTH the (src, label) count and the
      // per-src argmax, so the explicit src repartition replaces the
      // two ENSURE_REQUIREMENTS exchanges the aggregates used to plan
      // ((src, label) partials, then (src)) — map-side combining lost
      // nothing there, since neighbor labels within a dst partition are
      // mostly distinct per (src, label) and the partials shipped ~the
      // raw row count anyway.
      val freq = e
        .join(labels.select(col("node").as("dst"), col("label"))
          .hint("shuffle_hash"), Seq("dst"))
        .select(col("src"), col("label"))
        .repartition(parts, col("src"))
        .groupBy(col("src"), col("label")).agg(count(lit(1)).as("c"))
      // per-node argmax as a DECLARATIVE aggregate instead of a
      // row_number window (round 12, guide §2.3): max_by over the
      // (count, −label) struct picks the same (c desc, label asc)
      // winner — labels are non-negative node ids, so the negate never
      // overflows — runs in the SAME stage as the count (both satisfied
      // by the src repartition above)
      labels = freq.groupBy(col("src"))
        .agg(max_by(col("label"),
          struct(col("c"), (-col("label")).as("nl"))).as("label"))
        .select(col("src").as("node"), col("label"))
    }
    labels
  }

  /** Per-node triangle participation counts over an UNDIRECTED distinct
    * edge list `(a, b)` with `a < b` — the local clustering signal that
    * separates genuine communities from star-shaped hubs in a
    * co-occurrence graph.
    *
    * Algorithm: degree-ordered orientation (Chiba–Nishizeki / Schank's
    * "forward" algorithm). Orient every edge from its (degree, id)-smaller
    * endpoint to the larger; each triangle then has exactly one node with
    * both out-edges (its π-smallest corner), so enumerating wedges from
    * out-neighborhoods and closing them with one equi-join against the
    * oriented edges counts every triangle exactly once. The orientation is
    * the scale guarantee: out-degree is O(√m) on ANY graph, so wedge
    * volume is Σ outdeg² ≤ m·√m and the plan never expands the quadratic
    * neighborhood of a hub — the failure mode of the naive three-way
    * edge join this replaces.
    *
    * Shapes: degree attach is two key joins; the wedge stage is ONE
    * self-join on the oriented source (both sides the same checkpointed
    * frame); closing is one equi-join on the (x, y) pair; per-node rollup
    * explodes the three corners map-side. No driver-side state.
    */
  def triangleCounts(edges: DataFrame): DataFrame =
    orientedTriangles(edges)
      .select(explode(array(col("apex"), col("x"), col("y"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))

  /** Every triangle of the undirected `(a, b), a < b` edge list, emitted
    * exactly once as (apex, x, y) — apex is the π-smallest corner, (x, y)
    * the π-ordered closing edge. Shared core of [[triangleCounts]] and
    * [[linkScores]]; see triangleCounts for the m·√m wedge bound.
    *
    * Round 12 (optimization, guide §2.3/§8): the former shape EXPLODED
    * the wedges — Σ outdeg² rows — through an exchange on (x, y) and
    * sort-merge-joined them against the oriented edges (two SMJ sorts of
    * wedge volume; the measured 78 GB sf10 scratch wall). This shape
    * never ships a wedge row: out-neighborhoods are collected ONCE into
    * per-node (deg, id)-sorted arrays, each oriented edge (u, v) carries
    * A(u) across ONE exchange on v, and the triangles fall out of a
    * MAP-SIDE `array_intersect(A(u), A(v))` — per-edge work is the same
    * Σ wedge comparisons, but as packed long arrays inside a codegen
    * stage instead of shuffled+sorted rows. The closing join builds its
    * hash table from the adjacency frame (SHUFFLE_HASH hint: m arrays),
    * so nothing of wedge volume is ever sorted. Triangle set is
    * bit-identical (same π-orientation; verified by full-frame hash).
    */
  private[graft] def orientedTriangles(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // π-orientation: src = (deg, id)-smaller endpoint; dst rides as a
    // (deg, id) struct so adjacency arrays need no degree re-join
    // degree attach: SHUFFLE_HASH build on the node-sized deg frame so
    // the edge frame streams unsorted through both joins (round 12 —
    // the sf1 fingerprint showed these as SortMergeJoins, i.e. two
    // full sorts of edge volume for a key attach)
    val aFirst = edges
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a"))
        .hint("shuffle_hash"), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b"))
        .hint("shuffle_hash"), Seq("b"))
      .select(col("a"), col("b"), col("deg_a"), col("deg_b"),
        (col("deg_a") < col("deg_b") ||
          (col("deg_a") === col("deg_b") && col("a") < col("b"))).as("fwd"))
    val dir = aFirst.select(
      when(col("fwd"), col("a")).otherwise(col("b")).as("src"),
      when(col("fwd"), col("b")).otherwise(col("a")).as("dst"))
    // out-neighborhoods as PLAIN LONG arrays — the intersection never
    // needs the neighbor's degree (every intersection element is a
    // common OUT-neighbor; π-order of (x, y) is irrelevant to all
    // aggregate consumers), and array_intersect over primitive longs
    // runs the codegen'd specialized path where struct elements fall
    // back to interpreted row comparisons. Reused by the probe explode
    // AND as the closing hash side, so materialized once. The
    // checkpoint is LOAD-BEARING (round 13, measured): dropping it in
    // favor of AQE runtime stage reuse shares only the EXCHANGES — the
    // post-exchange collect_list final merge re-executes per consumer,
    // and q154 regressed 4.0 -> 9.2 s at sf0.1. Checkpoint kept.
    val adj = dir.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("nb"))
      .localCheckpoint()
    val probe = adj
      .select(col("src"), col("nb"), explode(col("nb")).as("dst"))
    probe
      .join(adj.select(col("src").as("dst"), col("nb").as("nb2"))
        .hint("shuffle_hash"), Seq("dst"))
      .select(col("src").as("apex"), col("dst").as("x"),
        explode(array_intersect(col("nb"), col("nb2"))).as("y"))
  }

  /** Deterministic DOULION edge sampling: keep edge (a, b) iff the first
    * hex char of md5("a:b") falls in `keepHex` — keep probability
    * p = |keepHex|/16 with NO RNG, so the sparsified graph is a pure
    * function of the edge set (the q34 md5-prefix convention) and an
    * external engine can replay the exact same subgraph for a full-hash
    * oracle. This is the sampling primitive of the approximate graph
    * arms below — the safety valve for graphs whose exact wedge volume
    * exceeds a cluster's scratch budget.
    */
  def sampleEdges(edges: DataFrame, keepHex: Seq[String]): DataFrame = {
    require(keepHex.nonEmpty && keepHex.size < 16,
      "keepHex must be a proper nonempty subset of the 16 hex chars")
    // power-of-2 sizes only (p ∈ {1/16, 1/8, 1/4, 1/2}): the downstream
    // 16^d div |keepHex|^d rescales are exact integers only when
    // |keepHex| divides 16 — any other size silently truncates every
    // per-node estimate downward, contradicting the unbiasedness doc
    require(Set(1, 2, 4, 8).contains(keepHex.size),
      s"keepHex size must be 1, 2, 4 or 8 so the 1/p^d integer rescale " +
        s"is exact; got ${keepHex.size}")
    edges.filter(substring(md5(concat(col("a").cast("string"), lit(":"),
      col("b").cast("string"))), 1, 1).isin(keepHex: _*))
  }

  /** DOULION-style approximate per-node triangle counts (Tsourakakis,
    * Kang & Faloutsos, KDD'09): count triangles EXACTLY on the
    * [[sampleEdges]]-sparsified graph, then rescale by 1/p³ — each
    * triangle survives iff all three edges do, so the sampled count is
    * Binomial(T, p³) and `count·(1/p³)` is unbiased, with relative
    * error ~1/√(T·p³) on any graph whose triangle count isn't tiny.
    *
    * Why this is the 100 TB arm: the exact [[triangleCounts]] wedge
    * stage is m·√m-bounded but its SCRATCH (wedge shuffle spill) scales
    * with the wedge volume itself; sampling at p cuts edges to p·m and
    * wedge volume to ~p²·Σdeg² — a 1/16 scratch cut at p=1/4 — while
    * the md5 determinism keeps the whole pipeline full-hash oracle-able.
    * Output: (node, n_sampled, est_triangles) where est_triangles =
    * (n_sampled · 16³) div |keepHex|³ — exact integer scaling, no
    * doubles (at p=1/4 the factor is exactly 64).
    */
  def triangleCountsApprox(edges: DataFrame, keepHex: Seq[String]): DataFrame = {
    val k = keepHex.size.toLong
    triangleCounts(sampleEdges(edges, keepHex))
      .withColumnRenamed("n_triangles", "n_sampled")
      .withColumn("est_triangles",
        expr(s"(n_sampled * ${16L * 16L * 16L}) div ${k * k * k}"))
  }

  /** Approximate common-neighbor link scores on the [[sampleEdges]]-
    * sparsified graph: for each SURVIVING edge, the exact common-neighbor
    * count within the sampled graph plus its unbiased rescale — a wedge
    * a–c–b survives iff both of ITS edges survive (the scored edge (a,b)
    * is never one of them, c ≠ a,b), so E[common_sampled] = p²·common
    * and `common_sampled · 16² div |keepHex|²` estimates the true count.
    * Same scratch argument as [[triangleCountsApprox]]: wedge volume
    * drops ~p², which is what makes the q194 shape fit a bounded
    * scratch budget at 100×.
    */
  def linkScoresApprox(edges: DataFrame, keepHex: Seq[String]): DataFrame = {
    val k = keepHex.size.toLong
    linkScores(sampleEdges(edges, keepHex))
      .select(col("a"), col("b"), col("common").as("common_sampled"),
        expr(s"(common * ${16L * 16L}) div ${k * k}").as("common_est"))
  }

  /** Neighborhood-overlap link scores — the classic link-prediction /
    * edge-strength feature: for every EDGE whose endpoints share at least
    * one neighbor, the common-neighbor count and the Jaccard overlap of
    * the two neighborhoods, |N(a)∩N(b)| / |N(a)∪N(b)| with the union
    * counted as deg(a)+deg(b)−common (both endpoints are in each other's
    * neighborhoods but never their own, so the edge itself never counts).
    * Emitted as exact integer micros (1e6·common div union) — no doubles.
    *
    * Scale shape: common-neighbor counts per edge are exactly triangles
    * per edge, so the enumeration reuses [[orientedTriangles]]'s m·√m
    * wedge machinery — each triangle credits its three edges map-side —
    * and never expands any neighborhood quadratically. Degrees re-attach
    * by two key joins on the edge-aggregate-sized frame.
    */
  def linkScores(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // each triangle's three edges, normalized back to a < b storage order
    val common = orientedTriangles(edges)
      .select(explode(array(
        struct(least(col("x"), col("y")).as("a"),
          greatest(col("x"), col("y")).as("b")),
        struct(least(col("apex"), col("x")).as("a"),
          greatest(col("apex"), col("x")).as("b")),
        struct(least(col("apex"), col("y")).as("a"),
          greatest(col("apex"), col("y")).as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a"))
        .hint("shuffle_hash"), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b"))
        .hint("shuffle_hash"), Seq("b"))
      .select(col("a"), col("b"), col("common"),
        (col("deg_a") + col("deg_b") - col("common")).as("union_size"),
        expr("(1000000 * common) div (deg_a + deg_b - common)")
          .as("jaccard_micro"))
  }
}
