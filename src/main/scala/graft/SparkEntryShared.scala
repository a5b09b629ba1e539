package graft

import graft.operators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared fragments of the per-family query catalogs: table
  * loaders, derived frames, and the oracle-SQL building blocks
  * (exact-money/els CTEs, kernels' DuckDB twins). Split out of
  * the former single-file SparkEntry in round 6 — contents are
  * verbatim, only the `private` modifiers moved to the object.
  */
private[graft] object SparkEntryShared {
  // ---- shared fragments -------------------------------------------------

  def events(s: SparkSession, dir: String) = Tables.load(s, dir, "events")
  def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** Finite-support guard for rank statistics (adversarial sweep r9):
    * percentiles/medians are defined over the FINITE values only — NaN
    * breaks DuckDB's quantile sort comparator outright (IEEE NaN
    * comparisons make its ordering undefined: quantile_cont([1,2,3,NaN])
    * returns NaN but [1,2,NaN] returns 2.0) and Spark deterministically
    * sorts NaN last, so the engines cannot agree on ANY contract that
    * includes non-finite values. NULL-ing them keeps row counts intact
    * (aggregates skip NULL on both engines). `NaN <= MaxValue` is false
    * in Spark (NaN compares larger than everything), so `abs(c)` inside
    * the band is exactly isfinite. DuckDB twin: [[FiniteValue]].
    */
  def finiteVal(c: Column): Column =
    when(abs(c) <= lit(Double.MaxValue), c)
  val FiniteValue = "(CASE WHEN isfinite(value) THEN value END)"


  def corruptedEvents(s: SparkSession, dir: String): DataFrame =
    Validation.corruptEvents(events(s, dir))
      .select(col("event_id"), col("ts_us"), col("user_id"), col("event_type"),
        col("value"), col("props"))

  val CorruptedCte =
    """WITH corrupted AS (
      |  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
      |         CASE WHEN event_id % 97 = 0 THEN NULL ELSE value END AS value,
      |         props
      |  FROM events)""".stripMargin

  def qDailyKpis(s: SparkSession, dir: String): DataFrame =
    Kpi.dailyKpis(events(s, dir), t(s, dir, "customer"))

  def enriched(s: SparkSession, dir: String): DataFrame =
    Kpi.enrich(events(s, dir), t(s, dir, "customer"))

  def top3Types(s: SparkSession, dir: String): DataFrame =
    Kpi.topKPerGroup(enriched(s, dir), Seq("event_date", "segment"), "event_type", 3)
      .withColumn("rank", col("rank").cast("long"))

  /** Oracle CTE shared by q04/q05/q06: events×customer with derived date. */
  val EnrichedCte =
    """WITH e AS (
      |  SELECT CAST(ts AS DATE) AS event_date, c_mktsegment AS segment, event_type
      |  FROM events JOIN customer ON user_id = c_custkey)""".stripMargin

  // exact money sum: sum of integer cents, then one conversion to double
  val SumCents = "CAST(sum(CAST((CASE WHEN isfinite(value) THEN floor(value * 100 + 0.5) END) AS BIGINT)) AS DOUBLE) / 100.0"

  // DuckDB twin of functions.VectorFunctions.vdot: sequential left fold of
  // per-element double products (0.0 + x1 ≡ x1, so no-init list_reduce is
  // bit-identical to Spark's 0.0-seeded aggregate()).
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (acc, x) -> acc + x)"

  val EmbCte =
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding,
       |         sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings)""".stripMargin

  /** DuckDB twin of VectorFunctions.cosineWithNorms INCLUDING the
    * zero-vector contract (round-8 adversarial sweep): zero-norm vectors
    * are defined to have cosine 0.0 with everything — the unguarded
    * division crashed 15 vector-family queries at once under ANSI mode.
    */
  def cosSql(a: String, b: String, na: String, nb: String): String =
    s"(CASE WHEN $na * $nb = 0 THEN 0.0 ELSE ${dotSql(a, b)} / ($na * $nb) END)"

  // static dirty CSV / JSONL committed with the repo (absolute: the
  // driver's DuckDB oracle runs from an unknown cwd)
  val DirtyCsvPath = "/root/repo/testdata-ext/dirty_events.csv"
  val JsonlPath = "/root/repo/testdata-ext/docs.jsonl"

  // DuckDB twin of functions.TextFunctions
  val ToksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  val NormSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  val ShinglesSql =
    "list_distinct([substr(text, CAST(x AS INT), 3) for x in range(1, CAST(length(text) AS BIGINT) - 1)])"

  // q109: one literal term list drives BOTH the Spark query and the
  // generated oracle SQL, so the two sides cannot drift
  val Bm25Terms = Seq("table", "row", "join")

  // q231: the truncated-RBO weight table (p = 0.9, depth 20) — the
  // geometric weights are computed ONCE here and embedded as literals in
  // BOTH the Spark frame and the oracle's VALUES list, so no runtime
  // pow() (libm, engine-divergent) ever executes
  val RboWeightsMicro: Seq[Long] =
    (1 to 20).map(d => math.round(1e6 * 0.1 * math.pow(0.9, d - 1)))

  // q225: ONE fixed merge table (a tokenizer is a deployment ARTIFACT,
  // not a function of the data being tokenized) drives both the Spark
  // fold over `graft_pair_merge` and the generated DuckDB replace-chain
  // oracle, so the two sides cannot drift. Applied in list order.
  val BpeAppliedMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"), ("o", "r"),
    ("e", "n"), ("t", "i"))

  // q121: ONE expression string drives both the Spark side and the oracle
  // so the checksum definitions cannot drift. Every step reduces mod
  // 1e9+7 before the next multiply, so intermediates stay < 1.4e11 —
  // exact BIGINT arithmetic in both engines, no overflow, no doubles.
  private[graft] val ChecksumExpr =
    "(((((l_orderkey % 1000000007) * 131 + l_linenumber) % 1000000007) " +
      "* 131 + CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) " +
      "% 1000000007) % 1000000007) * 131 % 1000000007 + ascii(l_returnflag)"

  /** DuckDB twin of Retrieval.bm25 (k1c=120, bc=75, topK=20): same
    * rational idf, same cleared-fraction tf-part, same association order
    * in the double math, same micro-rounding — see Retrieval.scala for
    * why each of those makes the hash-compare exact.
    */
  def bm25OracleSql(terms: Seq[String]): String = {
    val tfDefs = terms.indices.map(i =>
      s"CAST(len(list_filter($ToksSql, x -> x = '${terms(i)}')) AS BIGINT) AS tf_$i").mkString(",\n         ")
    val dfDefs = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$i").mkString(",\n         ")
    val contribs = terms.indices.map(i =>
      s"""(CASE WHEN tf_$i > 0 THEN CAST(floor(
         |      (CAST(2*n_docs - 2*df_$i + 1 AS DOUBLE) / (2*df_$i + 1)) *
         |      (CAST(tf_$i * 22000 * sum_dl AS DOUBLE) /
         |       (10000*sum_dl*tf_$i + 3000*sum_dl + 9000*dl*n_docs)) *
         |      1000000 + 0.5) AS BIGINT) ELSE 0 END)""".stripMargin).mkString(" +\n    ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CAST(len($ToksSql) AS BIGINT) AS dl,
       |         $tfDefs
       |  FROM documents),
       |s AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(dl) AS BIGINT) AS sum_dl,
       |         $dfDefs
       |  FROM d)
       |SELECT doc_id, dl, score_micro FROM (
       |  SELECT doc_id, dl,
       |    $contribs AS score_micro
       |  FROM d, s)
       |WHERE score_micro > 0
       |ORDER BY score_micro DESC, doc_id ASC
       |LIMIT 20""".stripMargin
  }

  /** DuckDB twin of Graph.pageRankMicro: the same `iters` integer-micro
    * rounds unrolled as chained CTEs. `//` equals Spark's `div` for the
    * non-negative operands here, and integer sums are order-free, so the
    * match is exact by construction.
    */
  def pageRankOracleSql(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT e.dst AS node,
         |         150000 + (85 * CAST(sum(r${k - 1}.rank_micro // d.outdeg) AS BIGINT)) // 100
         |           AS rank_micro
         |  FROM e JOIN d USING (src) JOIN r${k - 1} ON r${k - 1}.node = e.src
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       |d AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
       |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank_micro FROM d),
       |$steps
       |SELECT node, rank_micro FROM r$iters""".stripMargin
  }

  /** Chained-CTE body for Graph.labelPropagation's DuckDB twin: the
    * co-purchase edge set, l0 = identity labels, then `iters` synchronous
    * rounds (neighbor-label frequencies, per-node argmax with the
    * (count DESC, label ASC) tie-break). Composable — q248 selects the
    * final labels, q268 builds modularity on top of them.
    */
  def lpaCtes(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      s"""f$k AS (
         |  SELECT e.src AS node, l.label, CAST(count(*) AS BIGINT) AS c
         |  FROM e JOIN l${k - 1} l ON e.dst = l.node
         |  GROUP BY 1, 2),
         |l$k AS (
         |  SELECT node, label FROM (
         |    SELECT node, label,
         |           row_number() OVER (PARTITION BY node
         |             ORDER BY c DESC, label ASC) AS rk
         |    FROM f$k) WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""e AS (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
       |$steps""".stripMargin
  }

  def lpaOracleSql(iters: Int): String =
    s"WITH ${lpaCtes(iters)}\nSELECT node, label FROM l$iters"

  /** DuckDB twin of Graph.kCoreSurvivors: the same `rounds` synchronized
    * peel rounds unrolled as chained CTEs (keep nodes with deg >= k,
    * restrict edges to surviving endpoints, recompute degrees), ending
    * with the same final degree filter.
    */
  def kCoreOracleSql(k: Long, rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      s"""k$r AS (SELECT src AS node FROM d${r - 1} WHERE deg >= $k),
         |e$r AS (SELECT e.src, e.dst FROM e${r - 1} e
         |        JOIN k$r a ON e.src = a.node JOIN k$r b ON e.dst = b.node),
         |d$r AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
         |        FROM e$r GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       |d0 AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e0 GROUP BY 1),
       |$steps
       |SELECT src AS node, deg FROM d$rounds WHERE deg >= $k""".stripMargin
  }

  // DuckDB twin of Similarity.sqDistCentroid: same element-ordered fold,
  // same per-element cast/subtract/square, list_reduce's no-init start is
  // bit-identical to the 0D seed (0.0 + x1 ≡ x1, the dotSql argument)
  private def sqDistSql(e: String, c: String): String =
    s"""list_reduce(list_transform(list_zip($e, $c), s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)) * (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))), (acc, x) -> acc + x)"""

  /** DuckDB twin of Similarity.fitQuantizerDet, `iters` Lloyd rounds
    * UNROLLED: md5-bucket fit set + tiny-corpus floor (deduped on
    * vec_id), md5-sample init, per-round (argmin assignment → fixed-point
    * centroid update → empty-cell carryover). Emits CTEs ending in the
    * final centroid frame, whose name is returned alongside the SQL.
    */
  def quantizerCtes(nCells: Int, fitFraction: Double, iters: Int,
                    dim: Int = 64): (String, String) = {
    val keepHex = "%02x".format(
      math.min(255L, math.max(1L, math.ceil(fitFraction * 256).toLong)))
    val ctes = Seq(
      s"""fs AS (
         |  SELECT DISTINCT ON (vec_id) vec_id, embedding FROM (
         |    SELECT vec_id, embedding FROM embeddings
         |    WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 2) < '$keepHex'
         |    UNION ALL
         |    SELECT vec_id, embedding FROM (
         |      SELECT vec_id, embedding FROM embeddings
         |      ORDER BY vec_id LIMIT ${nCells * 20})))""".stripMargin,
      s"""c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS cell,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
         |  FROM (SELECT vec_id, embedding FROM fs
         |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nCells))""".stripMargin) ++
      (1 to iters).flatMap { r =>
        Seq(
          s"""a$r AS (
             |  SELECT cell, embedding FROM (
             |    SELECT c.cell, f.embedding,
             |           row_number() OVER (PARTITION BY f.vec_id
             |             ORDER BY ${sqDistSql("f.embedding", "c.centroid")}, c.cell) AS rn
             |    FROM fs f, c${r - 1} c) WHERE rn = 1)""".stripMargin,
          s"""u$r AS (
             |  SELECT cell, list(val ORDER BY dim) AS centroid FROM (
             |    SELECT cell, dim,
             |           CAST(sum(fp) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 16777216.0) AS val
             |    FROM (SELECT a.cell, j.dim,
             |                 CAST(floor(CAST(a.embedding[j.dim] AS DOUBLE) * 16777216.0) AS BIGINT) AS fp
             |          FROM a$r a, (SELECT unnest(range(1, ${dim + 1})) AS dim) j)
             |    GROUP BY 1, 2) GROUP BY 1)""".stripMargin,
          s"""c$r AS (
             |  SELECT p.cell, coalesce(u.centroid, p.centroid) AS centroid
             |  FROM c${r - 1} p LEFT JOIN u$r u USING (cell))""".stripMargin)
      }
    (ctes.mkString(",\n"), s"c$iters")
  }

  /** Full q26 oracle: quantizer rounds + corpus single-cell assignment +
    * nProbe probe ranking + exact cosine top-k — Similarity.ivfKnnFrom
    * end-to-end in SQL.
    */
  def ivfKnnOracleSql(nCells: Int, fitFraction: Double, iters: Int,
                      nProbe: Int, k: Int, maxProbeId: Long): String = {
    val (ctes, cf) = quantizerCtes(nCells, fitFraction, iters)
    s"""WITH $ctes,
       |idx AS (
       |  SELECT vec_id AS neighbor_id, embedding,
       |         sqrt(${dotSql("embedding", "embedding")}) AS nrm, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${sqDistSql("e.embedding", "c.centroid")}, c.cell) AS rn
       |    FROM embeddings e, $cf c) WHERE rn = 1),
       |prb AS (
       |  SELECT vec_id AS query_id, embedding,
       |         sqrt(${dotSql("embedding", "embedding")}) AS nrm, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${sqDistSql("e.embedding", "c.centroid")}, c.cell) AS rn
       |    FROM embeddings e, $cf c WHERE e.vec_id < $maxProbeId) WHERE rn <= $nProbe),
       |scored AS (
       |  SELECT p.query_id, i.neighbor_id,
       |         ${cosSql("p.embedding", "i.embedding", "p.nrm", "i.nrm")} AS cos_sim
       |  FROM prb p JOIN idx i USING (cell)
       |  WHERE p.query_id <> i.neighbor_id)
       |SELECT query_id, neighbor_id, cos_sim, "rank" FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |             ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT) AS "rank"
       |  FROM scored) WHERE "rank" <= $k""".stripMargin
  }

  /** Full q94 oracle: quantizer rounds + nProbe multi-assignment + cell
    * equi-join + exact cosine threshold — Dedup.embeddingNearDupDet
    * end-to-end in SQL.
    */
  def neardupIvfOracleSql(nCells: Int, fitFraction: Double, iters: Int,
                          nProbe: Int, threshold: String): String = {
    val (ctes, cf) = quantizerCtes(nCells, fitFraction, iters)
    s"""WITH $ctes,
       |asg AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotSql("embedding", "embedding")}) AS nrm, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${sqDistSql("e.embedding", "c.centroid")}, c.cell) AS rn
       |    FROM embeddings e, $cf c) WHERE rn <= $nProbe)
       |SELECT DISTINCT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
       |       ${cosSql("a.embedding", "b.embedding", "a.nrm", "b.nrm")} AS cos_sim
       |FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |WHERE ${cosSql("a.embedding", "b.embedding", "a.nrm", "b.nrm")} >= $threshold""".stripMargin
  }

  /** Full q23 oracle: multi-table random-hyperplane LSH end-to-end in SQL.
    * The plane matrices are the SAME fixed-seed literals the Spark plan
    * compiles in (Similarity.planesSeeded — single source of truth, the
    * q225 merge-table convention): per table, signature bit i is
    * [dot(v, plane_i) >= 0], probes are the own bucket plus all 1-bit
    * flips, candidates join on (table, signature), and survivors score by
    * exact cosine with the usual (cos desc, id) top-k.
    */
  def lshKnnOracleSql(nBits: Int, dim: Int, nTables: Int, k: Int,
                      maxProbeId: Long): String = {
    def sigSql(tab: Int): String = {
      val ps = graft.operators.Similarity.planesSeeded(nBits, dim,
        if (tab == 0) 7L else 7L + 1000L * tab)
      val terms = ps.zipWithIndex.map { case (p, i) =>
        val planeLit = p.mkString("[", ", ", "]")
        s"CASE WHEN ${dotSql("embedding", planeLit)} >= 0 THEN ${1L << i} ELSE 0 END"
      }
      s"CAST(${terms.mkString(" + ")} AS BIGINT)"
    }
    val candArms = (0 until nTables).map { tab =>
      s"""  SELECT vec_id, embedding, nrm, $tab AS tab, ${sigSql(tab)} AS sig
         |  FROM e""".stripMargin
    }.mkString("\nUNION ALL\n")
    val flips = (0L +: (0 until nBits).map(i => 1L << i)).map(m =>
      s"xor(sig, $m)").mkString("[", ", ", "]")
    s"""$EmbCte,
       |cand AS (
       |$candArms),
       |probes AS (
       |  SELECT vec_id AS query_id, embedding, nrm, tab,
       |         unnest($flips) AS probe_sig
       |  FROM cand WHERE vec_id < $maxProbeId),
       |scored AS (
       |  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id,
       |         ${cosSql("p.embedding", "c.embedding", "p.nrm", "c.nrm")} AS cos_sim
       |  FROM probes p JOIN cand c
       |    ON p.tab = c.tab AND p.probe_sig = c.sig
       |   AND p.query_id <> c.vec_id)
       |SELECT query_id, neighbor_id, cos_sim, "rank" FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |             ORDER BY cos_sim DESC, neighbor_id ASC) AS BIGINT) AS "rank"
       |  FROM scored) WHERE "rank" <= $k""".stripMargin
  }

  /** DuckDB twin of BpeTrainer.trainMerges, k rounds UNROLLED: round i
    * recomputes weighted adjacent-pair counts over the evolving symbol
    * sequences (overlapping adjacencies counted, exactly the trainer's
    * sliding-j accounting), takes the (count desc, left, right)
    * binary-collation argmax, and applies the merge with the q225
    * chr(1)sym chr(2) replace-chain convention (leftmost non-overlapping —
    * the kernel's single-pass scan). Proves the driver-side merge loop
    * equals the from-scratch recomputation every round.
    */
  def bpeTrainOracleSql(k: Int): String = {
    val wrap =
      "chr(1) || array_to_string(string_split(t, ''), chr(2)||chr(1)) || chr(2)"
    val rounds = (1 to k).map { i =>
      s"""p$i AS (
         |  SELECT pr.l AS l, pr.r AS r, CAST(sum(n) AS BIGINT) AS c
         |  FROM (
         |    SELECT n, unnest([{'l': syms[j], 'r': syms[j + 1]}
         |                      for j in range(1, len(syms))]) AS pr
         |    FROM (SELECT string_split(substr(s, 2, length(s) - 2),
         |                 chr(2)||chr(1)) AS syms, n FROM w${i - 1}))
         |  GROUP BY 1, 2),
         |m$i AS (SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1),
         |w$i AS (
         |  SELECT replace(w${i - 1}.s, chr(1)||m$i.l||chr(2)||chr(1)||m$i.r||chr(2),
         |                 chr(1)||m$i.l||m$i.r||chr(2)) AS s, n
         |  FROM w${i - 1}, m$i)""".stripMargin
    }.mkString(",\n")
    val sel = (1 to k).map(i =>
      s"""SELECT CAST(${i - 1} AS BIGINT) AS merge_rank, l AS "left", """ +
        s"""r AS "right", c AS pair_count FROM m$i""").mkString("\nUNION ALL ")
    s"""WITH w0 AS (
       |  SELECT $wrap AS s, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest($ToksSql) AS t FROM documents)
       |  GROUP BY t),
       |$rounds
       |$sel""".stripMargin
  }

  // 10-token non-overlapping segments of each document — the shared CTE
  // for the sub-document curation oracles (mirrors Curation.segmented)
  val SegCte: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id,
      |         unnest(generate_series(0, (len(toks) + 9) // 10 - 1)) AS seg_idx,
      |         toks
      |  FROM t WHERE len(toks) >= 1),
      |segs AS (
      |  SELECT doc_id, seg_idx,
      |         array_to_string(toks[seg_idx*10+1 : seg_idx*10+10], ' ') AS seg
      |  FROM s)""".stripMargin
}
