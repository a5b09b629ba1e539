package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for a training-data pipeline: exact, blocked n-gram
  * Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design (100 TB contract): nothing here is ever all-pairs over the
  * corpus. Exact dedup is one shuffle on the content hash. Near-dup
  * candidate generation is always *blocked* — explicit (lang, length-band)
  * blocks for Jaccard, LSH band-buckets for MinHash, pigeonhole segment
  * buckets for SimHash, label/cluster blocks for embeddings — so pair counts
  * are
  * bounded by block sizes, and each block join is an ordinary shuffle join
  * on the block key (skew bounded by the banding parameters).
  */
object Dedup {

  /** Exact dedup on the normalized-content md5: one representative (min
    * doc_id) per content group. Single hash shuffle; map-side combine.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))

  /** Sorted, xxhash64'd shingle sets: the join-ready form for set-similarity
    * kernels. Hashing makes elements primitive longs (distinctness
    * preserved; a 64-bit collision across a corpus is ~p<1e-7); sorting
    * ONCE per document lets every candidate pair use the allocation-free
    * `graft_sorted_intersect_count` merge kernel instead of a hash-set
    * build per pair.
    */
  private def hashedShingles(docs: DataFrame): DataFrame = {
    val parts = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // shingling is the per-document CPU hot spot: spread the docs FIRST so
    // it runs cluster-wide — a small parquet input is otherwise one task,
    // and the whole shingle pass serializes onto one core. coalesce is
    // load-bearing: with nullable text, the downstream join's sizeCond
    // makes InferFiltersFromConstraints add isnotnull(n_sh), and predicate
    // pushdown inlines the whole shingle pipeline below this repartition
    // into that single scan task (measured: 2.2 s single-task stage at
    // sf0.1, 60% of the query's wall clock).
    //
    // The length prefilter cuts empty/short docs (< the 3-gram width):
    // they produce NO shingles yet share the degenerate empty set, so
    // they'd land in one block with n_sh = 0, pass the size-ratio prune
    // trivially (0·t ≤ 0), and pair QUADRATICALLY before the null jaccard
    // finally drops them. Raw length is scan-cheap; a filter on the
    // derived n_sh instead would substitute the shingle expression and
    // sink it below the repartition — the inline trap the plan guard pins.
    docs.select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .filter(length(col("text")) >= 3)
      .repartition(parts, col("doc_id"))
      .select(
        col("doc_id"),
        array_sort(transform(shingles3(col("text")), s => xxhash64(s))).as("sh"))
      .withColumn("n_sh", size(col("sh")))
  }

  private def jaccard(aSh: Column, bSh: Column, nBoth: Column): Column = {
    val inter = call_function("graft_sorted_intersect_count", aSh, bSh)
    inter.cast("double") / (nBoth - inter)
  }

  /** Blocked char-3-gram Jaccard near-dup pairs: candidates share
    * (lang, n_chars/50 band); jaccard = |A∩B| / |A∪B| on distinct shingles.
    * Integer set sizes -> the ratio is exactly reproducible.
    *
    * Scale engineering (the pair work is quadratic in block size, so the
    * plan must spread PAIRS, not documents):
    *  - ADAPTIVE TRIANGLE-GRID SPLIT (round 10; the Okcan & Riedewald
    *    theta-join balancing shape, SIGMOD'11): per-block pair volume
    *    n·(n-1)/2 is heavy-tailed — one scan-cheap (lang, band) histogram
    *    showed the hottest block alone carrying ~9% of ALL pair work while
    *    32 partitions hold ~3% each, the measured 7× verify-stage
    *    straggler of probe_r9 (stage `localCheckpoint at Dedup.scala` —
    *    NOT the CC loop the r9 verdict guessed; every CC stage measured
    *    ≤ 2.6×). Each block of n docs is split into g = ceil(n/√cap)
    *    doc_id-mod groups; the pair space becomes a g×g upper triangle of
    *    cells, each a join unit of ≤ ~cap candidate pairs, so the hottest
    *    block is g·(g+1)/2 uniformly-sized units instead of one straggler
    *    task.
    *  - ROLE-SPLIT replication keeps the split near-free of wasted evals:
    *    a group-k doc goes to cells (k, j≥k) on the LEFT side and
    *    (i≤k, k) on the RIGHT side, so a cross-group pair meets exactly
    *    once as an UNORDERED pair (no a>b half to iterate and reject, no
    *    same-group pairs polluting mixed cells) and only diagonal cells
    *    need the doc_id< tie-break. Candidate-eval volume is
    *    ~(1/2 + 1/2g)·n² per block — LESS than the unsplit self-join's n²
    *    ordered evals, so balance costs no extra compute, only the ~g×
    *    signature replication through the shuffle (measured flat wall at
    *    sf1 on 32 local cores; at 1000 executors the 7× straggler is gone).
    *  - cap auto-sizes from the same histogram: total pair volume spread
    *    over `unitsPerPartition` × shuffle-partitions units, floored at
    *    512² so blocks under 512 docs (~130k pairs, a sub-second task)
    *    never split — below that the split's own overhead (the extra
    *    sort + per-row cell array) exceeds the straggler it removes
    *    (measured: +57% on q45 at the 5k-doc rung with a 64² floor,
    *    flat with 512²). Replication per doc is (g+1)/2 per side
    *    ≈ n·√(unitsPerPartition·parts/Σvol) — scale-FREE when the block
    *    size distribution keeps its shape. The two role pipelines each
    *    run their own shingle pass and exchange — deliberate; see the
    *    in-body comment for why a shared exchange is not reachable
    *    without a materialization barrier.
    *  - |A∪B| = |A|+|B|-|A∩B| and the sorted-merge kernel: one linear
    *    pass per pair, zero allocation.
    */
  /** The (lang, band) block histogram + per-block grid width `g_b` of the
    * role-split triangle grid — one scan-cheap aggregate, no shingles.
    * Shared by [[ngramJaccardPairs]] (physical splitting) and
    * [[pairGridAudit]] (the pre-flight report). Population = the shingle
    * frame's (length-3 prefilter), so every sh row finds its grid row.
    */
  private[operators] def blockGrid(docs: DataFrame, parts: Int,
                                   unitsPerPartition: Int): DataFrame = {
    val vol = col("n_docs") * (col("n_docs") - lit(1L)) / lit(2L)
    val blocks = docs
      .filter(length(coalesce(col("text"), lit(""))) >= 3)
      .groupBy(col("lang"), floor(col("n_chars") / 50).as("band"))
      .agg(count(lit(1)).as("n_docs"))
    // scalar attach via an unpartitioned window over the BOUNDED block
    // frame (|langs|×|bands| rows), not a crossJoin: a cross join with
    // the 1-row aggregate plans as BroadcastNestedLoopJoin and trips the
    // no-BNLJ plan guards on every consumer. Spark logs "No Partition
    // Defined for Window operation" here — EXPECTED and safe: the frame
    // is the bounded histogram, never the corpus (PLANS.md round 10)
    blocks
      .withColumn("total_vol", sum(vol).over(Window.partitionBy()))
      .select(col("lang"), col("band"), col("n_docs"),
        greatest(lit(1L), ceil(col("n_docs") /
          sqrt(greatest(lit(262144.0),
            col("total_vol") / lit(parts.toLong * unitsPerPartition))))
          .cast("long")).as("g_b"))
  }

  /** Pre-flight audit of the triangle-grid split (round 10, the q325
    * pattern applied to the blocked-pairs family): per (lang, band)
    * block, the doc count, EXACT pair volume, the grid width g_b the
    * split will use for a `parts`-partition deployment, the resulting
    * join-unit count g·(g+1)/2, and the replicated row count n·(g+1)
    * (every group-k doc lands in g−k LEFT cells and k+1 RIGHT cells).
    * One aggregate over the scan — prices the verify stage's balance AND
    * its shuffle replication BEFORE any shingle is computed, the same
    * pilot-cost pre-flight a 100 TB dedup launch runs first. `parts` is
    * explicit (the TARGET deployment's reducer count), so the report is
    * deterministic across harnesses rather than inheriting the session's
    * shuffle-partition setting.
    */
  def pairGridAudit(docs: DataFrame, parts: Int,
                    unitsPerPartition: Int = 8): DataFrame =
    blockGrid(docs, parts, unitsPerPartition)
      .select(col("lang"), col("band"), col("n_docs"),
        expr("n_docs * (n_docs - 1) div 2").as("pair_vol"),
        col("g_b"),
        expr("g_b * (g_b + 1) div 2").as("n_units"),
        expr("n_docs * (g_b + 1)").as("repl_rows"))

  def ngramJaccardPairs(docs: DataFrame, threshold: Double,
                        unitsPerPartition: Int = 8): DataFrame = {
    val parts = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val grid = blockGrid(docs, parts, unitsPerPartition)
      .select(col("lang"), col("band"), col("g_b"))
    val sh = docs.select(col("doc_id"), col("lang"),
        floor(col("n_chars") / 50).as("band"))
      .join(hashedShingles(docs), "doc_id")
      .join(broadcast(grid), Seq("lang", "band"))
      .withColumn("grp", pmod(col("doc_id"), col("g_b")))
    // TWO role pipelines by design (round 11, closing ADVICE r10 item 1
    // with a measured adjudication): a single role-tagged exploded frame
    // CANNOT feed both join sides through one reused exchange — any
    // correct per-side role restriction is a deterministic filter, and
    // Catalyst pushes it below the repartition
    // (PushPredicateThroughNonJoin), making the exchange children
    // structurally different; even a cross-side join predicate
    // (a.role < b.role) gets decomposed into per-side role = 0/1 filters
    // (valid: role is literal-backed) and pushed the same way — measured
    // ReusedExchange = 0 under BOTH formulations, with the union frame
    // then computed twice. A shared exchange needs a materialization
    // barrier (localCheckpoint of the replicated shingle frame), whose
    // executor-local storage volume and lost-executor fragility on a
    // real cluster cost more than what it saves: the duplicated work is
    // one scan-side shingle pass — linear, shuffle-free, measured flat
    // at sf1 — while everything downstream of the two exchanges is
    // disjoint (each side explodes ONLY its own role's cells).
    def explodeCells(cells: Column): DataFrame = sh
      .select(col("doc_id"), col("lang"), col("band"), col("sh"),
        col("n_sh"), explode(cells).as("cell"))
      .select(col("doc_id"), col("lang"), col("band"), col("sh"),
        col("n_sh"), col("cell.ci").as("ci"), col("cell.cj").as("cj"))
      .repartition(parts, col("lang"), col("band"), col("ci"), col("cj"))
    // LEFT role: group k owns the cell rows (k, k), (k, k+1), …, (k, g-1)
    val lhs = explodeCells(transform(sequence(col("grp"), col("g_b") - 1),
      j => struct(col("grp").as("ci"), j.as("cj"))))
    // RIGHT role: group k owns the cell column (0, k), (1, k), …, (k, k)
    val rhs = explodeCells(transform(sequence(lit(0L), col("grp")),
      i => struct(i.as("ci"), col("grp").as("cj"))))
    // a cross-group pair meets exactly once (its lower group on the left,
    // higher on the right); only the diagonal cells — both docs from the
    // same group — need the id ordering to halve the self pair space
    val diagCond = col("a.ci") =!= col("a.cj") ||
      col("a.doc_id") < col("b.doc_id")
    // lossless size-ratio prune: jaccard <= min(|A|,|B|)/max(|A|,|B|), so a
    // pair whose sizes are further apart than the threshold ratio can never
    // pass — skip the merge kernel for it entirely
    val sizeCond =
      col("a.n_sh") * threshold <= col("b.n_sh") &&
        col("b.n_sh") * threshold <= col("a.n_sh")
    lhs.as("a").join(rhs.as("b"),
        col("a.lang") === col("b.lang") &&
        col("a.band") === col("b.band") &&
        col("a.ci") === col("b.ci") && col("a.cj") === col("b.cj") &&
        diagCond && sizeCond)
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("doc_id_1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_id_2"),
        jaccard(col("a.sh"), col("b.sh"), col("a.n_sh") + col("b.n_sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** GLOBAL (unblocked) n-gram Jaccard self-join via frequency-ordered
    * prefix filtering — the All-Pairs/PPJoin family (Bayardo et al. WWW'07,
    * Xiao et al. WWW'08) in the MapReduce arrangement of Vernica et al.
    * (SIGMOD'10), Spark-first. Unlike `ngramJaccardPairs` this needs no
    * block key at all: EXACT over the whole corpus, candidates bounded by
    * the prefix inverted index instead of block sizes.
    *
    * Three stages, three bounded shuffles:
    *  1. token df: one map-side-combined count over the shingle stream.
    *     Output is the VOCABULARY — char w-gram vocab is bounded by
    *     |charset|^w, corpus-size-independent, so ranking it rarest-first
    *     with one single-partition window (and broadcasting the rank map)
    *     stays O(vocab) forever.
    *  2. per-doc sorted rank arrays: the token stream is already hash-
    *     partitioned by doc_id (the repartition both this and stage 1 reuse
    *     — ReusedExchange), the rank map joins in broadcast, and the
    *     groupBy(doc_id) aggregates exchange-free on that partitioning.
    *  3. prefix inverted-index self-join: each doc posts only its
    *     p = n - ceil(t·n) + 1 RAREST tokens (prefix filter: two sets with
    *     jaccard ≥ t must share a prefix token — rarest-first ordering makes
    *     posting lists short). Posting rows are narrow integer tuples; the
    *     join key bounds candidates by posting-list sizes, never all-pairs.
    *     Duplicate instances are pruned by integer length + positional
    *     filters inside the join condition, collapsed to one row per pair
    *     by a 16-byte distinct, and each unique pair is verified ONCE by
    *     exact sorted-merge Jaccard after an array join-back against the
    *     checkpointed record frame (Vernica's record-join stage).
    *
    * All pruning is lossless: length filter (t·|A| ≤ |B| ≤ |A|/t), prefix
    * filter, and positional filter each only discard pairs provably below
    * threshold, and the ceil() bounds get a -1e-9 slack so double rounding
    * can only ADMIT a spurious candidate (later rejected by the exact
    * verify), never drop a true threshold-boundary pair.
    *
    * `shingleWidth` (default 5): prefix filtering is only as good as the
    * vocabulary is large — rarest-first ordering needs tokens that are
    * actually rare. Character trigrams of heavily templated text can
    * collapse to a few hundred distinct grams across millions of docs
    * (this corpus: 377 at sf0.1), making every posting list corpus-sized;
    * wider shingles restore a usable df distribution at slightly coarser
    * similarity granularity (standard w-shingling practice).
    */
  def ppjoinJaccardPairs(docs: DataFrame, threshold: Double,
                         shingleWidth: Int = 5,
                         maxVocab: Long = DefaultMaxVocab): DataFrame =
    ppjoin(docs, threshold, shingleWidth, verify = true, weighted = false,
      maxVocab)

  /** EXACT term-frequency-weighted Jaccard pairs over the whole corpus:
    * the PPJoin machinery above run on occurrence-EXPANDED normalized
    * 3-gram multisets (see [[weightedMinhashLshPairs]] for the reduction).
    * The prefix/positional/length filters are plain set theory on the
    * expanded sets, so they stay lossless; the expanded vocabulary is
    * bounded by |charset|³ × max per-doc term frequency — still
    * corpus-size-independent. The exact ground truth the weighted LSH
    * operator is verified against.
    */
  def weightedJaccardPairs(docs: DataFrame, threshold: Double,
                           shingleWidth: Int = 5,
                           maxVocab: Long = DefaultMaxVocab): DataFrame =
    ppjoin(docs, threshold, shingleWidth, verify = true, weighted = true,
      maxVocab)

  /** The candidate stream of [[ppjoinJaccardPairs]] BEFORE exact
    * verification — exposed so specs can measure how hard the prefix +
    * positional filters prune relative to all-pairs.
    */
  private[graft] def ppjoinCandidates(docs: DataFrame, threshold: Double,
                                      shingleWidth: Int = 5,
                                      weighted: Boolean = false): DataFrame =
    ppjoin(docs, threshold, shingleWidth, verify = false, weighted = weighted,
      DefaultMaxVocab)

  /** PPJoin's rarest-first ordering broadcasts the (tok → rank) table into
    * the posting build, so the distinct-shingle vocabulary must stay
    * broadcastable: bounded by |charset|^w for char-w-grams as documented,
    * NOT corpus-sized. 64M tokens ≈ 1 GB broadcast — past that the guard
    * fails loudly instead of letting the executor OOM look like a capacity
    * mystery. Callers with a genuinely larger (word-token) vocabulary need
    * a shuffle-join rank variant, not a bigger budget.
    */
  val DefaultMaxVocab: Long = 64L * 1000 * 1000

  private def ppjoin(docs: DataFrame, threshold: Double, shingleWidth: Int,
                     verify: Boolean, weighted: Boolean,
                     maxVocab: Long): DataFrame = {
    val parts = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // distinct-shingle hash stream; repartition FIRST (shingle CPU spread +
    // shared exchange for stages 1 and 2). coalesce → non-nullable chain
    // (the isnotnull-inference trap, see minhashLshPairs).
    val tokExpr =
      if (weighted)
        explode(call_function("graft_occurrence_mix",
          array_sort(transform(shinglesMultiW(normText(col("text")), shingleWidth),
            s => xxhash64(s)))))
      else
        explode(transform(shinglesW(col("text"), shingleWidth), s => xxhash64(s)))
    val toks = docs
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .repartition(parts, col("doc_id"))
      .select(col("doc_id"), tokExpr.as("tok"))
    // Vocabulary ranking: rarest-first total order by (df, tok). A
    // row_number window with no PARTITION BY would funnel the whole
    // vocabulary through ONE task — tolerable for a bounded char-gram
    // vocab, a memory wall for a corpus-sized one, and WindowExec can't
    // tell you which you have. Two-level rank instead: range-partition
    // the vocab on the sort key, sort within partitions, then turn local
    // positions into global ranks with per-partition count offsets (one
    // driver collect of `parts` longs — the same job zipWithIndex runs).
    // Rank values equal the window's at any partition count: the range
    // boundaries affect placement, never the total-order position. The
    // count pass doubles as the maxVocab guard for the broadcast below;
    // dfreq is localCheckpoint'd so its corpus-scale lineage (shingle +
    // groupBy) computes once, not once per rank job.
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .localCheckpoint(false)
    val ranked = {
      val spark0 = docs.sparkSession
      import spark0.implicits._
      val sorted = dfreq
        .repartitionByRange(parts, col("df"), col("tok"))
        .sortWithinPartitions(col("df"), col("tok"))
        .select(col("tok"))
      val rdd = sorted.rdd
      val counts = rdd.mapPartitions(
        it => Iterator.single(it.size.toLong), preservesPartitioning = true)
        .collect()
      val vocab = counts.sum
      require(vocab <= maxVocab,
        s"ppjoin: $vocab distinct tokens exceeds the broadcastable-" +
          s"vocabulary budget ($maxVocab). Char-w-gram vocabularies are " +
          "bounded by |charset|^w; a corpus-sized (e.g. word-token) " +
          "vocabulary needs a shuffle-join rank variant, not this operator.")
      val offsets = counts.scanLeft(0L)(_ + _)
      rdd.mapPartitionsWithIndex { (pid, it) =>
        var i = offsets(pid)
        it.map { r => i += 1; (r.getLong(0), i) }
      }.toDF("tok", "rk")
    }
    // graft_sorted_collect, NOT sort_array(collect_list(...)): collect_list
    // is marked non-deterministic (array order = row order), and one
    // non-deterministic expression anywhere below the self-join makes
    // sameResult constant-false — no ReusedExchange, the whole
    // shingle+df+rank pipeline computed twice. The sorted custom aggregate
    // is honestly deterministic, so the self-join reuses one exchange.
    // The per-doc record store: lazily checkpointed once, read by the two
    // posting sides and the two verify record-joins below — the
    // shingle+df+rank pipeline runs exactly once however the joins plan.
    val ranks = toks.join(broadcast(ranked), "tok")
      .groupBy(col("doc_id"))
      .agg(call_function("graft_sorted_collect", col("rk")).as("rks"))
      .select(col("doc_id"), col("rks"), size(col("rks")).as("n"))
      .localCheckpoint(false)
    val pLen = (col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
      .cast("int")
    // Posting rows are NARROW: (doc_id, n, pos, tok) — ~28 bytes. Neither
    // the prefix nor the full rank array rides the explode or the join
    // (carrying the ~(1-t)·n-element prefix per posting row multiplies
    // corpus bytes by the prefix length through the exchange — the same
    // payload-amplification trap measured at 0.4 GB/run in the LSH
    // operator). No explicit repartition on the token: REPARTITION_BY_COL
    // exchanges are off-limits to AQE's skew rule, and the hottest posting
    // list (most-frequent prefix token) is exactly the key AQE must be
    // free to split at scale.
    val posting = ranks
      .select(col("doc_id"), col("n"),
        posexplode(slice(col("rks"), lit(1), pLen)).as(Seq("pos", "tok")))
    // Candidate instances are pruned by integer arithmetic only:
    //  - length filter (t·|A| ≤ |B| ≤ |A|/t);
    //  - positional bound (overlap ≤ 1 + min(remaining suffixes) must
    //    reach α = ceil(t/(1+t)·(|A|+|B|)), Xiao et al.) — VALID at the
    //    pair's first shared prefix token; later instances use a weaker
    //    bound and may wrongly pass, which only ADMITS extra candidates
    //    (killed by the exact verify), never drops a true pair.
    // A near-dup pair then survives as ~p instances; the 16-byte distinct
    // collapses them to one row per pair before any array is fetched.
    val sizeCond =
      col("a.n") * threshold <= col("b.n") &&
        col("b.n") * threshold <= col("a.n")
    val alpha = ceil(
      lit(threshold / (1.0 + threshold)) * (col("a.n") + col("b.n")) - lit(1e-9))
    val positional =
      lit(1) + least(col("a.n") - col("a.pos") - 1,
        col("b.n") - col("b.pos") - 1) >= alpha
    val cand = posting.as("a").join(posting.as("b"),
        col("a.tok") === col("b.tok") &&
        col("a.doc_id") < col("b.doc_id") && sizeCond && positional)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    if (!verify) return cand.select(col("d1").as("doc_id_1"),
      col("d2").as("doc_id_2"))
    // Verify ONCE per unique pair: fetch both rank arrays back from the
    // checkpointed ranks frame — the Vernica record-join. The candidate
    // stream is post-prune (output-bounded, not the raw instance stream),
    // so the array bytes shuffled here are candidates × |doc|, the same
    // corpus-linear class as the build side.
    //
    // SHUFFLE_HASH on the WEIGHTED record-store side (round 13):
    // unhinted, the weighted variant's record-joins planned as
    // SortMergeJoins whose sorts run over the CANDIDATE stream — the
    // second one with the ~KB rks1 array payload already attached
    // (measured: 3.2 GB of sort spill, q52 10.6 s at sf0.1). Hash-
    // building the record slice per partition lets the 3.9M candidates
    // stream through unsorted (8.3 s, zero spill) — the same build-on-
    // the-record-store shape the screened LSH twins ship. The UNWEIGHTED
    // store stays unhinted deliberately: occurrence expansion makes the
    // weighted store ~an order wider by construction, while the
    // unweighted store is the smallest frame in the query — AQE promotes
    // its attach to broadcast once the checkpoint's true size is known,
    // and a hint would veto that (measured: hinting q51 forced the
    // 4.6M-candidate stream through two exchanges, 110 MB -> 3.0 GB
    // shuffle, 4.6 -> 7.3 s).
    def rec(d: String, rk: String, nn: String) = {
      val r = ranks.select(col("doc_id").as(d), col("rks").as(rk),
        col("n").as(nn))
      if (weighted) r.hint("shuffle_hash") else r
    }
    val inter = call_function("graft_sorted_intersect_count",
      col("rks1"), col("rks2"))
    val jac = inter.cast("double") / ((col("n1") + col("n2")) - inter)
    cand
      .join(rec("d1", "rks1", "n1"), "d1")
      .join(rec("d2", "rks2", "n2"), "d2")
      .filter(jac >= threshold)
      .select(col("d1").as("doc_id_1"), col("d2").as("doc_id_2"),
        jac.as(if (weighted) "wjaccard" else "jaccard"))
  }

  /** MinHash signatures: numHashes permutations h_i(x) = (a_i*x + b_i) mod p
    * over murmur3-hashed shingles. Returns (doc_id, mh: array<bigint>).
    */
  /** All numHashes MinHash components in ONE codegen'd pass over the
    * shingle-hash array (graft.expressions.MinHashSignature) — the built-in
    * `array_min(transform(...))` per component re-traverses the array
    * numHashes times through interpreted higher-order lambdas.
    */
  private def minhashExpr(hs: Column, numHashes: Int): Column =
    call_function("graft_minhash", hs, lit(numHashes))

  def minhashSignatures(docs: DataFrame, numHashes: Int): DataFrame = {
    val parts = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    docs.select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .repartition(parts, col("doc_id")) // parallelize the shingle+minhash CPU
      .select(
        col("doc_id"),
        transform(shingles3(normText(col("text"))), s => hash(s).cast("long")).as("hs"))
      .select(col("doc_id"), minhashExpr(col("hs"), numHashes).as("mh"))
  }

  /** MinHash + LSH near-dup pairs: split the signature into `bands` bands,
    * bucket by (band index, band hash), emit same-bucket pairs, verify each
    * candidate with exact shingle Jaccard >= threshold.
    *
    * The shuffle key is the (band, bucket) pair — this IS the blocking/
    * salting scheme; bucket sizes (hence pair blowup) are tuned by
    * bands × rows, not by corpus size.
    *
    * Plan engineering (a corpus with big duplicate clusters makes the
    * candidate stream quadratic in cluster size, so per-candidate cost must
    * be minimal and nothing candidate-sized may shuffle twice):
    *  - ONE projection computes the shingle pass, the signature, and the
    *    per-band bucket hashes; both self-join sides repartition on
    *    (band, sig) with identical plans, so the expensive projection is
    *    computed and shuffled ONCE (ReusedExchange);
    *  - verification runs INLINE in the bucket join (the sorted shingle
    *    arrays ride the banded exchange) — no join-back of candidate pairs
    *    to a shingle table, which would shuffle the quadratic pair stream
    *    again, twice, carrying arrays;
    *  - a pair sharing several bands is emitted only at its FIRST shared
    *    band (an O(bands) predicate on the bucket-hash arrays) — exactly-
    *    once by construction, no `distinct` barrier over the pair stream;
    *  - the lossless size-ratio prune skips the merge kernel for pairs
    *    whose set sizes already bound jaccard below the threshold.
    */
  def minhashLshPairs(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.5, shingleWidth: Int = 3,
                      normalize: Boolean = true): DataFrame = {
    val parts = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // `shingleWidth`/`normalize` pick the shingle space; the (5, raw)
    // setting is exactly [[ppjoinJaccardPairs]]'s space, which makes that
    // exact global join the operator's recall ground truth (q20's oracle
    // contract). Default (3, normalized) is the historical behavior.
    //
    // Each stacked select materializes its expensive column exactly once:
    // the consumer references it >1 time, so CollapseProject keeps the
    // boundary (its cheap-expression guard) and nothing is recomputed.
    // `coalesce(text, '')` is load-bearing: it makes every derived column
    // statically non-nullable, so InferFiltersFromConstraints has no
    // isnotnull(n_sh)-style constraint to infer from the join condition —
    // such a filter would be pushed below the repartition and inline the
    // whole shingle pipeline into the scan stage, serializing it into the
    // (few) input-split tasks instead of the `parts`-way repartition.
    val pre = docs.select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .repartition(parts, col("doc_id")) // spread the shingle/minhash CPU
      .select(col("doc_id"),
        shinglesW(if (normalize) normText(col("text")) else col("text"),
          shingleWidth).as("strs"))
      .select(col("doc_id"),
        array_sort(transform(col("strs"), s => xxhash64(s))).as("sh"),
        transform(col("strs"), s => hash(s).cast("long")).as("hs"))
    lshPairsOnPrepared(pre, numHashes, bands, threshold, "jaccard")
  }

  /** Term-frequency-WEIGHTED MinHash + LSH near-dup pairs: weighted Jaccard
    * Σ_g min(tf_A(g), tf_B(g)) / Σ_g max(tf_A(g), tf_B(g)) over character
    * 3-gram multisets, reduced exactly to plain set Jaccard by occurrence
    * expansion (`graft_occurrence_mix`: the k-th occurrence of a shingle
    * becomes a distinct element). After the reduction the signature, band
    * join, pruning, and exact verification are the SAME code path as the
    * unweighted operator — one per-row expansion pass is the entire cost
    * delta, so the 100 TB story is unchanged.
    */
  def weightedMinhashLshPairs(docs: DataFrame, numHashes: Int = 64,
                              bands: Int = 16, threshold: Double = 0.5,
                              shingleWidth: Int = 5): DataFrame = {
    val parts = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val pre = docs.select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .repartition(parts, col("doc_id"))
      .select(col("doc_id"),
        call_function("graft_occurrence_mix",
          array_sort(transform(shinglesMultiW(normText(col("text")), shingleWidth),
            s => xxhash64(s)))).as("sh"))
    lshPairsOnPrepared(pre, numHashes, bands, threshold, "wjaccard")
  }

  /** Shared LSH band-join core over a prepared frame of
    * (doc_id, sh: sorted array<bigint> — the exact-verify set, and
    * optionally hs: array<bigint> — the signature element stream; `sh`
    * doubles as `hs` when absent, e.g. for occurrence-expanded multisets).
    * All plan-shape constraints documented inline are load-bearing.
    *
    * Shape (measured at sf0.1, rationale inline):
    *  1. `pre` = (doc_id, sh, n_sh, mh), lazily localCheckpoint'ed — the
    *     per-doc record store. ONE compute of the shingle+minhash pipeline
    *     no matter how many times the frame is consumed below (bucket join
    *     sides + two verify record-joins).
    *  2. `banded` explodes NARROW rows (doc_id, n_sh, band, sig) — ~24
    *     bytes. Exploding the payload arrays instead (sh ≈ 1.6 KB + mh ≈
    *     1 KB per row, × bands) copies ~0.4 GB of arrays through the
    *     Generate at sf0.1 and was the single hottest stage in the whole
    *     bench (3.9 s of the old 8 s q49); payload stays in `pre`.
    *  3. Bucket self-join on (band, sig) emits candidate ID pairs only,
    *     with the size-ratio prune (n_sh rides the narrow row) killing
    *     most cross-template pairs before they exist. No explicit
    *     repartition — an explicit repartition's REPARTITION_BY_COL
    *     exchange is off-limits to AQE, which (a) pins the giant
    *     template-cluster bucket to ONE task (measured: a 7 s straggler on
    *     a 1923-doc bucket) and (b) blocks the broadcast-hash plan
    *     Catalyst prefers while the banded side fits (the probe side then
    *     keeps its balanced partitioning — no single-key hotspot). At
    *     cluster scale the same plan degrades gracefully to a sort-merge
    *     join whose ENSURE_REQUIREMENTS exchanges AQE's skew rule IS
    *     allowed to split.
    *  4. `.distinct()` collapses multi-band duplicates of a pair — a
    *     shuffle of 16-byte rows. (The previous design avoided this
    *     barrier with a first-shared-band predicate over per-row sig
    *     arrays; that predicate is what forced the payload onto the
    *     banded rows — the narrow-row + distinct trade wins by >3×.)
    *  5. Verify once per unique pair via two record-joins against `pre`
    *     (the Vernica et al. record-join, same as ppjoinJaccardPairs):
    *     the cheap codegen'd minhash-agreement screen
    *     (`graft_array_agree_count` ≥ mean − 4.75σ of Binomial(k, t):
    *     misses a true threshold pair with p < 1e-6, same order as LSH
    *     band-recall loss) rejects mid-similarity candidates before the
    *     O(|sh|) exact merge kernel; conjunct order in the filter is
    *     preserved into codegen, so the merge runs only for screen
    *     survivors.
    */
  private def lshPairsOnPrepared(prepared: DataFrame, numHashes: Int,
                                 bands: Int, threshold: Double,
                                 simName: String): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val hsCol =
      if (prepared.columns.contains("hs")) col("hs") else col("sh")
    val mh = minhashExpr(hsCol, numHashes)
    val pre = prepared
      .select(col("doc_id"), col("sh"), size(col("sh")).as("n_sh"), mh.as("mh"))
      .localCheckpoint(false)
      // empty shingle sets share the identical sentinel signature
      // (Long.MaxValue everywhere), so every band would funnel ALL such
      // docs into one bucket — an O(E²) candidate blowup the verify step
      // only cleans up after the fact. They can never pass any positive
      // threshold; drop them before banding. The filter sits ABOVE the
      // checkpoint barrier, so it reads the materialized n_sh column and
      // can never substitute-and-sink the signature pipeline.
      .filter(col("n_sh") > 0)
    val sigArr = array((0 until bands).map { j =>
      hash(slice(col("mh"), j * rows + 1, rows))
    }: _*)
    // The generator input must stay a COMPLEX expression (the inline
    // array(...)), never a projected attribute: for an attribute input,
    // InferFiltersFromGenerate adds `size(sigs) > 0` above the Generate
    // (the SPARK-36715 guard only skips non-cheap children) and predicate
    // pushdown then substitutes it through every projection below,
    // inlining bands copies of the pipeline into the scan stage (measured:
    // 98 s for 500 docs). Here the pipeline below is a checkpoint read, so
    // the trap is cheap now — but keep the shape so it stays cheap.
    val banded = pre.select(col("doc_id"), col("n_sh"),
      posexplode(sigArr).as(Seq("band", "sig")))
    val sizeCondNarrow =
      col("a.n_sh") * threshold <= col("b.n_sh") &&
        col("b.n_sh") * threshold <= col("a.n_sh")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id") && sizeCondNarrow)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val minAgree = {
      val mean = numHashes * threshold
      val sd = math.sqrt(numHashes * threshold * (1 - threshold))
      math.floor(mean - 4.75 * sd).toInt
    }
    val inter = call_function("graft_sorted_intersect_count",
      col("sh1"), col("sh2"))
    val jac = inter.cast("double") /
      ((col("n1") + col("n2")) - inter).cast("double")
    if (minAgree <= 0) {
      // no usable screen at this (numHashes, threshold) point: single
      // record-join straight to the exact merge kernel
      cand
        .join(pre.select(col("doc_id").as("d1"), col("sh").as("sh1"),
          col("n_sh").as("n1")), "d1")
        .join(pre.select(col("doc_id").as("d2"), col("sh").as("sh2"),
          col("n_sh").as("n2")), "d2")
        .filter(jac >= threshold)
        .select(col("d1").as("doc_id_1"), col("d2").as("doc_id_2"),
          jac.as(simName))
    } else {
      // STAGED verification (round 7, the q49 sf10 finding): the screen
      // join pulls ONLY the minhash arrays (~0.5 KB/row); the shingle
      // payloads (~2.5 KB/row) join only for screen survivors. On a
      // templated corpus every unrelated pair carries a background
      // similarity floor j0, so the banded candidate count has an
      // n²·(j0^rows)·bands term that the threshold verify kills — but
      // with single-stage verification each such candidate drags the
      // full payload through the join first: at the 100×-rows rung the
      // measured candidate stream (≈25M pairs × ~5 KB ≈ 125 GB) filled
      // the scratch disk. The screen rejects background pairs at 1/5 the
      // bytes, and survivors (true-pair-shaped, agree-count ≥ mean−4.75σ
      // of Binomial(k, t)) are output-sized, not candidate-sized.
      val screened = cand
        .join(pre.select(col("doc_id").as("d1"), col("mh").as("mh1"),
          col("n_sh").as("n1")), "d1")
        .join(pre.select(col("doc_id").as("d2"), col("mh").as("mh2"),
          col("n_sh").as("n2")), "d2")
        .filter(call_function("graft_array_agree_count",
          col("mh1"), col("mh2")) >= minAgree)
        .select(col("d1"), col("d2"), col("n1"), col("n2"))
      screened
        .join(pre.select(col("doc_id").as("d1"), col("sh").as("sh1")), "d1")
        .join(pre.select(col("doc_id").as("d2"), col("sh").as("sh2")), "d2")
        .filter(jac >= threshold)
        .select(col("d1").as("doc_id_1"), col("d2").as("doc_id_2"),
          jac.as(simName))
    }
  }

  /** 64-bit SimHash over whitespace tokens: per bit, sum +1/-1 weighted by
    * token-hash bit value; sign of the sum becomes the bit.
    *
    * Computed entirely PER ROW with higher-order functions (a fold over the
    * token array carrying a 64-slot counter array) — no explode, no token
    * shuffle, no aggregation: at 100 TB this is a pure map over documents
    * where the explode+groupBy formulation shuffles one row per token.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val masks = array((0 until 64).map(i => lit(1L << i)): _*)
    // hash ONCE per token via transform, THEN fold: an expression inlined
    // into the zip_with lambda re-evaluates per mask element — 64 hashes
    // per token (measured 12× the whole operator on the md5 variant)
    val hs = transform(tokensWs(col("text")), t => xxhash64(t))
    val bitSums = aggregate(
      hs,
      array_repeat(lit(0L), 64),
      (acc, h) =>
        zip_with(acc, masks, (a, m) =>
          a + when(h.bitwiseAND(m) =!= 0, 1L).otherwise(-1L)))
    val packed = aggregate(
      zip_with(bitSums, masks, (b, m) => when(b > 0, m).otherwise(lit(0L))),
      lit(0L), (s, x) => s + x)
    docs.select(col("doc_id"), packed.as("simhash"))
  }

  /** SimHash near-dup pairs via pigeonhole band blocking: hamming distance
    * (bit_count of xor) <= maxHamming, restricted to same-`lang` documents.
    *
    * Candidate generation splits the 64-bit signature into `maxHamming + 1`
    * segments. Two signatures within the hamming bound differ in at most
    * `maxHamming` bit positions, so by pigeonhole at least one segment is
    * bit-identical on both — an equi-join on (lang, segment index, segment
    * value) finds every qualifying pair, and only same-segment collisions
    * are ever compared. Exact `bit_count(xor)` refines candidates, and
    * `distinct` collapses pairs that collide in several segments. No
    * all-pairs stage exists at any scale: the shuffle key is the segment
    * bucket, the same shape as the MinHash LSH band join above.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    val nSeg = maxHamming + 1
    val sh = simhash(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    // segment i covers bits [i*64/nSeg, (i+1)*64/nSeg) — widths differ by at
    // most one bit when 64 % nSeg != 0, which pigeonhole doesn't care about
    val segs = (0 until nSeg).map { i =>
      val lo = i * 64 / nSeg
      val hi = (i + 1) * 64 / nSeg
      val width = hi - lo
      val segval =
        if (width == 64) col("simhash")
        else shiftrightunsigned(col("simhash"), lo).bitwiseAND(lit((1L << width) - 1L))
      struct(lit(i).as("seg"), segval.as("segval"))
    }
    val banded = sh.select(col("doc_id"), col("lang"), col("simhash"),
        explode(array(segs: _*)).as("s"))
      .select(col("doc_id"), col("lang"), col("simhash"),
        col("s.seg").as("seg"), col("s.segval").as("segval"))
    banded.as("a").join(banded.as("b"),
        col("a.lang") === col("b.lang") &&
        col("a.seg") === col("b.seg") &&
        col("a.segval") === col("b.segval") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_id_1"),
        col("b.doc_id").as("doc_id_2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Duplicate clustering: connected components over a near-dup pair graph,
    * assigning every document the MINIMUM doc_id reachable from it — the
    * canonical representative of its duplicate cluster (`is_canonical`
    * marks the keeper; everything else is droppable).
    *
    * Iterative min-label propagation with path halving: each round
    * propagates the min over neighbors (one hop) and then pointer-jumps
    * (label <- label's label), so convergence takes O(log diameter)
    * rounds — duplicate clusters are usually shallow (near-dup relations
    * are close to transitive) and finish in 3–4 rounds, while adversarial
    * chain-shaped clusters stay logarithmic instead of linear. Every step
    * is a plain shuffle join. Deterministic by construction (min is
    * order-independent). Each round's frame is
    * `localCheckpoint`ed, truncating lineage so deep graphs don't compound
    * the plan (a cache alone keeps the whole join chain in the plan and
    * re-analysis cost grows per round). Throws if `maxIter` rounds pass
    * without convergence — partial components are silently-wrong output.
    */
  def duplicateClusters(docs: DataFrame, pairs: DataFrame,
                        maxIter: Int = 20): DataFrame = {
    val fwd = pairs.select(col("doc_id_1").as("a"), col("doc_id_2").as("b"))
    val edges = fwd.union(fwd.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    // PRE-CONTRACTION (round 13, guide §1.2 "algorithm first"): one
    // min-neighbor pass labels every touched node with the smallest id
    // in its 1-hop ball, then the edge set CONTRACTS to those
    // representatives (loops dropped, distinct) — near-dup clusters are
    // mostly doublet/triplet stars, which contract to nothing, so the
    // convergence loop below runs on the tiny multi-hop remainder
    // instead of re-shuffling the full edge set every round. Lossless:
    // c1(v) stays inside v's component, a component's global-min node
    // keeps itself (its c1 is itself), so min-label components of the
    // contracted graph, composed through c1, are EXACTLY the min-label
    // components of the original graph.
    val c1 = edges.groupBy(col("a")).agg(min(col("b")).as("nm"))
      .select(col("a").as("doc_id"),
        least(col("a"), col("nm")).as("c1"))
      .localCheckpoint()
    // contract the a < b half and mirror AFTER the distinct (half the
    // distinct volume — the symmetricCoOccurrenceEdges trick); the
    // representative attaches are SHUFFLE_HASH on the node-sized c1
    // frame (not broadcastable at 100 TB node counts)
    val halfC = edges.filter(col("a") < col("b"))
      .join(c1.select(col("doc_id").as("a"), col("c1").as("ca"))
        .hint("shuffle_hash"), Seq("a"))
      .join(c1.select(col("doc_id").as("b"), col("c1").as("cb"))
        .hint("shuffle_hash"), Seq("b"))
      .filter(col("ca") =!= col("cb"))
      .select(least(col("ca"), col("cb")).as("a"),
        greatest(col("ca"), col("cb")).as("b"))
      .distinct()
    val cEdges = halfC
      .union(halfC.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    // Iterate ONLY over representatives that appear in a contracted
    // edge: every untouched document is trivially its own singleton
    // component and is re-attached with one left join at the end, and
    // every contracted-away node recovers its component through c1.
    // The near-dup subgraph is normally a small fraction of the corpus,
    // so each round's joins run over the contracted remainder, not
    // corpus rows — at 100 TB this is the difference between iterating
    // on a few hundred GB and on the whole corpus.
    var comp = cEdges.select(col("a").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("component"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // Step 1 — propagate: a node's label becomes the min of its own and
      // its neighbors' labels (one hop per round on its own).
      val nbrMin = cEdges.join(comp, cEdges("b") === comp("doc_id"))
        .groupBy(col("a")).agg(min(col("component")).as("nbr_min"))
      val prop = comp.join(nbrMin, comp("doc_id") === nbrMin("a"), "left_outer")
        .select(col("doc_id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"),
          (coalesce(col("nbr_min"), col("component")) < col("component"))
            .as("chg1"))
      // Step 2 — pointer jump (path halving): label <- label's label, so
      // label distance to the component minimum HALVES per round and the
      // loop converges in O(log diameter) rounds instead of O(diameter) —
      // the difference between ~40 and ~12 rounds on a diameter-4000
      // chain. `least` keeps the step monotone regardless of join order.
      // Convergence = NO change in EITHER step: a propagate fixed point
      // already means labels are constant per component (any cheaper
      // neighbor label would have propagated), at which point the jump is
      // also a no-op — same criterion as plain min-label propagation.
      //
      // Lazy checkpoint + the changed flag riding the frame: the count
      // below is the ONE job per round — it materializes this round's
      // blocks and probes convergence in the same pass. The probe must be
      // a FULL count: an early-stopping limit(1) probe would leave later
      // partitions unmaterialized, and the next round would recompute
      // them from the (unpersisted) lineage.
      val next = prop.as("x").join(
          prop.select(col("doc_id").as("c"), col("component").as("cc")).as("y"),
          col("x.component") === col("y.c"), "left_outer")
        .select(col("x.doc_id").as("doc_id"),
          least(col("x.component"), coalesce(col("cc"), col("x.component")))
            .as("component"),
          (col("x.chg1") ||
            coalesce(col("cc"), col("x.component")) < col("x.component"))
            .as("chg"))
        .localCheckpoint(false)
      val changed = next.filter(col("chg")).count()
      // no unpersist(): it only clears CacheManager entries and is a no-op
      // for localCheckpoint blocks — those free when the previous round's
      // RDD becomes unreachable and the ContextCleaner collects it
      comp = next.select(col("doc_id"), col("component"))
      converged = changed == 0
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClusters did not converge in $maxIter iterations; " +
          "raise maxIter (components need O(cluster diameter) rounds)")
    // compose: every touched node's component is its representative's
    // fixpoint label (representatives not in any contracted edge keep
    // their c1 — already the component minimum for fully-contracted
    // clusters); untouched docs re-attach as singletons.
    val touched = c1.join(
        comp.select(col("doc_id").as("c1"), col("component").as("m")),
        Seq("c1"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("m"), col("c1")).as("component"))
    docs.select(col("doc_id")).join(touched.select(col("doc_id"),
        col("component").as("nbr_component")), Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("nbr_component"), col("doc_id")).as("component"))
      .withColumn("is_canonical", col("doc_id") === col("component"))
  }

  /** The composed corpus-scale dedup pipeline, shipped as ONE operator:
    * MinHash+LSH candidate generation → exact-Jaccard verification →
    * connected-component clustering. Returns (doc_id, component,
    * is_canonical): every document labeled with its duplicate cluster's
    * canonical (min) doc_id; filter `is_canonical` to materialize the
    * deduplicated corpus.
    *
    * This is the 100 TB path that retires the (lang, length-band) blocked
    * all-pairs variant above: candidates come from LSH band buckets (bucket
    * sizes tuned by bands × rows, independent of corpus size), every
    * candidate is verified with the exact sorted-merge Jaccard kernel (no
    * false positives — the threshold is checked, not inferred from bucket
    * membership), and clustering is O(cluster diameter) label propagation.
    * Recall is the LSH recall: with rows = numHashes/bands hash rows per
    * band, a pair at jaccard j is missed with probability (1-j^rows)^bands
    * — at the defaults (rows 4, bands 32), ~5e-8 at j = 0.8 and falling
    * steeply above; size numHashes/bands to the target threshold.
    */
  def nearDupCorpus(docs: DataFrame, numHashes: Int = 128, bands: Int = 32,
                    threshold: Double = 0.8, maxIter: Int = 20): DataFrame =
    duplicateClusters(docs, minhashLshPairs(docs, numHashes, bands, threshold),
      maxIter)

  /** Benchmark decontamination: for every needle document (an eval/test
    * set), every haystack document (the training corpus) that contains it
    * at word n-gram level — containment C(e, h) = |S(e) ∩ S(h)| / |S(e)|
    * over distinct word n-gram shingles, the standard train/test overlap
    * check run before an LLM training job.
    *
    * Inverted-index join, NOT a pair join: needle grams and haystack grams
    * meet on the gram hash (one shuffle, AQE-splittable — no explicit
    * repartition), matches count per (needle, haystack) pair with map-side
    * partial aggregation, and the needle's gram count joins back for the
    * ratio. Candidates are bounded by shared-gram posting lists; disjoint
    * documents never form a row. Containment is asymmetric by design —
    * a benchmark quoted inside a much larger training document still hits
    * 1.0 where symmetric Jaccard would vanish.
    *
    * Needles below n tokens have no grams and produce no rows (containment
    * over an empty set is undefined — they cannot be contaminated at this
    * gram width).
    */
  def containmentJoin(needles: DataFrame, haystack: DataFrame,
                      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val parts =
      needles.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // repartition BEFORE the gram explode: a small parquet input is one
    // scan task, and normalization+gram building is the per-doc CPU hot
    // spot (measured: a 2.1 s single-task stage at sf0.1 without this)
    def grams(df: DataFrame, id: String, gid: String) = df
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .repartition(parts, col("doc_id"))
      .select(col("doc_id").as(id),
        explode(transform(wordShinglesN(col("text"), n),
          g => xxhash64(g))).as(gid))
    val nGrams = grams(needles, "needle_id", "g")
    val nSizes = nGrams.groupBy(col("needle_id"))
      .agg(count(lit(1)).cast("long").as("n_grams"))
    val hGrams = grams(haystack, "hay_id", "g")
    nGrams.join(hGrams, "g")
      .groupBy(col("needle_id"), col("hay_id"))
      .agg(count(lit(1)).cast("long").as("matches"))
      .join(nSizes, "needle_id")
      .filter(col("matches").cast("double") / col("n_grams") >= threshold)
      .select(col("needle_id"), col("hay_id"),
        (col("matches").cast("double") / col("n_grams")).as("containment"))
  }

  /** Embedding-cosine near-dup pairs, blocked by the IVF coarse-quantizer
    * cell — the scale path. Each vector is multi-assigned to its `nProbe`
    * nearest KMeans cells ([[Similarity.assignCells]]), so boundary pairs
    * whose primary cells differ are still caught when any probed cell is
    * shared; pairs are generated by an EQUI-join on cell (never all-pairs
    * across the corpus), scored exactly, thresholded, and deduped (a pair
    * can meet in up to nProbe shared cells; cos_sim is deterministic per
    * pair so row-level distinct collapses the copies).
    *
    * The 100 TB shape: quantizer fit is one KMeans over a deterministic
    * sample; assignment is a map over narrow rows; the only corpus-sized
    * shuffles are the vec_id join replicating vectors to their cells and
    * the cell equi-join — per-cell work is (n/nCells)² with nCells sized
    * to the cluster, and AQE can split hot cells. Recall vs the all-pairs
    * baseline is asserted in the spec suite (well-separated duplicates
    * land in the same nearest cell with probability -> 1).
    */
  def embeddingNearDup(emb: DataFrame, threshold: Double, nCells: Int = 16,
                       nProbe: Int = 2, fitFraction: Double = 0.1): DataFrame =
    cellBlockedPairs(emb,
      Similarity.assignCells(emb, nCells, nProbe, fitFraction), threshold)

  /** [[embeddingNearDup]] with the quantizer swapped for
    * [[Similarity.fitQuantizerDet]] — identical pair plan, but the whole
    * operator becomes a pure function of the data (KMeans' k-means||
    * init draws per-partition randoms, so cell membership — and thus
    * WHICH near-dup pairs get caught — could vary with physical layout).
    * That exactness is what lets q94's oracle state a recall floor as a
    * checkable contract.
    */
  def embeddingNearDupDet(emb: DataFrame, threshold: Double, nCells: Int = 16,
                          nProbe: Int = 2,
                          fitFraction: Double = 0.1): DataFrame =
    cellBlockedPairs(emb,
      Similarity.assignCellsFrom(
        Similarity.fitQuantizerDet(emb, nCells, fitFraction), emb, nProbe),
      threshold)

  // shared pair stage: replicate vectors to their cells, equi-join on the
  // cell key, exact cosine, threshold, dedup meet-in-many-cells copies
  private def cellBlockedPairs(emb: DataFrame, cells: DataFrame,
                               threshold: Double): DataFrame = {
    val withNorm = emb
      .select(col("vec_id"), col("embedding"), vnorm(col("embedding")).as("nrm"))
      .join(cells, "vec_id") // replicate each vector to its nProbe cells
    val a = withNorm.as("a")
    val b = withNorm.as("b")
    a.join(b, col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_id_1"),
        col("b.vec_id").as("vec_id_2"),
        cosineWithNorms(col("a.embedding"), col("b.embedding"),
          col("a.nrm"), col("b.nrm")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .distinct()
  }

  /** Incremental near-dup: dedup a NEW batch of documents against an
    * EXISTING corpus — the ingest-time shape of corpus curation. A
    * production pipeline never re-deduplicates the whole corpus when a
    * delivery lands; it asks only "which new docs duplicate something we
    * already have (or each other)?". Emits one row per near-dup pair
    * `(new_id, dup_id, dup_source, jaccard)` where `new_id` is always from
    * the batch and `dup_id` is from the corpus (`dup_source = 'corpus'`) or
    * from the batch itself (`dup_source = 'batch'`, `new_id < dup_id`).
    * Corpus×corpus pairs are NEVER generated or scored.
    *
    * Same exact semantics as [[ngramJaccardPairs]]: candidates share the
    * (lang, n_chars/50) block, the size-ratio prune is lossless, and the
    * score is exact sorted-merge Jaccard over char-3-gram hashes.
    *
    * The 100 TB shape: ONE join. The probe target is the corpus tagged
    * `corpus` unioned with the batch tagged `batch`, so batch×corpus and
    * batch×batch pairs fall out of a single (lang, band) equi-join — the
    * batch-internal ordering guard (`a.doc_id < b.doc_id`) rides the join
    * condition, gated on the tag. Shuffled volume is |corpus| + 2|batch|
    * shingle rows, pair work is |batch|·(block density) + |batch|² —
    * independent of |corpus|²; growing the corpus 100× grows only the
    * probe target linearly. In production the corpus arm of the union is
    * the stored signature table, refreshed incrementally, so only the
    * batch is ever re-shingled.
    *
    * RECTANGULAR GRID SPLIT (round 10): a (lang, band) key group is one
    * reducer, and its pair work n_batch×n_target is COMPUTE-quadratic
    * while its bytes stay small — AQE's byte-threshold skew split never
    * fires (a 26k-doc hot block is ~40 MB, far under the 256 MB
    * threshold, yet ~700M candidate evals — measured as a 1-2-core
    * straggler tail at a 500k-row delivery before this fix). Same cure
    * as [[ngramJaccardPairs]]'s triangle grid, rectangular because the
    * sides are distinct roles: per block, g = ceil(√(n_a·n_b / cap));
    * batch docs (group ga = doc_id mod g) replicate to cells (ga, j),
    * target docs (group gb) to cells (i, gb), so every (batch, target)
    * pair meets exactly once at (ga, gb) and no unit exceeds ~cap pair
    * evals. cap auto-sizes from the block histogram exactly like the
    * self-join grid; at g = 1 the cell key is constant and the plan
    * degenerates to the pre-split single-unit join. Blocks with
    * no batch doc are pruned from the target at the grid join — corpus
    * rows that could never match skip the shuffle entirely.
    */
  def incrementalNearDup(corpus: DataFrame, batch: DataFrame,
                         threshold: Double,
                         unitsPerPartition: Int = 8): DataFrame = {
    val parts = batch.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    def blockCounts(docs: DataFrame, cname: String) = docs
      .filter(length(coalesce(col("text"), lit(""))) >= 3)
      .groupBy(col("lang"), floor(col("n_chars") / 50).as("band"))
      .agg(count(lit(1)).as(cname))
    // per-block pair volume n_a (batch) × n_b (corpus + batch); blocks
    // absent from the batch are dropped (left join) — nothing to probe
    val blocks = blockCounts(batch, "n_a")
      .join(blockCounts(corpus, "n_c"), Seq("lang", "band"), "left_outer")
      .select(col("lang"), col("band"),
        (col("n_a") * (col("n_a") + coalesce(col("n_c"), lit(0L))))
          .cast("double").as("vol"))
    // unpartitioned window over the bounded block frame, not a crossJoin
    // (a 1-row-aggregate cross join plans as BNLJ — see blockGrid)
    val grid = blocks
      .withColumn("total_vol", sum(col("vol")).over(Window.partitionBy()))
      .select(col("lang"), col("band"),
        greatest(lit(1L), ceil(sqrt(col("vol") /
          greatest(lit(262144.0),
            col("total_vol") / lit(parts.toLong * unitsPerPartition))))
          .cast("long")).as("g_b"))
    def blocked(docs: DataFrame): DataFrame = docs
      .select(col("doc_id"), col("lang"), floor(col("n_chars") / 50).as("band"))
      .join(hashedShingles(docs), "doc_id")
      .join(broadcast(grid), Seq("lang", "band"))
      .withColumn("grp", pmod(col("doc_id"), col("g_b")))
    // TWO role pipelines by design — the batch (probe) side and the
    // target side each shingle and exchange independently, so the batch
    // is shingled twice per call. Deliberate (round 11, ADVICE r10
    // adjudication, same finding as ngramJaccardPairs): any per-side
    // role restriction over a shared role-tagged union is pushed below
    // the repartition, which both breaks exchange canonicalization AND
    // makes the corpus arm of the union compute on the batch side too —
    // strictly worse than re-shingling the (delivery-sized) batch.
    val aSide = blocked(batch)
      .select(col("doc_id"), col("lang"), col("band"), col("sh"), col("n_sh"),
        col("grp").as("ci"),
        explode(sequence(lit(0L), col("g_b") - 1)).as("cj"))
      .repartition(parts, col("lang"), col("band"), col("ci"), col("cj"))
    val target = blocked(corpus).withColumn("dup_source", lit("corpus"))
      .unionByName(blocked(batch).withColumn("dup_source", lit("batch")))
    val bSide = target
      .select(col("doc_id"), col("lang"), col("band"), col("sh"), col("n_sh"),
        col("dup_source"),
        explode(sequence(lit(0L), col("g_b") - 1)).as("ci"),
        col("grp").as("cj"))
      .repartition(parts, col("lang"), col("band"), col("ci"), col("cj"))
    val sizeCond =
      col("a.n_sh") * threshold <= col("b.n_sh") &&
        col("b.n_sh") * threshold <= col("a.n_sh")
    aSide.as("a").join(bSide.as("b"),
        col("a.lang") === col("b.lang") &&
        col("a.band") === col("b.band") &&
        col("a.ci") === col("b.ci") && col("a.cj") === col("b.cj") &&
        sizeCond &&
        (col("b.dup_source") === "corpus" ||
          col("a.doc_id") < col("b.doc_id")))
      .select(
        col("a.doc_id").as("new_id"),
        col("b.doc_id").as("dup_id"),
        col("b.dup_source").as("dup_source"),
        jaccard(col("a.sh"), col("b.sh"),
          col("a.n_sh") + col("b.n_sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding-cosine near-dup pairs, blocked by a caller-provided `label`
    * column — the explicit-block variant for corpora that already carry a
    * trusted partition key (shard, source, dedup bucket). With few/coarse
    * labels the within-block join is quadratic: when no such key exists,
    * [[embeddingNearDup]] (IVF-cell blocking) is the default scale path.
    * Norms precomputed pre-join.
    */
  def embeddingNearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val withNorm = emb.select(col("vec_id"), col("label"), col("embedding"),
      vnorm(col("embedding")).as("nrm"))
    val a = withNorm.as("a")
    val b = withNorm.as("b")
    a.join(b, col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_id_1"),
        col("b.vec_id").as("vec_id_2"),
        cosineWithNorms(col("a.embedding"), col("b.embedding"),
          col("a.nrm"), col("b.nrm")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Winnowing-fingerprint near-dup pairs (Schleimer et al. '03, the MOSS
    * selector — see expressions/Winnow.scala): docs sharing >= `minShared`
    * selected k-gram hashes, with the detection guarantee that any common
    * substring of w+k-1 chars shares a fingerprint. The SUBSTRING-match
    * arm of the near-dup family: shingle-set Jaccard (q19/q20) measures
    * bag overlap anywhere; winnowing targets contiguous runs —
    * boilerplate, quotations, verbatim copies.
    *
    * Scale shape: fingerprints are selected map-side (one codegen'd
    * kernel call per doc, ~2n/(w+1) rows emitted), then the pair join is
    * an inverted-index equi-join on the fingerprint value. Fingerprints
    * appearing in more than `dfCap` docs (template boilerplate — the
    * quadratic hot keys) are dropped BEFORE pairing, the standard MOSS
    * noise cut; the cap is part of the operator's contract and the
    * oracle mirrors it.
    */
  def winnowPairs(docs: DataFrame, k: Int, w: Int, minShared: Long,
                  dfCap: Long): DataFrame = {
    val fps = docs.select(col("doc_id"),
        explode(call_function("graft_winnow", col("text"), lit(k), lit(w)))
          .as("fp"))
      .localCheckpoint() // feeds both the df cut and the pair join
    val rare = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .select(col("fp"))
    val kept = fps.join(rare, Seq("fp"))
    kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Exact substring-duplication spans (Lee et al. '22, "Deduplicating
    * Training Data Makes Language Models Better"): per doc, the maximal
    * character spans covered by k-char substrings that occur >= 2 times
    * ANYWHERE in the corpus — the verbatim-repetition signal that drives
    * span-level (not doc-level) dedup of boilerplate and quotations.
    *
    * The published implementation builds one giant suffix array — a
    * single-machine memory wall. The Spark reformulation is a shingle
    * multiplicity count: emit every k-char start position (row count =
    * corpus chars, scan-shaped), count occurrences per shingle with
    * map-side partial aggregation (hot boilerplate shingles collapse
    * before the shuffle — the skew killer a count-window would reintroduce
    * by pinning each shingle's positions to one task), then a semi-join
    * marks duplicated starts and a per-doc gaps-and-islands pass (window
    * keyed by doc — bounded partitions) merges starts whose [off, off+k)
    * intervals touch into maximal spans. Two shuffles on the shingle, one
    * on doc_id; no pair join anywhere, so cost stays linear in corpus
    * size at any duplication rate.
    */
  def dupSubstringSpans(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = docs.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    // one row per k-char window start; guard n_chars >= k (sequence(0, n)
    // with n < 0 would infer a NEGATIVE step and emit descending offsets).
    // repartition FIRST (round 13): without it the explode + substr + the
    // window exchange's write all run inside the parquet SCAN stage — a
    // few input splits, not the cluster (on the hot-shingle profile the
    // whole corpus was ONE task: 15 of q142's 16.8 s; the same
    // spread-the-CPU move hashedShingles documents).
    val sh = docs.filter(col("n_chars") >= k)
      .select(col("doc_id"), col("n_chars"), col("text"))
      .repartition(parts, col("doc_id"))
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_chars") - k)).as("off"),
        col("text"))
      .select(col("doc_id"), col("off"),
        col("text").substr(col("off").cast("int") + 1, lit(k)).as("s"))
    // round 12 (guide §2.3/§2.4): multiplicity marking used to
    // localCheckpoint the (doc_id, off, s) frame — corpus chars × k
    // bytes of storage — then shuffle it TWICE (the groupBy(s) count and
    // the semi join back). A count window partitioned by the shingle
    // does both in ONE exchange of the frame with no checkpoint: rows
    // whose window count >= 2 are exactly the duplicated starts. Window
    // buffers are per-shingle groups (occurrence counts), never a
    // corpus-scale partition.
    val dupStarts = sh
      .withColumn("n_occ", count(lit(1)).over(Window.partitionBy(col("s"))))
      .filter(col("n_occ") >= 2)
      .select(col("doc_id"), col("off"))
    // merge duplicated starts into maximal covered spans: a start opens a
    // new span iff its interval [off, off+k) neither overlaps nor touches
    // the previous one (gap > k); span char length is then end - start
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("off"))
    val run = Window.partitionBy(col("doc_id")).orderBy(col("off"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dupStarts
      .withColumn("gap", col("off") - lag(col("off"), 1).over(byDoc))
      .withColumn("new_span",
        when(col("gap").isNull || col("gap") > k, 1L).otherwise(0L))
      .withColumn("span_id", sum(col("new_span")).over(run))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("off")).as("s0"), (max(col("off")) + k).as("e0"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e0") - col("s0")).as("dup_chars"),
        max(col("e0") - col("s0")).as("max_span"))
  }

  // ------------------------------------------------------------------
  // Engine-portable (md5-affine) MinHash / SimHash — round 7.
  //
  // The xxhash64/murmur3 operators above are the throughput path, but
  // their signatures cannot be restated in another engine's SQL, so the
  // queries built on them could only carry boolean recall contracts as
  // oracles (rounds 1-6). These variants derive every hash from md5 —
  // the one hash both Spark and DuckDB compute bit-identically on UTF-8
  // strings — so the emitted PAIR SET itself is replayable (and
  // hash-comparable) in pure SQL. Same q23-hyperplane/q26-Lloyd move
  // that made the ANN paths oracle-able in round 6: engine-portable
  // determinism, not weaker hashing. The LSH/banding shape (and hence
  // the 100 TB story) is identical to the operators above; the only
  // cost delta is md5 vs xxhash64 per element and 64 affine mixes vs 64
  // seeded hashes per element.

  /** 2^61 - 1 (prime): the affine minhash family h_k(e) = (h1 + k*h2) mod P
    * over md5-derived (h1, h2). h1 uses 15 hex chars (< 2^60) and h2 13
    * (< 2^52), so h1 + 63*h2 < 2^61 — no signed-64 overflow in either
    * engine, and DuckDB's checked BIGINT arithmetic never trips.
    */
  val AffineP = 2305843009213693951L

  private def md5h(e: Column): (Column, Column) = {
    val hx = md5(e.cast("binary"))
    (conv(hx.substr(1, 15), 16, 10).cast("long"),
      conv(hx.substr(16, 13), 16, 10).cast("long"))
  }

  /** The k-th 60-bit XOR-family constant for the b-bit screen: the top 60
    * bits of md5("graft-bbit-k"). min(h1 XOR c_k) descends the element
    * set's binary trie along a pseudo-random path per k — the pairwise
    * order of two elements flips with c_k's bit at their highest
    * differing position — giving near-independent argmins across k, which
    * the ADDITIVE affine family (h1 + k·h2, h1-dominated, never wrapping
    * mod 2^61-1) measurably does not: on the sf0.1 corpus its 64 minima
    * agree on ALL slots for 703k of 5.2M banded candidates (see
    * minhashLshPairsScreenedMd5's scaladoc). 64-bit-safe and replayed in
    * DuckDB as xor(h1, <literal>) — the literal is this function's value,
    * the single source of truth for both engines.
    */
  private[graft] def screenConst(k: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft-bbit-$k".getBytes("UTF-8"))
    new java.math.BigInteger(1, md).shiftRight(68).longValue()
  }

  /** Matched-slot count of one 32-slot pack of a 2-bit-minhash sketch:
    * slot k matches iff XOR bits 2k and 2k+1 are both zero, so
    * matches = 32 - popcount((x | x>>1) & 0x5555..5) (x>>1 is the
    * arithmetic shift: its sign-extended bit 63 is an ODD position,
    * masked out). Pure codegen bit arithmetic — evaluable per
    * co-occurrence inside a join's streamed inner loop, zero state.
    * Shared by the self-join ([[minhashLshPairsScreenedMd5]]) and
    * bipartite ([[incrementalLshScreenedMd5]]) screened operators.
    */
  private def bbSlotMatches(a: Column, b: Column): Column = {
    val x = a.bitwiseXOR(b)
    lit(32) - bit_count(x.bitwiseOR(shiftright(x, 1))
      .bitwiseAND(lit(0x5555555555555555L)))
  }

  /** Shared md5-affine LSH core over a prepared frame of DISTINCT
    * (doc_id, e: string) element rows. Bands on concatenated per-band
    * minima (decimal strings joined by ':'), verifies candidates with the
    * exact set Jaccard in the 60-bit h1 space — sorted distinct-h1 arrays
    * through the allocation-free merge kernel, the same record-join shape
    * (and the same hashed-element-Jaccard semantics) as the xxhash64
    * operators. The ORACLE computes in the identical h1 space, so the two
    * sides are the same function by construction: an h1 collision changes
    * both engines' answers identically (the first cut of this operator
    * verified by an element-STRING pair join instead — semantically purer
    * but the candidates × elements fan-out measured 224 s at sf0.1, 50×
    * the xxhash64 path). No probabilistic screen (the xxhash64 path's
    * agree-count screen is lossy at ~1e-6 — fine for an operator, fatal
    * for a hash-compared oracle). The size-ratio prune is kept: it is
    * mathematically lossless for jaccard >= threshold, in both engines.
    *
    * Round 13 adjudication (VERDICT r12 item 7): the b-bit screen-in-join
    * CANNOT be applied to the unscreened rows8 twins (q328/q329) without
    * changing their declared output — a true threshold pair's slot-match
    * count is Binomial-tailed, so ANY cut drops some pair the exact
    * verify would keep (that loss is exactly what q331/q332 DECLARE as
    * part of their semantics). The lossless alternative (survivor-staged
    * verify with screenCut = 0) was built and measured NEGATIVE — see
    * the staging comment at (candV, sigV) below.
    */
  private def md5AffineLshPairs(elems: DataFrame, numHashes: Int, bands: Int,
                                threshold: Double, simName: String,
                                screenCut: Int = 0): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // the screen always uses 64 xor-family minima (two packed longs),
    // independent of numHashes — sm_k derives from h1 alone
    require(screenCut >= 0 && screenCut <= 64, "screenCut in [0, 64]")
    val rows = numHashes / bands
    val (h1, h2) = md5h(col("e"))
    val hashed = elems.select(col("doc_id"), h1.as("h1"), h2.as("h2"))
    val minCols = (0 until numHashes).map { k =>
      min((col("h1") + lit(k.toLong) * col("h2")) % AffineP).as(s"m$k")
    }
    // one shuffle computes the verify set AND all minima; localCheckpoint
    // so the pipeline runs once across the four consumers below
    // b-bit minhash screen payload (Li & Koenig, WWW'10): 2 low bits of
    // each of 64 XOR-family minima packed into two longs — a 16-byte
    // sketch whose per-slot match probability is j + (1-j)/4, carried
    // through the candidate join where the full hs array (~4 KB) cannot
    // be. The screen minima sm_k = min(h1 XOR screenConst(k)) are a
    // SEPARATE family from the banding minima: the additive affine
    // minima are h1-dominated and correlated across k (measured: 703k of
    // 5.2M sf0.1 candidates agree on all 64 slots), so parity bits drawn
    // from them cannot separate the floor — the xor family's argmins are
    // near-independent and the floor lands at (1+3*j0)/4 * 64 as theory
    // says (measured: the j0~0.2 floor concentrates at 16-35 matches
    // with 18 of 5.2M candidates in the 44-55 gap).
    val smCols =
      if (screenCut == 0) Nil
      else (0 until 64).map(k =>
        min(col("h1").bitwiseXOR(lit(screenConst(k)))).as(s"sm$k"))
    val sig0 = hashed.groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("h1"))).as("hs"), (minCols ++ smCols): _*)
      .withColumn("n", size(col("hs")).cast("long"))
    val sig = (if (screenCut > 0) {
      def pack(off: Int) = (0 until 32).map(i =>
        shiftleft(col(s"sm${off + i}") % 4, 2 * i)).reduce(_ bitwiseOR _)
      sig0.withColumn("bb0", pack(0)).withColumn("bb1", pack(32))
        .drop((0 until 64).map(k => s"sm$k"): _*)
    } else sig0).localCheckpoint(false)
    val bandKeys = (0 until bands).map { b =>
      concat_ws(":", (0 until rows).map(r => col(s"m${b * rows + r}")): _*)
    }
    // the 16-byte screen sketches RIDE THE BANDED ROWS so the screen can
    // run INSIDE the band join, before the candidate distinct (round 11):
    // the distinct was the real sf10 wall — 3.15 BILLION banded
    // co-occurrences at the weighted twin's 16-band geometry (measured,
    // tools/bisect_q332.scala audit; biggest bucket only 3875 docs, so
    // this is volume, not skew) flowed through the pair distinct and
    // OOMed the 8 g protocol heap in the join+partial-distinct stage.
    // Screening per CO-OCCURRENCE is pure codegen bit arithmetic in the
    // join's streamed inner loop — no shuffle, no aggregation state —
    // and the distinct then ingests only survivors. The emitted SET is
    // unchanged (screen-then-distinct = distinct-then-screen for a
    // per-pair predicate), so the DuckDB oracle is untouched.
    val bandedCols =
      if (screenCut == 0) Seq(col("doc_id"), col("n"))
      else Seq(col("doc_id"), col("n"), col("bb0"), col("bb1"))
    val banded = sig.select(bandedCols :+
      posexplode(array(bandKeys: _*)).as(Seq("band", "key")): _*)
    // slot k matches iff XOR bits 2k and 2k+1 are both zero, so
    //   matches = 64 - popcount((x | x>>1) & 0x5555..5) summed over the
    // two packs (x>>1 is the arithmetic shift: its sign-extended bit 63
    // is an ODD position, masked out). Everything is md5-deterministic,
    // so the DuckDB oracle replays the identical screen and the output
    // stays full-hash comparable — the screen is part of the SEMANTICS.
    val screenCond =
      if (screenCut == 0) lit(true)
      else bbSlotMatches(col("a.bb0"), col("b.bb0")) +
        bbSlotMatches(col("a.bb1"), col("b.bb1")) >= screenCut
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * threshold <= col("b.n") &&
          col("b.n") * threshold <= col("a.n") && screenCond)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    // verify staging (round 11, VERDICT r10 item 2): when the screen is
    // on, only SURVIVORS may carry the full hs arrays into the verify
    // joins. Unstaged, both verify joins sort-merge the ENTIRE sig frame
    // — every doc's element-hash array through an SMJ sort — and that
    // sort is what OOMed the occurrence-expanded weighted twin at the
    // sf10 rung on the 8 g protocol heap (33-134 MB sorter page allocs;
    // probe_r10/q332_*_8g_OOM.json) while the 16-byte screen had already
    // cut 5.2M candidates to ~1k survivors. Staging: checkpoint the
    // survivor pairs (output-sized), semi-filter sig to survivor ids with
    // a SHUFFLED HASH semi join (build = the narrow id side, the array
    // side is streamed — never sorted, never built into a map), then run
    // the exact verify on the survivor-only frame. Semantics unchanged:
    // the semi filter drops only rows no surviving pair references.
    // Round 13, measured and NOT extended: staging the UNSCREENED
    // rows >= 8 geometries (q328/q329) through the same survivor semi
    // filter was built and benched — sf0.1 3.62/3.95 -> 4.48/5.27 s,
    // sf1 30.1/30.5 -> 31.3/37.3 s, and the 10×-rung disk spill did not
    // move a byte (716 MB / 0.98 GB before AND after). The spill lives
    // in the signature build's collect_set aggregation state, and the
    // twins' wall is the md5-per-element signature pass itself (the
    // oracle-replayability contract), so the extra checkpoint + distinct
    // + semi join is pure overhead there. Staging stays screened-only.
    val (candV, sigV) =
      if (screenCut == 0) (cand, sig)
      else {
        val c = cand.localCheckpoint(false)
        val ids = c.select(col("d1").as("doc_id"))
          .union(c.select(col("d2").as("doc_id"))).distinct()
        (c, sig.join(ids.hint("shuffle_hash"), Seq("doc_id"), "left_semi"))
      }
    val inter = call_function("graft_sorted_intersect_count",
      col("hs1"), col("hs2"))
    val jac = inter.cast("double") /
      (col("n1") + col("n2") - inter).cast("double")
    candV
      .join(sigV.select(col("doc_id").as("d1"), col("hs").as("hs1"),
        col("n").as("n1")), Seq("d1"))
      .join(sigV.select(col("doc_id").as("d2"), col("hs").as("hs2"),
        col("n").as("n2")), Seq("d2"))
      .filter(jac >= threshold)
      .select(col("d1").as("doc_id_1"), col("d2").as("doc_id_2"),
        jac.as(simName))
  }

  /** LSH band-bucket audit — the pre-flight check this round's 100×-rung
    * finding says every large-scale LSH dedup needs BEFORE it launches:
    * per band, the bucket count, the largest bucket, and the implied
    * candidate-pair volume Σ C(size, 2). On a corpus with a background
    * similarity floor (templated boilerplate, micro vocabularies) the
    * candidate term is n²·(j0^rows)·bands — invisible at pilot scale,
    * measured 29% of ALL pairs on this synthetic corpus — and this
    * one-aggregate audit prices the verify stage from the SIGNATURES
    * alone, no pair is ever materialized. md5-affine signature family
    * (same constants as [[minhashLshPairsMd5]]), so the whole audit is
    * replayable in SQL.
    */
  def lshBucketAudit(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
                     shingleWidth: Int = 5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val parts = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val elems = docs.select(col("doc_id"), col("text"))
      .repartition(parts, col("doc_id"))
      .select(col("doc_id"),
        explode(shinglesW(col("text"), shingleWidth)).as("e"))
    val (h1, h2) = md5h(col("e"))
    val hashed = elems.select(col("doc_id"), h1.as("h1"), h2.as("h2"))
    val minCols = (0 until numHashes).map { k =>
      min((col("h1") + lit(k.toLong) * col("h2")) % AffineP).as(s"m$k")
    }
    val sig = hashed.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    val bandKeys = (0 until bands).map { b =>
      concat_ws(":", (0 until rows).map(r => col(s"m${b * rows + r}")): _*)
    }
    sig.select(posexplode(array(bandKeys: _*)).as(Seq("band", "key")))
      .groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("band").cast("long").as("band"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("sz")).as("max_bucket"),
        sum(expr("sz * (sz - 1) div 2")).as("candidate_pairs"),
        sum(col("sz")).as("n_docs"))
  }

  /** Engine-portable MinHash+LSH near-dup pairs in [[ppjoinJaccardPairs]]'s
    * exact shingle space (distinct raw w-grams): md5-affine signatures,
    * band-bucket candidates, exact-Jaccard verification. The emitted set
    * is a deterministic pure function of the corpus, replayable in SQL —
    * q20's full-hash oracle (the round-6 boolean recall contract retired).
    */
  def minhashLshPairsMd5(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
                         threshold: Double = 0.6, shingleWidth: Int = 5): DataFrame = {
    val parts = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val elems = docs
      .select(col("doc_id"), col("text"))
      .repartition(parts, col("doc_id")) // spread the shingle+md5 CPU
      .select(col("doc_id"),
        explode(shinglesW(col("text"), shingleWidth)).as("e"))
    md5AffineLshPairs(elems, numHashes, bands, threshold, "jaccard")
  }

  /** [[minhashLshPairsMd5]] with a 2-bit-minhash candidate screen between
    * banding and exact verification — the operator this round's sf5 wall
    * demanded. The rows=8 banding floor keeps CANDIDATES sub-linear
    * (audited: 695M at 50x), but exact verification must drag each
    * candidate's full shingle-hash array (~4 KB) through a shuffle, and
    * that array-carrying intermediate is what crossed the 78 GB scratch
    * at the 50x rung (measured DNF at 8g/64g heap, 32/256 partitions).
    * The screen carries a 16-BYTE sketch on the banded rows instead: the
    * two low bits of each of 64 XOR-FAMILY minima sm_k = min(h1 XOR
    * screenConst(k)) (Li & Koenig's b-bit minhash, b=2), match
    * probability j + (1-j)/4 per slot — so at the default cut the j0~0.2
    * template floor sits ~4 sigma below and is annihilated INSIDE the
    * band join (round 11: per co-occurrence, codegen bit ops in the
    * join's inner loop, before even the candidate DISTINCT — which was
    * itself the 100× wall: 3.15B banded co-occurrences at sf10), while
    * the verify stage runs on an output-sized survivor set (measured at
    * sf0.1: 5.2M banded candidates -> ~1.1k screen survivors at cut 41,
    * with the floor concentrated at 16-35 matches and only 18 pairs in
    * the 44-55 gap).
    *
    * WHY A SECOND HASH FAMILY (round-9 finding): the banding minima
    * m_k = min((h1 + k*h2) mod 2^61-1) are h1-DOMINATED — h1 < 2^60 and
    * k*h2 < 2^58, the mod never wraps — so one element (the min-h1 one)
    * usually achieves the minimum for EVERY k and the 64 minima are
    * heavily correlated (measured: 703k of the same 5.2M candidates
    * agree on ALL 64 slots; parity bits drawn from them leave ~31% of
    * the floor above any usable cut). Banding CORRECTNESS is unaffected
    * (candidates are exactly verified; the correlation actually raises
    * true-pair band recall), but any ESTIMATOR built on those minima
    * inherits the correlation — hence the independent xor family here.
    *
    * The screen is DETERMINISTIC md5 arithmetic, replayed verbatim by
    * the DuckDB oracle, so unlike the xxhash64 agree-count screen (lossy
    * vs an independent oracle) the output stays full-hash comparable:
    * the emitted set is exactly { pairs : screenMatches >= screenCut AND
    * exact J >= threshold } on BOTH engines. The recall trade is the
    * operator's contract, same style as the rows=8 banding itself: at
    * screenCut=41 (mean - 1 sigma for j=0.6) a pair at exactly j=0.6
    * passes with ~0.85, j=0.7 with ~0.995, j>=0.8 with >0.9999 — the
    * catch-strong-dups production point. Pick screenCut ~ 4 sigma above
    * the corpus floor measured by [[lshBucketAudit]].
    */
  def minhashLshPairsScreenedMd5(docs: DataFrame, numHashes: Int = 64,
                                 bands: Int = 8, threshold: Double = 0.6,
                                 shingleWidth: Int = 5,
                                 screenCut: Int = 41): DataFrame = {
    require(screenCut > 0, "screenCut must be positive (else use minhashLshPairsMd5)")
    val parts = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val elems = docs
      .select(col("doc_id"), col("text"))
      .repartition(parts, col("doc_id"))
      .select(col("doc_id"),
        explode(shinglesW(col("text"), shingleWidth)).as("e"))
    md5AffineLshPairs(elems, numHashes, bands, threshold, "jaccard", screenCut)
  }

  /** Engine-portable WEIGHTED MinHash+LSH in [[weightedJaccardPairs]]'s
    * occurrence-expanded space: the k-th occurrence of normalized w-gram g
    * becomes the distinct element "g#k" (exactly q52's oracle convention),
    * then the md5-affine core applies verbatim — weighted Jaccard is plain
    * set Jaccard of the expansion. q53's full-hash oracle.
    */
  def weightedMinhashLshPairsMd5(docs: DataFrame, numHashes: Int = 64,
                                 bands: Int = 16, threshold: Double = 0.6,
                                 shingleWidth: Int = 5): DataFrame = {
    val parts = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val elems = docs
      .select(col("doc_id"), col("text"))
      .repartition(parts, col("doc_id"))
      .select(col("doc_id"),
        explode(shinglesMultiW(normText(col("text")), shingleWidth)).as("g"))
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), col("g"),
        explode(sequence(lit(1L), col("tf"))).as("k"))
      .select(col("doc_id"),
        concat(col("g"), lit("#"), col("k").cast("string")).as("e"))
    md5AffineLshPairs(elems, numHashes, bands, threshold, "wjaccard")
  }

  /** [[weightedMinhashLshPairsMd5]] with the same 2-bit-minhash screen as
    * [[minhashLshPairsScreenedMd5]] — the weighted twin of the 50x wall
    * fix. The screen's 64 xor-family minima derive from h1 alone, so the
    * occurrence-expanded "g#k" element space plugs in unchanged: weighted
    * Jaccard is plain set Jaccard of the expansion, and the screen's
    * per-slot match probability is j_w + (1-j_w)/4 over that expansion.
    * Same deterministic-oracle grade: the screened set is the semantics,
    * replayed verbatim by DuckDB.
    */
  def weightedMinhashLshPairsScreenedMd5(docs: DataFrame, numHashes: Int = 128,
                                         bands: Int = 16, threshold: Double = 0.6,
                                         shingleWidth: Int = 5,
                                         screenCut: Int = 41): DataFrame = {
    require(screenCut > 0, "screenCut must be positive (else use weightedMinhashLshPairsMd5)")
    val parts = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val elems = docs
      .select(col("doc_id"), col("text"))
      .repartition(parts, col("doc_id"))
      .select(col("doc_id"),
        explode(shinglesMultiW(normText(col("text")), shingleWidth)).as("g"))
      .groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), col("g"),
        explode(sequence(lit(1L), col("tf"))).as("k"))
      .select(col("doc_id"),
        concat(col("g"), lit("#"), col("k").cast("string")).as("e"))
    md5AffineLshPairs(elems, numHashes, bands, threshold, "wjaccard", screenCut)
  }

  /** Screened incremental LSH near-dup (round 12, VERDICT r11 item 1):
    * [[minhashLshPairsScreenedMd5]]'s banding + in-band 2-bit-minhash
    * screen + survivor-staged verify, restated as the BIPARTITE
    * batch-vs-corpus join [[incrementalNearDup]] shapes — the scale arm
    * of the streaming ingest gate. The gate is measured CANDIDATE-bound
    * (probe_r11: 1661 rows/s on a 500k NOVEL delivery ≈ the 1422 replica
    * worst case — kernel evals dominate, output is ~15%), and the
    * screen that collapsed q331/q332's candidate volume (5.2M banded
    * co-occurrences → ~1k survivors at sf0.1) applies verbatim: the
    * 16-byte b-bit sketches ride the banded rows and the screen
    * evaluates INSIDE the bipartite band join — pure codegen bit
    * arithmetic per co-occurrence, before the candidate DISTINCT — so
    * the exact verify only ever sees an output-sized survivor set.
    *
    * Emits one row per flagged pair `(new_id, dup_id, dup_source,
    * jaccard)`: `new_id` is always from the batch; `dup_id` from the
    * corpus (`dup_source = 'corpus'`) or a LOWER-id batch-mate
    * (`'batch'`). Corpus×corpus pairs are never generated. doc_ids must
    * be disjoint across the two frames (same implicit contract as
    * [[incrementalNearDup]] — a delivery never reuses a corpus id).
    *
    * The 100 TB shape, and where it beats the exact gate:
    *  - the batch is shingled and signed ONCE (its checkpointed
    *    signature frame serves both the probe side and the batch arm of
    *    the target union — unlike the shingle-level union, where the
    *    round-11 adjudication showed role filters get pushed below the
    *    repartition, a checkpoint boundary is opaque to Catalyst, so
    *    reuse is free). In production the corpus arm is the STORED
    *    signature table, refreshed as deliveries are accepted — only
    *    delivery bytes are ever re-hashed, and the whole corpus text is
    *    never re-read per delivery.
    *  - candidate work is banded (rows=8 floor collapses the template
    *    floor ~600×) and then screened per co-occurrence, so the
    *    per-delivery wall tracks the SURVIVOR count, not the block
    *    density that bounds [[incrementalNearDup]] (whose exact
    *    (lang, size-band) blocks pair every block-mate).
    *  - the verify joins are survivor-staged behind shuffled-hash semi
    *    joins (arrays streamed, never sorted) — the q331/q332 sf10 fix.
    *
    * Same recall contract as [[minhashLshPairsScreenedMd5]] (banding ×
    * screen, catch-strong-dups production point at the defaults); the
    * emitted set is md5-deterministic and fully replayed by the DuckDB
    * oracle (q335).
    */
  def incrementalLshScreenedMd5(corpus: DataFrame, batch: DataFrame,
                                numHashes: Int = 64, bands: Int = 8,
                                threshold: Double = 0.6,
                                shingleWidth: Int = 5,
                                screenCut: Int = 41): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(screenCut >= 1 && screenCut <= 64, "screenCut in [1, 64]")
    val rows = numHashes / bands
    val parts = batch.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // md5-affine signature + 16-byte screen sketch per doc — identical
    // constants/expressions to md5AffineLshPairs so the oracle replay and
    // the self-join operators share every bit of the hash space
    def sigOf(docs: DataFrame): DataFrame = {
      val elems = docs.select(col("doc_id"), col("text"))
        .repartition(parts, col("doc_id")) // spread the shingle+md5 CPU
        .select(col("doc_id"),
          explode(shinglesW(col("text"), shingleWidth)).as("e"))
      val (h1, h2) = md5h(col("e"))
      val hashed = elems.select(col("doc_id"), h1.as("h1"), h2.as("h2"))
      val minCols = (0 until numHashes).map { k =>
        min((col("h1") + lit(k.toLong) * col("h2")) % AffineP).as(s"m$k")
      }
      val smCols = (0 until 64).map(k =>
        min(col("h1").bitwiseXOR(lit(screenConst(k)))).as(s"sm$k"))
      val sig0 = hashed.groupBy(col("doc_id"))
        .agg(array_sort(collect_set(col("h1"))).as("hs"), (minCols ++ smCols): _*)
        .withColumn("n", size(col("hs")).cast("long"))
      def pack(off: Int) = (0 until 32).map(i =>
        shiftleft(col(s"sm${off + i}") % 4, 2 * i)).reduce(_ bitwiseOR _)
      sig0.withColumn("bb0", pack(0)).withColumn("bb1", pack(32))
        .drop((0 until 64).map(k => s"sm$k"): _*)
        .localCheckpoint(false)
    }
    val sigB = sigOf(batch)
    // production: this union arm is the standing signature TABLE — the
    // only corpus-sized cost per delivery; here it is computed from text
    val sigT = sigOf(corpus).withColumn("dup_source", lit("corpus"))
      .unionByName(sigB.withColumn("dup_source", lit("batch")))
    val bandKeys = (0 until bands).map { b =>
      concat_ws(":", (0 until rows).map(r => col(s"m${b * rows + r}")): _*)
    }
    def banded(sig: DataFrame, extra: Seq[Column]): DataFrame = sig.select(
      (Seq(col("doc_id"), col("n"), col("bb0"), col("bb1")) ++ extra) :+
        posexplode(array(bandKeys: _*)).as(Seq("band", "key")): _*)
    val bandedB = banded(sigB, Nil)
    val bandedT = banded(sigT, Seq(col("dup_source")))
    val screenCond =
      bbSlotMatches(col("a.bb0"), col("b.bb0")) +
        bbSlotMatches(col("a.bb1"), col("b.bb1")) >= screenCut
    // batch-internal pairs meet once per ordering guard; batch×corpus
    // pairs carry no order (the batch doc is always the new side). The
    // screen + lossless size prune run INSIDE the join, pre-distinct.
    val cand = bandedB.as("a").join(bandedT.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          (col("b.dup_source") === "corpus" ||
            col("a.doc_id") < col("b.doc_id")) &&
          col("a.n") * threshold <= col("b.n") &&
          col("b.n") * threshold <= col("a.n") && screenCond)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("b.dup_source").as("dup_source"))
      .distinct()
      .localCheckpoint(false) // output-sized; feeds the two semi filters
    // survivor staging (the q331/q332 sf10 fix): only docs a surviving
    // pair references carry their hs arrays into the verify joins, and
    // the semi joins build on the narrow id side (arrays streamed)
    val sigBv = sigB.join(
      cand.select(col("d1").as("doc_id")).distinct().hint("shuffle_hash"),
      Seq("doc_id"), "left_semi")
    val sigTv = sigT.join(
      cand.select(col("d2").as("doc_id")).distinct().hint("shuffle_hash"),
      Seq("doc_id"), "left_semi")
    val inter = call_function("graft_sorted_intersect_count",
      col("hs1"), col("hs2"))
    val jac = inter.cast("double") /
      (col("n1") + col("n2") - inter).cast("double")
    cand
      .join(sigBv.select(col("doc_id").as("d1"), col("hs").as("hs1"),
        col("n").as("n1")), Seq("d1"))
      .join(sigTv.select(col("doc_id").as("d2"), col("hs").as("hs2"),
        col("n").as("n2")), Seq("d2"))
      .filter(jac >= threshold)
      .select(col("d1").as("new_id"), col("d2").as("dup_id"),
        col("dup_source"), jac.as("jaccard"))
  }

  /** Engine-portable SimHash: token bits come from md5 (hi/lo 32-bit hex
    * halves packed big-endian, so bit j of the signature is bit (j mod 4)
    * of hex digit 16 - j/4 — directly restatable over DuckDB's md5 hex).
    * Same per-row fold as [[simhash]]: no explode, no token shuffle.
    */
  def simhashMd5(docs: DataFrame): DataFrame = {
    val masks = array((0 until 64).map(i => lit(1L << i)): _*)
    // one md5 per token (transform), then the fold — inlining the md5
    // expression into the zip_with lambda re-evaluates it per mask
    // element: 64 digests/token, measured 44 s for the whole sf0.1
    // entry vs ~4 s with the hash materialized
    val vs = transform(tokensWs(col("text")), t => {
      val hx = md5(t.cast("binary"))
      shiftleft(conv(hx.substr(1, 8), 16, 10).cast("long"), 32)
        .bitwiseOR(conv(hx.substr(9, 8), 16, 10).cast("long"))
    })
    val bitSums = aggregate(
      vs,
      array_repeat(lit(0L), 64),
      (acc: Column, v: Column) =>
        zip_with(acc, masks, (a, m) =>
          a + when(v.bitwiseAND(m) =!= 0, 1L).otherwise(-1L)))
    val packed = aggregate(
      zip_with(bitSums, masks, (b, m) => when(b > 0, m).otherwise(lit(0L))),
      lit(0L), (s: Column, x: Column) => s + x)
    docs.select(col("doc_id"), packed.as("simhash"))
  }

  /** Engine-portable SimHash near-dup pairs: [[simhashPairs]]'s pigeonhole
    * band blocking over [[simhashMd5]] signatures. Pigeonhole makes the
    * banding COMPLETE for hamming <= maxHamming, so the emitted set equals
    * the all-pairs same-lang hamming filter — which is exactly what the
    * SQL oracle states (no banding to replay). Emits hamming as BIGINT
    * (both engines' bit_count widths differ; the compare hashes dtypes).
    */
  def simhashPairsMd5(docs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    val nSeg = maxHamming + 1
    val parts = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sh = simhashMd5(
        docs.select(col("doc_id"), col("text"))
          .repartition(parts, col("doc_id"))) // spread the md5-fold CPU
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val segs = (0 until nSeg).map { i =>
      val lo = i * 64 / nSeg
      val hi = (i + 1) * 64 / nSeg
      val width = hi - lo
      val segval =
        if (width == 64) col("simhash")
        else shiftrightunsigned(col("simhash"), lo).bitwiseAND(lit((1L << width) - 1L))
      struct(lit(i).as("seg"), segval.as("segval"))
    }
    val banded = sh.select(col("doc_id"), col("lang"), col("simhash"),
        explode(array(segs: _*)).as("s"))
      .select(col("doc_id"), col("lang"), col("simhash"),
        col("s.seg").as("seg"), col("s.segval").as("segval"))
    banded.as("a").join(banded.as("b"),
        col("a.lang") === col("b.lang") &&
        col("a.seg") === col("b.seg") &&
        col("a.segval") === col("b.segval") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_id_1"),
        col("b.doc_id").as("doc_id_2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
