package graft

import graft.functions.ExactAgg
import graft.operators._
import graft.sources.CsvSource
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import SparkEntryShared._

/** deduplication / decontamination / leakage queries (SURVEY §2.7) — one `queries` entry per SURVEY §2 item, with its
  * DuckDB oracle twin in `oracleSql`. Moved verbatim from the
  * single-file SparkEntry in round 6; SparkEntry concatenates
  * the per-family maps, so names/plans/oracles are unchanged.
  */
private[graft] object SparkEntryDedup {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.7 — deduplication family
    "q18_dedup_exact" -> ((s, dir) => Dedup.exact(t(s, dir, "documents"))),

    "q19_ngram_jaccard_pairs" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), 0.6)),

    // §2.7 — MinHash+LSH, FULL pair-set oracle (round 7): the md5-affine
    // signature family (Dedup.minhashLshPairsMd5) is engine-portable, so
    // the oracle replays the ENTIRE pipeline in SQL — md5 element hashes,
    // 64 affine minima, 16 band keys, bucket collisions, exact-Jaccard
    // verification — and the emitted pair set hash-compares directly
    // (round-6 boolean recall contract retired; the q23-hyperplane/
    // q26-Lloyd move applied to LSH). Shingle space is ppjoinJaccardPairs'
    // (distinct raw 5-grams), so q51 remains the recall ground truth —
    // that contract now lives in DedupSpec (measured 100% at
    // sf0.001/0.01/0.1), not in the benched entry, which also retires
    // the entry's by-design-quadratic truth arm (VERDICT r6 item 6).
    "q20_minhash_lsh_pairs" -> ((s, dir) =>
      Dedup.minhashLshPairsMd5(t(s, dir, "documents"), 64, 16, 0.6, 5)),

    // §2.7 — SimHash, FULL pair-set oracle (round 7): md5-derived token
    // bits (Dedup.simhashPairsMd5) make the 64-bit signature restatable
    // over DuckDB's md5 hex, and pigeonhole banding is COMPLETE for
    // hamming <= 6 — so the oracle is simply the all-pairs same-lang
    // hamming filter over SQL-recomputed signatures, no banding replay
    // needed. The round-6 recall observation (simhash surfaces
    // token-level near-dups character-trigram jaccard can't see) moves
    // to DedupSpec.
    "q21_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairsMd5(t(s, dir, "documents"), 6)),

    "q24_embedding_neardup" -> ((s, dir) =>
      Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), 0.35)),

    // §2.7 — duplicate clustering: pairs → connected components → canonical
    "q45_dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.duplicateClusters(docs, Dedup.ngramJaccardPairs(docs, 0.6))
    }),

    // §2.7/§2.9 — fuzzy (edit-distance) matching within brand blocks
    "q47_fuzzy_part_names" -> ((s, dir) =>
      TextAnalysis.fuzzyPairs(t(s, dir, "part"),
        "p_partkey", "p_name", "p_brand", 2)),

    // §2.7 — LSH band-bucket audit (round 7, born from the 100×-rung
    // finding): per band, bucket count / largest bucket / implied
    // candidate-pair volume Σ C(size,2) — prices the verify stage from
    // the signatures alone, BEFORE any pair exists. The one-aggregate
    // pre-flight a 100 TB dedup launch needs to detect a background-
    // similarity candidate floor (measured 29% of ALL pairs on this
    // templated corpus) at pilot cost. md5-affine space → full oracle.
    "q325_lsh_bucket_audit" -> ((s, dir) =>
      Dedup.lshBucketAudit(t(s, dir, "documents"), 64, 16, 5)),

    // §2.7 — triangle-grid pre-flight audit (round 10, q325's pattern
    // applied to the BLOCKED pair family): per (lang, band) block, the
    // exact pair volume, the grid width g_b the role-split will use for
    // a 32-partition deployment, the join-unit count and the replicated
    // row volume — prices the verify stage's balance and its shuffle
    // replication from ONE scan-side aggregate, before any shingle is
    // computed. Pure integer/IEEE-double arithmetic → full oracle.
    "q333_pair_grid_audit" -> ((s, dir) =>
      Dedup.pairGridAudit(t(s, dir, "documents"), 32)),

    // §2.7 — q20's SCALE-USABLE twin (round 8, VERDICT r7 item 4): same
    // md5-affine machinery, 8-row bands (64 hashes × 8 bands). The
    // background-candidate floor is n²·(j0^rows)·bands, and rows 4 → 8
    // squares the j0 term: on this corpus's j0 ≈ 0.20 template floor
    // that is 0.2⁴ ≈ 1.6e-3 → 0.2⁸ ≈ 2.6e-6 per band — the floor that
    // made q20's exact verify superlinear at the 10× rung collapses by
    // ~600× (q325's audit rows are the parameter-selection evidence;
    // run it first, pick rows from the priced candidate volume). The
    // recall trade is explicit: P(candidate | j) = 1-(1-j^8)^8 is ~99%
    // at j = 0.9 but ~13% at j = 0.6 — this is the catch-strong-dups
    // production point; q20 keeps the exact-verify full-oracle entry.
    "q328_minhash_lsh_rows8" -> ((s, dir) =>
      Dedup.minhashLshPairsMd5(t(s, dir, "documents"), 64, 8, 0.6, 5)),

    // §2.7 — q53's scale-usable twin (round 8): 8-row bands over the
    // occurrence-expanded weighted space (128 hashes × 16 bands), same
    // floor-collapse argument as q328
    "q329_weighted_lsh_rows8" -> ((s, dir) =>
      Dedup.weightedMinhashLshPairsMd5(t(s, dir, "documents"), 128, 16, 0.6, 5)),

    // §2.7 — q328 with the 2-bit-minhash candidate screen (round 9: the
    // answer to the measured sf5 wall — candidates stayed sub-linear but
    // the exact verify's ~4 KB/row array join crossed the 78 GB scratch;
    // the screen joins a 16-BYTE sketch instead and annihilates the
    // template floor ~4σ below the cut BEFORE any array moves). The
    // screen is md5-deterministic and replayed verbatim by the oracle —
    // full-hash comparable, unlike the lossy xxhash64 agree screen.
    "q331_minhash_lsh_screened" -> ((s, dir) =>
      Dedup.minhashLshPairsScreenedMd5(t(s, dir, "documents"), 64, 8, 0.6, 5, 41)),

    // §2.7 — the weighted twin of q331 (round 9): q329's banding + the
    // same 64-slot xor-family screen (sm_k derives from h1 alone, so the
    // occurrence-expanded element space plugs in unchanged)
    "q332_weighted_lsh_screened" -> ((s, dir) =>
      Dedup.weightedMinhashLshPairsScreenedMd5(t(s, dir, "documents"), 128, 16, 0.6, 5, 41)),

    // §2.7 — the composed 100 TB dedup pipeline: LSH candidates → exact
    // Jaccard verify → connected components, one operator end-to-end.
    // Oracled: the DuckDB closure over ALL exact-Jaccard pairs matches
    // because every candidate is exactly verified and LSH recall at the
    // (threshold, bands, rows) point is 1 - ~5e-8 per pair on this corpus.
    "q49_neardup_corpus" -> ((s, dir) =>
      Dedup.nearDupCorpus(t(s, dir, "documents"))),

    // §2.7 — GLOBAL exact Jaccard pairs, no blocking: prefix-filtered
    // (PPJoin/All-Pairs) inverted-index self-join
    "q51_ppjoin_pairs" -> ((s, dir) =>
      Dedup.ppjoinJaccardPairs(t(s, dir, "documents"), 0.6)),

    // §2.7 — exact term-frequency-WEIGHTED Jaccard pairs (occurrence
    // expansion + the same PPJoin machinery)
    "q52_weighted_jaccard_pairs" -> ((s, dir) =>
      Dedup.weightedJaccardPairs(t(s, dir, "documents"), 0.6)),

    // §2.7 — weighted MinHash+LSH, FULL pair-set oracle (round 7): the
    // md5-affine core over q52's occurrence-expanded space ("g#k"
    // elements — exactly the oracle's row_number convention), so the
    // oracle replays signature → bands → collisions → exact weighted
    // Jaccard and the pair set hash-compares. 128×32 banding (4-row
    // bands) as before; the q52 recall contract moves to DedupSpec,
    // retiring the entry's quadratic exact-truth arm (VERDICT r6 item 6).
    "q53_weighted_lsh_pairs" -> ((s, dir) =>
      Dedup.weightedMinhashLshPairsMd5(t(s, dir, "documents"), 128, 32, 0.6, 5)),

    // §2.7 — benchmark decontamination: the corpus split by content-hash
    // bucket into a 1/16 "eval set" (needles) vs the rest (training
    // haystack); word-trigram containment >= 0.5 flags contaminated pairs
    "q55_decontaminate" -> ((s, dir) => {
      // the fingerprint bucket is computed ONCE into a column on a
      // checkpointed frame; both split sides filter from it, so the plan
      // carries one md5 pass over the corpus instead of two full
      // fingerprint scans (VERDICT r4 item 3 — at 100 TB the second md5
      // pass was a full extra corpus read). Repartition BEFORE the
      // checkpoint: a one-file corpus otherwise pins the checkpoint — and
      // every consumer's pre-shuffle shingle pass — to a single partition
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val docs = t(s, dir, "documents")
        .repartition(parts, col("doc_id"))
        .withColumn("is_eval",
          substring(graft.functions.TextFunctions.fingerprint(col("text")), 1, 1)
            === "0")
        .localCheckpoint()
      Dedup.containmentJoin(
        docs.filter(col("is_eval")).drop("is_eval"),
        docs.filter(!col("is_eval")).drop("is_eval"), 3, 0.5)
    }),

    // §2.7 — split-leakage audit: near-dup pairs whose members landed in
    // DIFFERENT train/val/test splits (the eval-integrity check; with
    // content-hash splits only near-dups can leak — exact dups can't).
    // At scale the tiny pair frame broadcasts against the split column
    "q91_split_leakage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.ngramJaccardPairs(docs, 0.6)
        .select(col("doc_id_1"), col("doc_id_2"))
      val splits = Curation.trainValTestSplit(docs, 13, 25)
        .select(col("doc_id"), col("split"))
      pairs
        .join(splits.select(col("doc_id").as("doc_id_1"),
          col("split").as("split_1")), Seq("doc_id_1"))
        .join(splits.select(col("doc_id").as("doc_id_2"),
          col("split").as("split_2")), Seq("doc_id_2"))
        .select(col("doc_id_1"), col("doc_id_2"), col("split_1"),
          col("split_2"), (col("split_1") =!= col("split_2")).as("leaky"))
    }),

    // §2.7 — embedding near-dup blocked by IVF quantizer cells (the scale
    // path: no label/block key needed) with a FULL exact oracle (round 6
    // final): the deterministic quantizer (embeddingNearDupDet over
    // fitQuantizerDet) makes the caught-pair SET a pure function of the
    // data, and the generated oracle SQL recomputes the whole pipeline —
    // fit set, unrolled Lloyd rounds, nProbe multi-assignment, cell
    // equi-join, exact cosine threshold — so the emitted pairs hash-
    // compare directly. Recall vs all-pairs (95.4–96.5% measured at
    // nCells=8/nProbe=3, floor 0.93) stays asserted in DedupSpec.
    "q94_embedding_neardup_ivf" -> ((s, dir) =>
      Dedup.embeddingNearDupDet(t(s, dir, "embeddings"), 0.35,
        nCells = 8, nProbe = 3)),

    // §2.7 — global edit-distance join, PassJoin pigeonhole candidates:
    // q47's block-free scale path (brand blocks grow with the corpus, so
    // blocked pair counts grow quadratically — the sf1 rung measured it)
    "q97_edit_distance_pairs" -> ((s, dir) =>
      TextAnalysis.editDistancePairs(t(s, dir, "part"), "p_partkey",
        "p_name", 2)),

    // §2.7 — incremental dedup: a new delivery (doc_id % 10 == 0 stands in
    // for the arriving batch) deduped against the standing corpus without
    // ever pairing corpus×corpus — the ingest-time shape
    "q98_incremental_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.incrementalNearDup(
        corpus = docs.filter(expr("doc_id % 10 <> 0")),
        batch = docs.filter(expr("doc_id % 10 = 0")),
        threshold = 0.6)
    }),

    // §2.7 — SCREENED incremental LSH dedup (round 12, VERDICT r11 item
    // 1): q98's ingest-time bipartite shape × q331's banding + in-band
    // 2-bit screen + survivor-staged verify — the streaming gate's scale
    // arm (the exact gate is candidate-bound: 1661 rows/s at a 500k
    // novel delivery; the screen collapses candidates before any array
    // moves). Same delivery convention as q98 (doc_id % 10 = 0 stands in
    // for the arriving batch); the oracle replays signatures, bands,
    // screen and exact h1-space Jaccard over the same split
    "q335_incremental_lsh_screened" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.incrementalLshScreenedMd5(
        corpus = docs.filter(expr("doc_id % 10 <> 0")),
        batch = docs.filter(expr("doc_id % 10 = 0")),
        numHashes = 64, bands = 8, threshold = 0.6,
        shingleWidth = 5, screenCut = 41)
    }),

    // §2.7 — winnowing-fingerprint near-dup (MOSS selector): the
    // SUBSTRING-match arm of the dedup family — guaranteed detection of
    // any shared w+k-1-char run, map-side selection, inverted-index
    // pair join with the standard hot-fingerprint cut
    "q116_winnow_pairs" -> ((s, dir) =>
      Dedup.winnowPairs(t(s, dir, "documents"), 16, 16, 4L, 32L)),

    // §2.7 — duplicate-cluster size distribution: how big do near-dup
    // clusters get — the skew audit for the dedup pipeline itself (a
    // single mega-cluster means the threshold, not the corpus, is the
    // problem). Two aggregate steps over the q45 component output; the
    // oracle recomputes components via its recursive-CTE twin
    "q141_cluster_sizes" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.duplicateClusters(docs, Dedup.ngramJaccardPairs(docs, 0.6))
        .groupBy(col("component"))
        .agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
    }),

    // §2.7 — exact substring-duplication spans (the Lee et al. span-level
    // dedup signal): suffix-array semantics reformulated as a shingle
    // multiplicity count + per-doc island merge — scan-shaped, no pair join
    "q142_dup_substrings" -> ((s, dir) =>
      Dedup.dupSubstringSpans(t(s, dir, "documents"), 40)),

    // §2.7/§2.9 — cross-source shingle containment matrix (the corpus
    // provenance-overlap audit before mixing sources): distinct
    // (source, 3-gram) pairs self-join on the shingle — per-key fan-out
    // bounded by |sources| after the distinct, so the pair stage is
    // |shingle vocab|·|sources|², never doc-pairs; totals re-attach by
    // broadcast
    "q150_source_overlap" -> ((s, dir) => {
      import graft.functions.TextFunctions.shingles3
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val ss = t(s, dir, "documents")
        // repartition before the shingle explode (round 13): the sf0.1
        // documents parquet is ONE 4 MB-class scan split, so the whole
        // char-3-gram explode ran single-task inside the scan stage —
        // the q142 scan-serialization finding, same fix
        .select(col("doc_id"), col("source"), col("text"))
        .repartition(parts, col("doc_id"))
        .select(col("source"), explode(shingles3(col("text"))).as("s"))
        .distinct()
        .localCheckpoint() // feeds per-source totals AND the pair join
      val tot = ss.groupBy(col("source")).agg(count(lit(1)).as("n_distinct"))
      ss.select(col("source").as("src_a"), col("s"))
        .join(ss.select(col("source").as("src_b"), col("s")), Seq("s"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(broadcast(tot.select(col("source").as("src_a"),
          col("n_distinct").as("n_a"))), Seq("src_a"))
        .join(broadcast(tot.select(col("source").as("src_b"),
          col("n_distinct").as("n_b"))), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("n_shared"),
          col("n_a"), col("n_b"),
          expr("CAST((1000 * n_shared) div n_a AS BIGINT)")
            .as("cont_a_permille"),
          expr("CAST((1000 * n_shared) div n_b AS BIGINT)")
            .as("cont_b_permille"))
    }),

    // §2.7 — phonetic candidate pairs (round 5): Soundex blocking over the
    // corpus token VOCABULARY (documents ∪ part names — the combined name
    // space, chosen so the blocks genuinely carry pairs on this datagen) —
    // the classic entity-resolution blocking key for names that
    // edit-distance blocking misses (sound-alike, spelled-different);
    // pairing runs on DISTINCT tokens (vocabulary scale, not row scale)
    // within equal-soundex blocks, so the pair stage is bounded by block
    // sizes over a domain-bounded vocabulary.
    // Spark side is the codegen'd soundex() builtin; the oracle
    // re-implements the classic algorithm (H/W silent — same-code
    // letters separated only by H/W collapse; vowels reset) from scratch
    // in SQL, so the builtin's semantics are independently checked
    "q207_phonetic_pairs" -> ((s, dir) => {
      val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
      val toks = t(s, dir, "documents")
        // repartition before the token explode + regex filter (round 13):
        // single-split scan stage, the q142/q150 scan-serialization fix
        .select(col("doc_id"), col("text"))
        .repartition(parts, col("doc_id"))
        .select(explode(split(lower(col("text")), " ")).as("tok"))
        .union(t(s, dir, "part")
          .select(explode(split(col("p_name"), " ")).as("tok")))
        .filter(col("tok").rlike("^[a-z]+$"))
        .distinct()
        .withColumn("sdx", soundex(col("tok")))
      toks.as("a").join(toks.as("b"),
          col("a.sdx") === col("b.sdx") && col("a.tok") < col("b.tok"))
        .select(col("a.sdx").as("sdx"), col("a.tok").as("tok_a"),
          col("b.tok").as("tok_b"))
    }),

    // §2.7 — SemDeDup (round 5): semantic dedup by within-cluster cosine —
    // paraphrase/re-encoding duplicates that exact and MinHash dedup can't
    // see; deterministic hash-sample cells (q205's codebook convention) so
    // the whole decision table is DuckDB-oracle-able, keep-min-id rule,
    // cosine micro-rounded once before the threshold compare; ONE
    // cell-key shuffle feeds both pair sides, cluster count is the
    // published scale knob (cell size stays bounded as the corpus grows)
    // §2.7 — soft-dedup sampling weights (round 6 late): instead of
    // DROPPING duplicates, weight every document by 1/cluster_size so a
    // sampler draws each duplicate CLUSTER with equal mass — the
    // repetition-aware reweighting used when hard dedup would lose
    // paraphrase diversity; composes q45's connected components with one
    // component-keyed count window, exact integer ppm
    "q324_soft_dedup_weights" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      Dedup.duplicateClusters(docs, Dedup.ngramJaccardPairs(docs, 0.6))
        .withColumn("cluster_size", count(lit(1))
          .over(Window.partitionBy(col("component"))).cast("long"))
        .select(col("doc_id"), col("component"), col("cluster_size"),
          expr("1000000 div cluster_size").as("weight_ppm"))
    }),

    // §2.7 — SEMANTIC decontamination (round 6 late): train vectors whose
    // embedding cosine to ANY eval vector reaches 0.35 — the paraphrase/
    // re-encoding eval-leakage q55's n-gram containment cannot see. The
    // eval split is the vec_id % 16 content-hash-style bucket; cells are
    // eval-anchored detCentroids, so the whole pipeline is a pure
    // function of the data and the oracle replays it end-to-end
    "q321_semantic_decontaminate" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.semanticDecontaminate(
        train = emb.filter(expr("vec_id % 16 <> 0")),
        eval = emb.filter(expr("vec_id % 16 = 0")),
        nCells = 16, threshMicro = 350000L)
    }),

    "q208_semdedup" -> ((s, dir) =>
      Similarity.semDedup(t(s, dir, "embeddings"), nCells = 16,
        threshMicro = 350000L)),

    // §2.7 — leakage-safe train/test split (round 5): near-dup CLUSTERS
    // are the split unit, never documents — the eval-contamination
    // guard rail (a doc and its paraphrase must land on the same side;
    // q55 decontaminates against an external eval set, this prevents
    // manufacturing the leak in the first place). Split is a pure
    // function of the component id's md5 (first hex char ≤ 'b' → train,
    // 12/16 = 75%), so the no-straddle invariant holds by construction
    // and the whole assignment is oracle-able on top of q45's closure
    "q212_leakage_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.duplicateClusters(docs, Dedup.ngramJaccardPairs(docs, 0.6))
        .select(col("doc_id"), col("component"),
          when(substring(md5(col("component").cast("string")), 1, 1)
            <= "b", "train").otherwise("test").as("split"))
    }),

    // §2.7 — entity resolution by RECIPROCAL best match (round 5: the
    // one-to-one assignment step the pair-generating dedup family stops
    // short of — two "catalogs" (even / odd partkeys), candidates from a
    // (first-letter, type-noun) block + Levenshtein ≤ 3, and a pair
    // survives only if each side is the other's rank-1 candidate under
    // (distance ASC, key ASC). Two windows over the blocked candidate
    // frame — the deterministic greedy core of record linkage; blocking
    // keeps the candidate volume Σ|block|², never |catalog|² — the
    // type-noun alone left blocks of |catalog|/5 (13.7 s at sf0.1, and
    // quadratic growth at scale); adding the adjective's first letter
    // cuts each block ~20x, the standard multi-attribute blocking move
    "q251_reciprocal_match" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val p = t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"),
          concat_ws("|", substring(col("p_name"), 1, 1),
            substring_index(col("p_name"), " ", -1)).as("blk"))
      val a = p.filter(col("p_partkey") % 2 === 0)
        .select(col("blk"), col("p_partkey").as("a_key"),
          col("p_name").as("a_name"))
      val b = p.filter(col("p_partkey") % 2 === 1)
        .select(col("blk"), col("p_partkey").as("b_key"),
          col("p_name").as("b_name"))
      val cand = a.join(b, Seq("blk"))
        .withColumn("lev", levenshtein(col("a_name"), col("b_name")))
        .filter(col("lev") <= 3)
      val wa = Window.partitionBy(col("a_key"))
        .orderBy(col("lev").asc, col("b_key").asc)
      val wb = Window.partitionBy(col("b_key"))
        .orderBy(col("lev").asc, col("a_key").asc)
      cand.withColumn("ra", row_number().over(wa))
        .withColumn("rb", row_number().over(wb))
        .filter(col("ra") === 1 && col("rb") === 1)
        .select(col("a_key"), col("b_key"), col("lev"))
    }),

    // §2.7 — text-vs-semantic dedup disagreement audit (round 5: the
    // two dedup families measured against each other on the id-aligned
    // corpus — pairs flagged by exact character-shingle Jaccard (q19's
    // engine), by within-cell embedding cosine (q208's pair stage), or
    // by BOTH. sem_only is what SemDeDup adds over surface dedup
    // (paraphrases, re-encodings); text_only is what embedding recall
    // misses — the calibration every curation stack needs before
    // trusting either signal alone. Both pair engines stay blocked
    // (lang×length band / quantizer cell); the reconciliation is a
    // narrow full-outer on the (a, b) key
    "q229_dedup_disagreement" -> ((s, dir) => {
      val txt = graft.operators.Dedup
        .ngramJaccardPairs(t(s, dir, "documents"), 0.6)
        .select(col("doc_id_1").as("a"), col("doc_id_2").as("b"),
          lit(true).as("text_dup"))
      val sem = graft.operators.Similarity
        .semDupPairs(t(s, dir, "embeddings"), nCells = 16,
          threshMicro = 350000L)
        .select(col("a"), col("b"), lit(true).as("sem_dup"))
      txt.join(sem, Seq("a", "b"), "full_outer")
        .select(when(col("text_dup") && col("sem_dup"), "both")
          .when(col("text_dup"), "text_only")
          .otherwise("sem_only").as("signal"))
        .groupBy(col("signal"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // §2.7 — cross-fold near-dup leakage report (round 5): q213's
    // deterministic k-fold splitter is doc-hash random, so near-dup
    // pairs straddle folds — exactly the leakage q212's cluster-level
    // split exists to prevent. This query QUANTIFIES it: near-dup pairs
    // (q45's edge set) bucketed by their (fold_a, fold_b) cell, diagonal
    // = safe, off-diagonal = eval contamination; the pair engine is the
    // audited blocked-jaccard join, fold tags attach by two narrow
    // doc_id joins
    "q217_fold_leakage" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      val folds = docs.select(col("lang"), col("doc_id"))
        .withColumn("fold", (row_number().over(w).cast("long") - 1) % 5)
        .select(col("doc_id"), col("fold"))
      val pairs = Dedup.ngramJaccardPairs(docs, 0.6)
        .select(col("doc_id_1"), col("doc_id_2"))
      pairs
        .join(folds.withColumnRenamed("doc_id", "doc_id_1")
          .withColumnRenamed("fold", "fold_1"), Seq("doc_id_1"))
        .join(folds.withColumnRenamed("doc_id", "doc_id_2")
          .withColumnRenamed("fold", "fold_2"), Seq("doc_id_2"))
        .select(least(col("fold_1"), col("fold_2")).as("fold_a"),
          greatest(col("fold_1"), col("fold_2")).as("fold_b"))
        .groupBy(col("fold_a"), col("fold_b"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // §2.7 — structural (paragraph-level) near-dup pairs (round 5): doc
    // pairs whose distinct-SEGMENT sets overlap by Jaccard ≥ 0.25 —
    // catches permuted/partially-copied docs whose char-shingle profiles
    // diverge; inverted-index join on the segment with a df cap (q116's
    // contract) so corpus chrome never fans out quadratically
    "q197_segment_jaccard_docs" -> ((s, dir) =>
      Curation.segmentJaccardDocs(t(s, dir, "documents"),
        segTokens = 10, dfCap = 100, threshMicro = 250000L)),
  )

  // ---- round 7: md5-affine LSH oracle machinery (q20/q21/q53) ----

  /** DuckDB SQL for the integer value of `len` hex chars of expression
    * `hx` starting at 1-based `start` — the twin of Spark's
    * `conv(substr(hx, start, len), 16, 10)` (DuckDB has no hex-parse
    * function, so the value is assembled digit-arithmetically).
    */
  private def hexValSql(hx: String, start: Int, len: Int): String = {
    val terms = (0 until len).map { j =>
      val pow = (0 until (len - 1 - j)).foldLeft(1L)((a, _) => a * 16L)
      s"(strpos('0123456789abcdef', substr($hx, ${start + j}, 1)) - 1) * $pow"
    }
    terms.mkString("(", " + ", ")")
  }

  /** Generates the full replay of [[Dedup.md5AffineLshPairs]] in DuckDB
    * SQL over an element CTE body `elCte` defining el(doc_id, e): md5
    * h1/h2, the `numHashes` affine minima, per-band key strings, bucket
    * collisions (with the lossless size-ratio prune), DISTINCT pairs,
    * exact-Jaccard verification in the SAME distinct-h1 space the Spark
    * operator verifies in (sorted-set intersection of 60-bit hashes — an
    * h1 collision changes both engines identically, so the compare is
    * exact by construction). Every constant is shared with the Spark
    * operator, so the two sides cannot drift independently.
    */
  private def md5LshOracleSql(elCte: String, numHashes: Int, bands: Int,
                              threshold: Double, simName: String,
                              screenCut: Int = 0): String = {
    val rows = numHashes / bands
    val p = Dedup.AffineP
    val mins = (0 until numHashes).map(k =>
      s"         min((h1 + $k*h2) % $p) AS m$k").mkString(",\n") +
      // the screen's xor-family minima (see Dedup.screenConst: the
      // h1-dominated banding minima are correlated across k and cannot
      // feed a b-bit screen); each literal IS screenConst(k) — both
      // engines derive from the one Scala function
      (if (screenCut == 0) ""
       else (0 until 64).map(k =>
         s"         min(xor(h1, ${Dedup.screenConst(k)})) AS sm$k")
         .mkString(",\n", ",\n", ""))
    val keys = (0 until bands).map { b =>
      val ks = (0 until rows).map(r => s"CAST(m${b * rows + r} AS VARCHAR)")
        .mkString(" || ':' || ")
      s"         $ks AS k$b"
    }.mkString(",\n")
    val candUnion = (0 until bands).map { b =>
      s"""    SELECT a.doc_id AS d1, b.doc_id AS d2 FROM keys a JOIN keys b
         |      ON a.k$b = b.k$b AND a.doc_id < b.doc_id
         |         AND a.n * $threshold <= b.n AND b.n * $threshold <= a.n""".stripMargin
    }.mkString("\n    UNION ALL\n")
    s"""WITH el AS (
       |$elCte),
       |hx AS (SELECT doc_id, e, md5(e) AS hx FROM el),
       |hv AS (
       |  SELECT doc_id,
       |         ${hexValSql("hx", 1, 15)} AS h1,
       |         ${hexValSql("hx", 16, 13)} AS h2
       |  FROM hx),
       |sig AS (
       |  SELECT doc_id,
       |         list_sort(list(DISTINCT h1)) AS hs,
       |         CAST(count(DISTINCT h1) AS BIGINT) AS n,
       |$mins
       |  FROM hv GROUP BY doc_id),
       |keys AS (
       |  SELECT doc_id, n,
       |$keys
       |  FROM sig),
       |cand AS (
       |  SELECT DISTINCT d1, d2 FROM (
       |$candUnion
       |  ))
       |SELECT doc_id_1, doc_id_2, $simName FROM (
       |  SELECT c.d1 AS doc_id_1, c.d2 AS doc_id_2,
       |         CAST(len(list_intersect(na.hs, nb.hs)) AS DOUBLE)
       |           / (na.n + nb.n - len(list_intersect(na.hs, nb.hs))) AS $simName
       |  FROM cand c
       |  JOIN sig na ON na.doc_id = c.d1
       |  JOIN sig nb ON nb.doc_id = c.d2${screenSql(screenCut)})
       |WHERE $simName >= $threshold""".stripMargin
  }

  /** The BIPARTITE (incremental) twin of [[md5LshOracleSql]]: replays
    * [[Dedup.incrementalLshScreenedMd5]] in DuckDB over an element CTE
    * `elCte` covering ALL documents and a boolean `isBatchSql` over
    * doc_id that names the arriving delivery. Signatures are content
    * functions, so one sig CTE serves both roles; the band join then
    * requires the left side in the batch and orders only batch×batch
    * pairs — exactly the operator's join condition. The screen clause
    * and the exact h1-space verify are verbatim [[md5LshOracleSql]]'s.
    */
  private def md5LshIncrOracleSql(elCte: String, isBatchSql: String,
                                  numHashes: Int, bands: Int,
                                  threshold: Double,
                                  screenCut: Int): String = {
    val rows = numHashes / bands
    val p = Dedup.AffineP
    val mins = (0 until numHashes).map(k =>
      s"         min((h1 + $k*h2) % $p) AS m$k").mkString(",\n") +
      (0 until 64).map(k =>
        s"         min(xor(h1, ${Dedup.screenConst(k)})) AS sm$k")
        .mkString(",\n", ",\n", "")
    val keys = (0 until bands).map { b =>
      val ks = (0 until rows).map(r => s"CAST(m${b * rows + r} AS VARCHAR)")
        .mkString(" || ':' || ")
      s"         $ks AS k$b"
    }.mkString(",\n")
    val candUnion = (0 until bands).map { b =>
      s"""    SELECT a.doc_id AS d1, b.doc_id AS d2,
         |           CASE WHEN b.is_batch THEN 'batch' ELSE 'corpus' END AS dup_source
         |    FROM keys a JOIN keys b
         |      ON a.k$b = b.k$b AND a.is_batch
         |         AND (NOT b.is_batch OR a.doc_id < b.doc_id)
         |         AND a.n * $threshold <= b.n AND b.n * $threshold <= a.n""".stripMargin
    }.mkString("\n    UNION ALL\n")
    s"""WITH el AS (
       |$elCte),
       |hx AS (SELECT doc_id, e, md5(e) AS hx FROM el),
       |hv AS (
       |  SELECT doc_id,
       |         ${hexValSql("hx", 1, 15)} AS h1,
       |         ${hexValSql("hx", 16, 13)} AS h2
       |  FROM hx),
       |sig AS (
       |  SELECT doc_id,
       |         list_sort(list(DISTINCT h1)) AS hs,
       |         CAST(count(DISTINCT h1) AS BIGINT) AS n,
       |$mins
       |  FROM hv GROUP BY doc_id),
       |keys AS (
       |  SELECT doc_id, ($isBatchSql) AS is_batch, n,
       |$keys
       |  FROM sig),
       |cand AS (
       |  SELECT DISTINCT d1, d2, dup_source FROM (
       |$candUnion
       |  ))
       |SELECT new_id, dup_id, dup_source, jaccard FROM (
       |  SELECT c.d1 AS new_id, c.d2 AS dup_id, c.dup_source,
       |         CAST(len(list_intersect(na.hs, nb.hs)) AS DOUBLE)
       |           / (na.n + nb.n - len(list_intersect(na.hs, nb.hs))) AS jaccard
       |  FROM cand c
       |  JOIN sig na ON na.doc_id = c.d1
       |  JOIN sig nb ON nb.doc_id = c.d2${screenSql(screenCut)})
       |WHERE jaccard >= $threshold""".stripMargin
  }

  /** The 2-bit-minhash screen clause of [[Dedup.minhashLshPairsScreenedMd5]]:
    * slot k matches iff sm_k % 4 (the XOR-family screen minimum, added to
    * the sig CTE when screenCut > 0) agrees on both docs. The Spark side
    * packs these bits into two longs for shuffle width; the COUNT is the
    * semantics and is engine-identical. Empty when screenCut == 0.
    * The screen width is FIXED at 64 xor-family slots (two packed longs on
    * the Spark side) regardless of the banding's numHashes — it draws from
    * an independent hash family, so its width is a screen-precision knob,
    * not a function of the banding geometry.
    */
  private def screenSql(screenCut: Int): String =
    if (screenCut == 0) ""
    else {
      val terms = (0 until 64).map(k =>
        s"CASE WHEN na.sm$k % 4 = nb.sm$k % 4 THEN 1 ELSE 0 END")
        .grouped(4).map(_.mkString(" + ")).mkString("\n         + ")
      s"\n  WHERE $terms >= $screenCut"
    }

  /** Generates the DuckDB replay of [[Dedup.lshBucketAudit]]: the same
    * md5-affine signature CTEs as [[md5LshOracleSql]], finished by the
    * per-band bucket-size aggregate instead of the pair join.
    */
  private def lshBucketAuditOracleSql(elCte: String, numHashes: Int,
                                      bands: Int): String = {
    val rows = numHashes / bands
    val p = Dedup.AffineP
    val mins = (0 until numHashes).map(k =>
      s"         min((h1 + $k*h2) % $p) AS m$k").mkString(",\n")
    val keys = (0 until bands).map { b =>
      val ks = (0 until rows).map(r => s"CAST(m${b * rows + r} AS VARCHAR)")
        .mkString(" || ':' || ")
      s"         $ks AS k$b"
    }.mkString(",\n")
    val bandRows = (0 until bands).map(b =>
      s"    SELECT $b AS band, k$b AS key FROM keys").mkString("\n    UNION ALL\n")
    s"""WITH el AS (
       |$elCte),
       |hx AS (SELECT doc_id, e, md5(e) AS hx FROM el),
       |hv AS (
       |  SELECT doc_id,
       |         ${hexValSql("hx", 1, 15)} AS h1,
       |         ${hexValSql("hx", 16, 13)} AS h2
       |  FROM hx),
       |sig AS (
       |  SELECT doc_id,
       |$mins
       |  FROM hv GROUP BY doc_id),
       |keys AS (
       |  SELECT doc_id,
       |$keys
       |  FROM sig),
       |bandrows AS (
       |$bandRows),
       |buckets AS (
       |  SELECT band, key, CAST(count(*) AS BIGINT) AS sz
       |  FROM bandrows GROUP BY 1, 2)
       |SELECT CAST(band AS BIGINT) AS band,
       |       CAST(count(*) AS BIGINT) AS n_buckets,
       |       max(sz) AS max_bucket,
       |       CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS candidate_pairs,
       |       CAST(sum(sz) AS BIGINT) AS n_docs
       |FROM buckets GROUP BY 1""".stripMargin
  }

  /** Generates the DuckDB replay of [[Dedup.simhashPairsMd5]]: md5 token
    * bits (bit j of the 64-bit signature = bit (j mod 4) of hex digit
    * 16 - j/4), per-doc ±1 bit sums, sign-packed signature, then the
    * all-pairs same-lang hamming filter — complete because the Spark
    * side's pigeonhole banding is lossless for hamming <= maxHamming.
    */
  private def simhashMd5OracleSql(maxHamming: Int): String = {
    val sums = (0 until 64).map { j =>
      val pos = 16 - j / 4
      val shift = j % 4
      s"         sum(((strpos('0123456789abcdef', substr(hx, $pos, 1)) - 1) >> $shift) & 1) AS s$j"
    }.mkString(",\n")
    val packed = (0 until 64).map { j =>
      val m = if (j == 63) "(-9223372036854775807 - 1)" else (1L << j).toString
      s"(CASE WHEN 2*s.s$j - s.nt > 0 THEN CAST($m AS BIGINT) ELSE 0 END)"
    }.grouped(4).map(_.mkString(" + ")).mkString("\n           + ")
    s"""WITH tok AS (
       |  SELECT doc_id,
       |         unnest(list_filter(string_split(text, ' '), x -> x != '')) AS t
       |  FROM documents),
       |th AS (SELECT doc_id, md5(t) AS hx FROM tok),
       |sums AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS nt,
       |$sums
       |  FROM th GROUP BY doc_id),
       |sh AS (
       |  SELECT d.doc_id, d.lang,
       |         CASE WHEN d.text IS NULL THEN NULL
       |              ELSE CAST($packed AS BIGINT) END AS sh
       |  FROM documents d LEFT JOIN sums s ON d.doc_id = s.doc_id)
       |SELECT doc_id_1, doc_id_2, hamming FROM (
       |  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
       |         CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
       |  FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id)
       |WHERE hamming <= $maxHamming""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(

    "q18_dedup_exact" ->
      s"""SELECT fp, min(doc_id) AS doc_id, count(*) AS n_copies
         |FROM (SELECT doc_id, md5($NormSql) AS fp FROM documents)
         |GROUP BY 1""".stripMargin,

    "q19_ngram_jaccard_pairs" ->
      s"""WITH sh AS (
         |  SELECT doc_id, lang, floor(n_chars / 50) AS band, $ShinglesSql AS s
         |  FROM documents)
         |SELECT * FROM (
         |  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         |         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |           / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
         |  FROM sh a JOIN sh b
         |    ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id)
         |WHERE jaccard >= 0.6""".stripMargin,

    // FULL pair-set oracle (round 7): the complete md5-affine LSH replay
    // over ppjoin's distinct raw 5-gram space
    "q20_minhash_lsh_pairs" -> md5LshOracleSql(
      """  SELECT doc_id, unnest(list_distinct([substr(text, CAST(x AS INT), 5)
        |    for x in range(1, CAST(length(text) AS BIGINT) - 3)])) AS e
        |  FROM documents""".stripMargin,
      numHashes = 64, bands = 16, threshold = 0.6, simName = "jaccard"),

    // FULL pair-set oracle (round 7): md5-bit simhash + all-pairs hamming
    "q21_simhash_pairs" -> simhashMd5OracleSql(maxHamming = 6),

    // full oracle (round 7): replay the md5-affine signatures and count
    // band-bucket sizes — same hv/sig/keys machinery as q20's oracle,
    // finishing in the bucket aggregate instead of the pair join
    // the grid audit replays the operator's cap arithmetic verbatim:
    // exact BIGINT pair volumes; the cap and g_b go through the same
    // IEEE double sqrt/ceil (both engines' sqrt is correctly rounded,
    // and every intermediate here is an exact integer in double range)
    "q333_pair_grid_audit" ->
      s"""WITH blocks AS (
         |  SELECT lang, CAST(floor(n_chars / 50) AS BIGINT) AS band,
         |         count(*) AS n_docs
         |  FROM documents
         |  WHERE length(coalesce(text, '')) >= 3
         |  GROUP BY 1, 2),
         |tot AS (
         |  SELECT coalesce(sum(n_docs * (n_docs - 1) / 2), 0) AS total_vol
         |  FROM blocks),
         |grid AS (
         |  SELECT lang, band, n_docs,
         |         GREATEST(1, CAST(ceil(n_docs / sqrt(GREATEST(262144.0,
         |           total_vol / 256))) AS BIGINT)) AS g_b
         |  FROM blocks, tot)
         |SELECT lang, band, n_docs,
         |       n_docs * (n_docs - 1) // 2 AS pair_vol,
         |       g_b,
         |       g_b * (g_b + 1) // 2 AS n_units,
         |       n_docs * (g_b + 1) AS repl_rows
         |FROM grid""".stripMargin,

    "q325_lsh_bucket_audit" -> lshBucketAuditOracleSql(
      """  SELECT doc_id, unnest(list_distinct([substr(text, CAST(x AS INT), 5)
        |    for x in range(1, CAST(length(text) AS BIGINT) - 3)])) AS e
        |  FROM documents""".stripMargin,
      numHashes = 64, bands = 16),

    // FULL pair-set oracle (round 7): the md5-affine LSH replay over
    // q52's occurrence-expanded normalized 5-gram space (the "g#k"
    // row_number convention — tag order within a (doc, gram) group is
    // irrelevant, any order yields the same element set)
    "q53_weighted_lsh_pairs" -> md5LshOracleSql(
      s"""  SELECT doc_id,
         |         g || '#' || CAST(row_number() OVER (PARTITION BY doc_id, g)
         |                          AS VARCHAR) AS e
         |  FROM (
         |    SELECT doc_id, unnest([substr(ntext, CAST(x AS INT), 5)
         |      for x in range(1, CAST(length(ntext) AS BIGINT) - 3)]) AS g
         |    FROM (SELECT doc_id, $NormSql AS ntext FROM documents))""".stripMargin,
      numHashes = 128, bands = 32, threshold = 0.6, simName = "wjaccard"),

    // round 8: the rows=8 scale twins — identical generators, only the
    // banding point moves (64×8 and 128×16), so Spark and oracle share
    // every constant by construction
    "q328_minhash_lsh_rows8" -> md5LshOracleSql(
      """  SELECT doc_id, unnest(list_distinct([substr(text, CAST(x AS INT), 5)
        |    for x in range(1, CAST(length(text) AS BIGINT) - 3)])) AS e
        |  FROM documents""".stripMargin,
      numHashes = 64, bands = 8, threshold = 0.6, simName = "jaccard"),

    "q329_weighted_lsh_rows8" -> md5LshOracleSql(
      s"""  SELECT doc_id,
         |         g || '#' || CAST(row_number() OVER (PARTITION BY doc_id, g)
         |                          AS VARCHAR) AS e
         |  FROM (
         |    SELECT doc_id, unnest([substr(ntext, CAST(x AS INT), 5)
         |      for x in range(1, CAST(length(ntext) AS BIGINT) - 3)]) AS g
         |    FROM (SELECT doc_id, $NormSql AS ntext FROM documents))""".stripMargin,
      numHashes = 128, bands = 16, threshold = 0.6, simName = "wjaccard"),

    // q328's oracle + the engine-identical 2-bit screen clause (the
    // screened twin's emitted set is by definition the screened subset)
    "q331_minhash_lsh_screened" -> md5LshOracleSql(
      """  SELECT doc_id, unnest(list_distinct([substr(text, CAST(x AS INT), 5)
        |    for x in range(1, CAST(length(text) AS BIGINT) - 3)])) AS e
        |  FROM documents""".stripMargin,
      numHashes = 64, bands = 8, threshold = 0.6, simName = "jaccard",
      screenCut = 41),

    // q331's banding/screen constants over q98's delivery split: the
    // bipartite generator replays signature → bands → screened
    // batch-vs-target collisions → exact verify (round 12)
    "q335_incremental_lsh_screened" -> md5LshIncrOracleSql(
      """  SELECT doc_id, unnest(list_distinct([substr(text, CAST(x AS INT), 5)
        |    for x in range(1, CAST(length(text) AS BIGINT) - 3)])) AS e
        |  FROM documents""".stripMargin,
      isBatchSql = "doc_id % 10 = 0",
      numHashes = 64, bands = 8, threshold = 0.6, screenCut = 41),

    // q329's oracle + the same 64-slot screen clause
    "q332_weighted_lsh_screened" -> md5LshOracleSql(
      s"""  SELECT doc_id,
         |         g || '#' || CAST(row_number() OVER (PARTITION BY doc_id, g)
         |                          AS VARCHAR) AS e
         |  FROM (
         |    SELECT doc_id, unnest([substr(ntext, CAST(x AS INT), 5)
         |      for x in range(1, CAST(length(ntext) AS BIGINT) - 3)]) AS g
         |    FROM (SELECT doc_id, $NormSql AS ntext FROM documents))""".stripMargin,
      numHashes = 128, bands = 16, threshold = 0.6, simName = "wjaccard",
      screenCut = 41),

    "q24_embedding_neardup" ->
      s"""$EmbCte
         |SELECT * FROM (
         |  SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
         |         ${cosSql("a.embedding", "b.embedding", "a.nrm", "b.nrm")} AS cos_sim
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         |WHERE cos_sim >= 0.35""".stripMargin,

    // transitive closure over the (undirected) near-dup pair graph; the
    // component id is the min reachable doc_id
    "q45_dedup_clusters" ->
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, lang, floor(n_chars / 50) AS band, $ShinglesSql AS s
         |  FROM documents),
         |edges AS (
         |  SELECT doc_id_1 AS a, doc_id_2 AS b FROM (
         |    SELECT x.doc_id AS doc_id_1, y.doc_id AS doc_id_2,
         |           CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
         |             / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
         |    FROM sh x JOIN sh y
         |      ON x.lang = y.lang AND x.band = y.band AND x.doc_id < y.doc_id)
         |  WHERE jaccard >= 0.6),
         |und AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
         |reach(src, dst) AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a),
         |comp AS (SELECT src AS doc_id, min(dst) AS min_reach
         |         FROM reach GROUP BY 1)
         |SELECT d.doc_id,
         |       least(d.doc_id, coalesce(c.min_reach, d.doc_id)) AS component,
         |       d.doc_id = least(d.doc_id, coalesce(c.min_reach, d.doc_id)) AS is_canonical
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id""".stripMargin,

    "q47_fuzzy_part_names" ->
      """SELECT a.p_partkey AS id_1, b.p_partkey AS id_2,
        |       levenshtein(a.p_name, b.p_name) AS distance
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin,

    // the composed pipeline: the oracle closures over ALL normalized-text
    // jaccard >= 0.8 pairs (no blocking) — the Spark side's LSH candidates
    // are exactly verified, so the sets agree whenever LSH recall is total
    "q49_neardup_corpus" ->
      s"""WITH RECURSIVE nd AS (
         |  SELECT doc_id, $NormSql AS text FROM documents),
         |sh AS (SELECT doc_id, $ShinglesSql AS s FROM nd),
         |edges AS (
         |  SELECT doc_id_1 AS a, doc_id_2 AS b FROM (
         |    SELECT x.doc_id AS doc_id_1, y.doc_id AS doc_id_2,
         |           CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
         |             / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
         |    FROM sh x JOIN sh y ON x.doc_id < y.doc_id)
         |  WHERE jaccard >= 0.8),
         |und AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
         |reach(src, dst) AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a),
         |comp AS (SELECT src AS doc_id, min(dst) AS min_reach
         |         FROM reach GROUP BY 1)
         |SELECT d.doc_id,
         |       least(d.doc_id, coalesce(c.min_reach, d.doc_id)) AS component,
         |       d.doc_id = least(d.doc_id, coalesce(c.min_reach, d.doc_id)) AS is_canonical
         |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id""".stripMargin,

    // global exact jaccard (5-gram shingles, the operator default) — the
    // filters on the Spark side (prefix, positional, length) are lossless,
    // so the oracle is plain all-pairs
    "q51_ppjoin_pairs" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |         list_distinct([substr(text, CAST(x AS INT), 5)
         |           for x in range(1, CAST(length(text) AS BIGINT) - 3)]) AS s
         |  FROM documents)
         |SELECT * FROM (
         |  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         |         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |           / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |WHERE jaccard >= 0.6""".stripMargin,

    // weighted jaccard Σmin/Σmax over trigram term frequencies == set
    // jaccard of occurrence-expanded multisets: tag the k-th occurrence of
    // each gram (the tag ORDER within a (doc, gram) group is irrelevant —
    // any order yields the same {g#1..g#tf} set, so row_number needs no
    // ORDER BY) and intersect the expanded string sets
    "q52_weighted_jaccard_pairs" ->
      s"""WITH nrm AS (
         |  SELECT doc_id, $NormSql AS ntext FROM documents),
         |m AS (
         |  SELECT doc_id,
         |         [substr(ntext, CAST(x AS INT), 5)
         |          for x in range(1, CAST(length(ntext) AS BIGINT) - 3)] AS s
         |  FROM nrm),
         |ex AS (SELECT doc_id, unnest(s) AS g FROM m),
         |occ AS (
         |  SELECT doc_id,
         |         g || '#' || CAST(row_number() OVER (PARTITION BY doc_id, g)
         |                          AS VARCHAR) AS e
         |  FROM ex),
         |sh AS (SELECT doc_id, list(e) AS s FROM occ GROUP BY doc_id)
         |SELECT * FROM (
         |  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         |         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |           / len(list_distinct(list_concat(a.s, b.s))) AS wjaccard
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |WHERE wjaccard >= 0.6""".stripMargin,

    "q55_decontaminate" ->
      s"""WITH nrm AS (
         |  SELECT doc_id, $NormSql AS ntext, md5($NormSql) AS fp
         |  FROM documents),
         |tok AS (
         |  SELECT doc_id, fp,
         |         list_filter(string_split(ntext, ' '), x -> x != '') AS tk
         |  FROM nrm),
         |gr AS (
         |  SELECT doc_id, fp,
         |         CASE WHEN len(tk) >= 3 THEN list_distinct(
         |           [array_to_string(tk[i:i+2], ' ')
         |            for i in range(1, CAST(len(tk) AS BIGINT) - 1)])
         |         ELSE [] END AS gs
         |  FROM tok),
         |ng AS (SELECT doc_id AS needle_id, unnest(gs) AS g FROM gr
         |       WHERE fp LIKE '0%'),
         |ns AS (SELECT needle_id, CAST(count(*) AS BIGINT) AS n_grams
         |       FROM ng GROUP BY 1),
         |hg AS (SELECT doc_id AS hay_id, unnest(gs) AS g FROM gr
         |       WHERE fp NOT LIKE '0%'),
         |m AS (SELECT needle_id, hay_id, CAST(count(*) AS BIGINT) AS matches
         |      FROM ng JOIN hg USING (g) GROUP BY 1, 2)
         |SELECT needle_id, hay_id,
         |       CAST(matches AS DOUBLE) / n_grams AS containment
         |FROM m JOIN ns USING (needle_id)
         |WHERE CAST(matches AS DOUBLE) / n_grams >= 0.5""".stripMargin,

    "q91_split_leakage" ->
      s"""WITH sh AS (
         |  SELECT doc_id, lang, floor(n_chars / 50) AS band, $ShinglesSql AS s
         |  FROM documents),
         |pairs AS (
         |  SELECT doc_id_1, doc_id_2 FROM (
         |    SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
         |           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |             / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
         |    FROM sh a JOIN sh b
         |      ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id)
         |  WHERE jaccard >= 0.6),
         |sp AS (
         |  SELECT doc_id,
         |         CASE WHEN bucket < 13 THEN 'test'
         |              WHEN bucket < 38 THEN 'val'
         |              ELSE 'train' END AS split
         |  FROM (SELECT doc_id,
         |          (strpos('0123456789abcdef', substr(md5($NormSql), 1, 1)) - 1) * 16
         |            + strpos('0123456789abcdef', substr(md5($NormSql), 2, 1)) - 1 AS bucket
         |        FROM documents))
         |SELECT p.doc_id_1, p.doc_id_2, s1.split AS split_1, s2.split AS split_2,
         |       s1.split <> s2.split AS leaky
         |FROM pairs p
         |JOIN sp s1 ON p.doc_id_1 = s1.doc_id
         |JOIN sp s2 ON p.doc_id_2 = s2.doc_id""".stripMargin,

    // FULL exact oracle (round 6 final): the deterministic quantizer is a
    // pure function of the data, so the generated SQL recomputes the whole
    // blocked near-dup pipeline — fit set, 3 unrolled Lloyd rounds, nProbe
    // multi-assignment, cell equi-join, exact cosine threshold — and the
    // emitted PAIRS hash-compare directly (see quantizerCtes)
    "q94_embedding_neardup_ivf" -> neardupIvfOracleSql(nCells = 8,
      fitFraction = 0.1, iters = 3, nProbe = 3, threshold = "0.35"),

    "q97_edit_distance_pairs" ->
      """SELECT a.p_partkey AS id_1, b.p_partkey AS id_2,
        |       levenshtein(a.p_name, b.p_name) AS distance
        |FROM part a JOIN part b
        |  ON a.p_partkey < b.p_partkey
        | AND abs(length(a.p_name) - length(b.p_name)) <= 2
        |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin,

    "q98_incremental_dedup" ->
      s"""WITH sh AS (
         |  SELECT doc_id, lang, floor(n_chars / 50) AS band, $ShinglesSql AS s,
         |         doc_id % 10 = 0 AS is_new
         |  FROM documents)
         |SELECT * FROM (
         |  SELECT a.doc_id AS new_id, b.doc_id AS dup_id,
         |         CASE WHEN b.is_new THEN 'batch' ELSE 'corpus' END AS dup_source,
         |         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |           / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
         |  FROM sh a JOIN sh b
         |    ON a.is_new AND a.lang = b.lang AND a.band = b.band
         |   AND (NOT b.is_new OR a.doc_id < b.doc_id))
         |WHERE jaccard >= 0.6""".stripMargin,

    "q116_winnow_pairs" ->
      """WITH pos AS (
        |  SELECT doc_id, text,
        |         CAST(unnest(generate_series(1, CAST(length(text) AS BIGINT) - 15)) AS BIGINT) AS i
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, i,
        |         list_reduce(
        |           [CAST(unicode(substr(text, CAST(i + j AS INT), 1)) AS BIGINT)
        |            for j in range(0, 16)],
        |           (acc, c) -> (acc * 257 + c) % 1000000007) AS hash
        |  FROM pos),
        |wm AS (
        |  SELECT doc_id, i,
        |         min(hash) OVER (PARTITION BY doc_id ORDER BY i
        |                         ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp,
        |         max(i) OVER (PARTITION BY doc_id) AS npos
        |  FROM h),
        |fps AS (SELECT DISTINCT doc_id, fp FROM wm WHERE i <= npos - 15),
        |rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 32),
        |kept AS (SELECT f.doc_id, f.fp FROM fps f SEMI JOIN rare r ON f.fp = r.fp)
        |SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
        |       CAST(count(*) AS BIGINT) AS n_shared
        |FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING count(*) >= 4""".stripMargin,

    "q141_cluster_sizes" ->
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, lang, floor(n_chars / 50) AS band, $ShinglesSql AS s
         |  FROM documents),
         |edges AS (
         |  SELECT doc_id_1 AS a, doc_id_2 AS b FROM (
         |    SELECT x.doc_id AS doc_id_1, y.doc_id AS doc_id_2,
         |           CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
         |             / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
         |    FROM sh x JOIN sh y
         |      ON x.lang = y.lang AND x.band = y.band AND x.doc_id < y.doc_id)
         |  WHERE jaccard >= 0.6),
         |und AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
         |reach(src, dst) AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a),
         |comp AS (SELECT src AS doc_id, min(dst) AS min_reach
         |         FROM reach GROUP BY 1),
         |assign AS (
         |  SELECT d.doc_id,
         |         least(d.doc_id, coalesce(c.min_reach, d.doc_id)) AS component
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
         |sz AS (
         |  SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM assign GROUP BY 1)
         |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
         |FROM sz GROUP BY 1""".stripMargin,

    "q142_dup_substrings" ->
      """WITH st AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(0, n_chars - 40)) AS po
        |  FROM documents WHERE n_chars >= 40),
        |sh AS (
        |  SELECT doc_id, CAST(po AS BIGINT) AS po,
        |         substr(text, CAST(po AS INT) + 1, 40) AS s
        |  FROM st),
        |dup AS (
        |  SELECT doc_id, po FROM (
        |    SELECT doc_id, po, count(*) OVER (PARTITION BY s) AS n_occ
        |    FROM sh)
        |  WHERE n_occ >= 2),
        |mk AS (
        |  SELECT doc_id, po,
        |         CASE WHEN po - lag(po) OVER (PARTITION BY doc_id
        |                                      ORDER BY po) <= 40
        |              THEN 0 ELSE 1 END AS new_span
        |  FROM dup),
        |si AS (
        |  SELECT doc_id, po,
        |         sum(new_span) OVER (PARTITION BY doc_id ORDER BY po
        |                             ROWS UNBOUNDED PRECEDING) AS span_id
        |  FROM mk),
        |spans AS (
        |  SELECT doc_id, span_id, min(po) AS s0, max(po) + 40 AS e0
        |  FROM si GROUP BY 1, 2)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |       CAST(sum(e0 - s0) AS BIGINT) AS dup_chars,
        |       CAST(max(e0 - s0) AS BIGINT) AS max_span
        |FROM spans GROUP BY 1""".stripMargin,

    "q150_source_overlap" ->
      s"""WITH u AS (
         |  SELECT source, unnest($ShinglesSql) AS s FROM documents),
         |ss AS (SELECT DISTINCT source, s FROM u),
         |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM ss
         |        GROUP BY 1),
         |c AS (
         |  SELECT a.source AS src_a, b.source AS src_b,
         |         CAST(count(*) AS BIGINT) AS n_shared
         |  FROM ss a JOIN ss b USING (s)
         |  WHERE a.source < b.source GROUP BY 1, 2)
         |SELECT src_a, src_b, n_shared, ta.n AS n_a, tb.n AS n_b,
         |       CAST((1000 * n_shared) // ta.n AS BIGINT) AS cont_a_permille,
         |       CAST((1000 * n_shared) // tb.n AS BIGINT) AS cont_b_permille
         |FROM c JOIN tot ta ON c.src_a = ta.source
         |       JOIN tot tb ON c.src_b = tb.source""".stripMargin,

    "q207_phonetic_pairs" ->
      """WITH rawtok AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
        |  UNION
        |  SELECT unnest(string_split(p_name, ' ')) FROM part),
        |tok AS (
        |  SELECT DISTINCT tok FROM rawtok
        |  WHERE regexp_matches(tok, '^[a-z]+$')),
        |enc AS (
        |  SELECT tok,
        |         string_split(upper(tok), '') AS ch,
        |         list_transform(string_split(upper(tok), ''), c ->
        |           CASE WHEN c IN ('B','F','P','V') THEN '1'
        |                WHEN c IN ('C','G','J','K','Q','S','X','Z') THEN '2'
        |                WHEN c IN ('D','T') THEN '3'
        |                WHEN c = 'L' THEN '4'
        |                WHEN c IN ('M','N') THEN '5'
        |                WHEN c = 'R' THEN '6'
        |                WHEN c IN ('H','W') THEN '7'
        |                ELSE '0' END) AS cd
        |  FROM tok),
        |sdx AS (
        |  SELECT tok,
        |         ch[1] || rpad(substr(array_to_string(
        |           list_filter(
        |             list_transform(range(2, len(cd) + 1), i ->
        |               CASE WHEN cd[i] BETWEEN '1' AND '6'
        |                     AND cd[i] <> coalesce(
        |                       list_reverse(list_filter(cd[1:i-1],
        |                         c -> c <> '7'))[1], '')
        |               THEN cd[i] ELSE '' END),
        |             x -> x <> ''), ''), 1, 3), 3, '0') AS sdx
        |  FROM enc)
        |SELECT a.sdx AS sdx, a.tok AS tok_a, b.tok AS tok_b
        |FROM sdx a JOIN sdx b ON a.sdx = b.sdx AND a.tok < b.tok""".stripMargin,

    // shared CTE text for the q208/q209 deterministic-cell assignment:
    // nearest hash-sampled centroid by squared L2, ties → lower cell id
    // q45's recursive-CTE closure + a component-keyed count window
    "q324_soft_dedup_weights" ->
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, lang, floor(n_chars / 50) AS band, $ShinglesSql AS s
         |  FROM documents),
         |edges AS (
         |  SELECT doc_id_1 AS a, doc_id_2 AS b FROM (
         |    SELECT x.doc_id AS doc_id_1, y.doc_id AS doc_id_2,
         |           CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
         |             / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
         |    FROM sh x JOIN sh y
         |      ON x.lang = y.lang AND x.band = y.band AND x.doc_id < y.doc_id)
         |  WHERE jaccard >= 0.6),
         |und AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
         |reach(src, dst) AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a),
         |comp AS (SELECT src AS doc_id, min(dst) AS min_reach
         |         FROM reach GROUP BY 1),
         |lab AS (
         |  SELECT d.doc_id,
         |         least(d.doc_id, coalesce(c.min_reach, d.doc_id)) AS component
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
         |SELECT doc_id, component,
         |       CAST(count(*) OVER (PARTITION BY component) AS BIGINT)
         |         AS cluster_size,
         |       1000000 // CAST(count(*) OVER (PARTITION BY component)
         |         AS BIGINT) AS weight_ppm
         |FROM lab""".stripMargin,

    // the q208 machinery with eval-anchored cells: centroids sample from
    // the EVAL subset, both sides assign, cell-mates compare
    "q321_semantic_decontaminate" ->
      s"""WITH ev AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 16 = 0),
         |sampled AS (
         |  SELECT vec_id, embedding FROM ev
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
         |cents AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1
         |           AS cell,
         |         embedding AS cv
         |  FROM sampled),
         |tasg AS (
         |  SELECT vec_id, cell, embedding,
         |         sqrt(${dotSql("embedding", "embedding")}) AS nrm
         |  FROM (
         |    SELECT e.vec_id, c.cell, e.embedding,
         |           row_number() OVER (PARTITION BY e.vec_id
         |                              ORDER BY list_reduce(
         |             list_transform(list_zip(e.embedding, c.cv),
         |               s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))
         |                  * (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))),
         |             (acc, x) -> acc + x), c.cell) AS rn
         |    FROM embeddings e, cents c WHERE e.vec_id % 16 <> 0)
         |  WHERE rn = 1),
         |easg AS (
         |  SELECT vec_id, cell, embedding,
         |         sqrt(${dotSql("embedding", "embedding")}) AS nrm
         |  FROM (
         |    SELECT e.vec_id, c.cell, e.embedding,
         |           row_number() OVER (PARTITION BY e.vec_id
         |                              ORDER BY list_reduce(
         |             list_transform(list_zip(e.embedding, c.cv),
         |               s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))
         |                  * (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))),
         |             (acc, x) -> acc + x), c.cell) AS rn
         |    FROM ev e, cents c)
         |  WHERE rn = 1)
         |SELECT train_id, CAST(count(*) AS BIGINT) AS n_eval_hits,
         |       CAST(max(cm) AS BIGINT) AS max_cos_micro
         |FROM (
         |  SELECT t.vec_id AS train_id,
         |         CAST(floor(${cosSql("t.embedding", "e.embedding", "t.nrm", "e.nrm")}
         |                 * 1e6 + 0.5) AS BIGINT) AS cm
         |  FROM tasg t JOIN easg e ON t.cell = e.cell)
         |WHERE cm >= 350000
         |GROUP BY 1""".stripMargin,

    "q208_semdedup" ->
      s"""WITH sampled AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
         |cents AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1
         |           AS cell,
         |         embedding AS cv
         |  FROM sampled),
         |asg AS (
         |  SELECT vec_id, cell, embedding,
         |         sqrt(${dotSql("embedding", "embedding")}) AS nrm
         |  FROM (
         |    SELECT e.vec_id, c.cell, e.embedding,
         |           list_reduce(list_transform(list_zip(e.embedding, c.cv),
         |             s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))
         |                * (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))),
         |             (acc, x) -> acc + x) AS dist,
         |           row_number() OVER (PARTITION BY e.vec_id
         |                              ORDER BY list_reduce(
         |             list_transform(list_zip(e.embedding, c.cv),
         |               s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))
         |                  * (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))),
         |             (acc, x) -> acc + x), c.cell) AS rn
         |    FROM embeddings e, cents c)
         |  WHERE rn = 1),
         |dup AS (
         |  SELECT DISTINCT x.vec_id
         |  FROM asg x JOIN asg y
         |    ON x.cell = y.cell AND y.vec_id < x.vec_id
         |  WHERE CAST(floor(${cosSql("y.embedding", "x.embedding", "y.nrm", "x.nrm")}
         |          * 1e6 + 0.5) AS BIGINT) >= 350000)
         |SELECT a.vec_id, a.cell, (d.vec_id IS NOT NULL) AS pruned
         |FROM asg a LEFT JOIN dup d ON a.vec_id = d.vec_id""".stripMargin,

    "q212_leakage_split" ->
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, lang, floor(n_chars / 50) AS band, $ShinglesSql AS s
         |  FROM documents),
         |edges AS (
         |  SELECT doc_id_1 AS a, doc_id_2 AS b FROM (
         |    SELECT x.doc_id AS doc_id_1, y.doc_id AS doc_id_2,
         |           CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
         |             / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
         |    FROM sh x JOIN sh y
         |      ON x.lang = y.lang AND x.band = y.band AND x.doc_id < y.doc_id)
         |  WHERE jaccard >= 0.6),
         |und AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
         |reach(src, dst) AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a),
         |comp AS (SELECT src AS doc_id, min(dst) AS min_reach
         |         FROM reach GROUP BY 1),
         |asg AS (
         |  SELECT d.doc_id,
         |         least(d.doc_id, coalesce(c.min_reach, d.doc_id)) AS component
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
         |SELECT doc_id, component,
         |       CASE WHEN substr(md5(CAST(component AS VARCHAR)), 1, 1) <= 'b'
         |            THEN 'train' ELSE 'test' END AS split
         |FROM asg""".stripMargin,

    "q251_reciprocal_match" ->
      """WITH p AS (
        |  SELECT p_partkey, p_name,
        |         substring(p_name, 1, 1) || '|' ||
        |           split_part(p_name, ' ', -1) AS blk
        |  FROM part),
        |cand AS (
        |  SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
        |         CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev
        |  FROM p a JOIN p b
        |    ON a.blk = b.blk AND a.p_partkey % 2 = 0 AND b.p_partkey % 2 = 1
        |  WHERE levenshtein(a.p_name, b.p_name) <= 3),
        |r AS (
        |  SELECT a_key, b_key, lev,
        |         row_number() OVER (PARTITION BY a_key
        |           ORDER BY lev ASC, b_key ASC) AS ra,
        |         row_number() OVER (PARTITION BY b_key
        |           ORDER BY lev ASC, a_key ASC) AS rb
        |  FROM cand)
        |SELECT a_key, b_key, lev FROM r WHERE ra = 1 AND rb = 1""".stripMargin,

    "q229_dedup_disagreement" ->
      s"""WITH sh AS (
         |  SELECT doc_id, lang, floor(n_chars / 50) AS band, $ShinglesSql AS s
         |  FROM documents),
         |txt AS (
         |  SELECT a, b FROM (
         |    SELECT x.doc_id AS a, y.doc_id AS b,
         |           CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
         |             / len(list_distinct(list_concat(x.s, y.s))) AS jac
         |    FROM sh x JOIN sh y
         |      ON x.lang = y.lang AND x.band = y.band AND x.doc_id < y.doc_id)
         |  WHERE jac >= 0.6),
         |sampled AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
         |cents AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1
         |           AS cell,
         |         embedding AS cv
         |  FROM sampled),
         |asg AS (
         |  SELECT vec_id, cell, embedding,
         |         sqrt(${dotSql("embedding", "embedding")}) AS nrm
         |  FROM (
         |    SELECT e.vec_id, c.cell, e.embedding,
         |           row_number() OVER (PARTITION BY e.vec_id
         |                              ORDER BY list_reduce(
         |             list_transform(list_zip(e.embedding, c.cv),
         |               s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))
         |                  * (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))),
         |             (acc, x) -> acc + x), c.cell) AS rn
         |    FROM embeddings e, cents c)
         |  WHERE rn = 1),
         |sem AS (
         |  SELECT y.vec_id AS a, x.vec_id AS b
         |  FROM asg x JOIN asg y
         |    ON x.cell = y.cell AND y.vec_id < x.vec_id
         |  WHERE CAST(floor(${cosSql("y.embedding", "x.embedding", "y.nrm", "x.nrm")}
         |          * 1e6 + 0.5) AS BIGINT) >= 350000)
         |SELECT signal, CAST(count(*) AS BIGINT) AS n_pairs FROM (
         |  SELECT CASE WHEN t.a IS NOT NULL AND s.a IS NOT NULL THEN 'both'
         |              WHEN t.a IS NOT NULL THEN 'text_only'
         |              ELSE 'sem_only' END AS signal
         |  FROM txt t FULL OUTER JOIN sem s ON t.a = s.a AND t.b = s.b)
         |GROUP BY 1""".stripMargin,

    "q217_fold_leakage" ->
      s"""WITH sh AS (
         |  SELECT doc_id, lang, floor(n_chars / 50) AS band, $ShinglesSql AS s
         |  FROM documents),
         |edges AS (
         |  SELECT doc_id_1 AS a, doc_id_2 AS b FROM (
         |    SELECT x.doc_id AS doc_id_1, y.doc_id AS doc_id_2,
         |           CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
         |             / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
         |    FROM sh x JOIN sh y
         |      ON x.lang = y.lang AND x.band = y.band AND x.doc_id < y.doc_id)
         |  WHERE jaccard >= 0.6),
         |folds AS (
         |  SELECT doc_id,
         |         (CAST(row_number() OVER (PARTITION BY lang
         |            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
         |            AS BIGINT) - 1) % 5 AS fold
         |  FROM documents)
         |SELECT least(f1.fold, f2.fold) AS fold_a,
         |       greatest(f1.fold, f2.fold) AS fold_b,
         |       CAST(count(*) AS BIGINT) AS n_pairs
         |FROM edges
         |JOIN folds f1 ON edges.a = f1.doc_id
         |JOIN folds f2 ON edges.b = f2.doc_id
         |GROUP BY 1, 2""".stripMargin,

    "q197_segment_jaccard_docs" ->
      s"""$SegCte,
         |ds AS (SELECT DISTINCT doc_id, seg FROM segs),
         |rare AS (SELECT seg FROM ds GROUP BY 1 HAVING count(*) <= 100),
         |ix AS (SELECT doc_id, seg FROM ds JOIN rare USING (seg)),
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ds GROUP BY 1),
         |pr AS (
         |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |         CAST(count(*) AS BIGINT) AS shared
         |  FROM ix x JOIN ix y ON x.seg = y.seg AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, shared, a.n AS n_a, b.n AS n_b,
         |       (1000000 * shared) // (a.n + b.n - shared) AS jaccard_micro
         |FROM pr
         |JOIN sz a ON a.doc_id = doc_a
         |JOIN sz b ON b.doc_id = doc_b
         |WHERE (1000000 * shared) // (a.n + b.n - shared) >= 250000""".stripMargin,
  )
}
