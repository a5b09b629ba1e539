package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteKnn` is the exactness baseline: Q×N cosine evaluations — the right
  * tool when Q is small (e.g. eval queries), and the correctness oracle for
  * the approximate paths. The scale path is `lshKnn`: random-hyperplane
  * signatures bucket the corpus (one shuffle on the signature), queries
  * multiprobe neighboring buckets, and only in-bucket candidates are scored.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. The query side is
    * broadcast (small Q); candidates stream by — no shuffle of the corpus
    * until the final per-query top-k, whose input is already Q×N reduced
    * rows. Ranks carry a vec_id tie-break for determinism.
    */
  def bruteKnn(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val cand = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
      vnorm(col("embedding")).as("c_nrm"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      vnorm(col("embedding")).as("q_nrm"))
    val scored = cand.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineWithNorms(col("q_emb"), col("c_emb"), col("q_nrm"), col("c_nrm")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH signature: bit i = [dot(v, plane_i) >= 0].
    * Planes are a fixed-seed pseudo-random matrix compiled into the plan as
    * literals (tiny: nBits × dim doubles).
    */
  private def planes(nBits: Int, dim: Int): Seq[Array[Double]] = {
    val rng = new scala.util.Random(7)
    Seq.fill(nBits)(Array.fill(dim)(rng.nextGaussian()))
  }

  def lshSignature(emb: DataFrame, nBits: Int, dim: Int): DataFrame = {
    val ps = planes(nBits, dim)
    val sig = ps.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit(_)): _*)
      when(vdot(col("embedding"), planeCol) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ + _)
    emb.withColumn("sig", sig)
  }

  /** Per-table hyperplanes: table 0 reproduces the original fixed-seed
    * matrix (so `nTables = 1` is bit-identical to the historical single-
    * table behavior); further tables draw from disjoint fixed seeds.
    */
  private[graft] def planesSeeded(nBits: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nBits)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** LSH-bucketed ANN: candidates share the query's bucket or any 1-bit
    * neighboring bucket (multiprobe), scored exactly, per-query top-k.
    * Recall vs `bruteKnn` is asserted in the test suite.
    *
    * `nTables > 1` is OR-amplification (Indyk–Motwani style multi-table
    * LSH): each table hashes with an independent fixed-seed hyperplane
    * matrix and a candidate qualifies by matching in ANY table — the
    * standard production lever when single-table recall is too low,
    * trading candidate volume (~nTables·(nBits+1)·n/2^nBits scored rows)
    * for recall. At corpus scale nBits grows with log(n) so each table's
    * buckets stay bounded; the per-table join is the same single
    * (table, signature) equi-join shuffle.
    */
  def lshKnn(emb: DataFrame, queries: DataFrame, k: Int, nBits: Int = 8,
             dim: Int = 64, nTables: Int = 1): DataFrame = {
    // the dot-product kernel clamps to the shorter array, so an
    // undersized `dim` would SILENTLY bucket on a prefix of each vector —
    // recall degrades with no error. One tiny take(1) job per frame
    // guards BOTH sides (queries hash with the same hyperplanes); empty
    // frames skip the check and flow through to an empty result. Ragged
    // arrays within a frame remain the caller's schema contract.
    def checkDim(df: DataFrame, what: String): Unit =
      df.select(size(col("embedding"))).take(1).foreach { r =>
        // size(null) is null: surface a schema-contract message, not an NPE
        require(!r.isNullAt(0),
          s"lshKnn: $what is null (embedding column must be non-null)")
        require(r.getInt(0) == dim,
          s"lshKnn: $what dim ${r.getInt(0)} != configured dim $dim " +
            "(hyperplanes must cover every component)")
      }
    checkDim(emb, "corpus embedding")
    checkDim(queries, "query embedding")
    // one (table, signature) struct per table, computed map-side from
    // literal plane matrices, exploded to (tab, sig) rows
    def tabSigs: org.apache.spark.sql.Column = array((0 until nTables).map { t =>
      val ps = planesSeeded(nBits, dim, if (t == 0) 7L else 7L + 1000L * t)
      val sig = ps.zipWithIndex.map { case (p, i) =>
        when(vdot(col("embedding"), array(p.map(lit(_)): _*)) >= 0,
          shiftleft(lit(1L), i)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t).as("tab"), sig.as("sig"))
    }: _*)
    val cand = emb
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        vnorm(col("embedding")).as("c_nrm"), explode(tabSigs).as("ts"))
      .select(col("neighbor_id"), col("c_emb"), col("c_nrm"),
        col("ts.tab").as("c_tab"), col("ts.sig").as("c_sig"))
    // query probes: per table, own bucket + all 1-bit flips
    val qsig = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        vnorm(col("embedding")).as("q_nrm"), explode(tabSigs).as("ts"))
      .select(col("query_id"), col("q_emb"), col("q_nrm"),
        col("ts.tab").as("q_tab"), col("ts.sig").as("sig"))
    val probes = qsig.select(col("query_id"), col("q_emb"), col("q_nrm"),
      col("q_tab"),
      explode(array((lit(0L) +: (0 until nBits).map(i => shiftleft(lit(1L), i))).map(
        m => col("sig").bitwiseXOR(m)): _*)).as("probe_sig"))
    probes.join(cand, col("q_tab") === col("c_tab") &&
        col("probe_sig") === col("c_sig") &&
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineWithNorms(col("q_emb"), col("c_emb"), col("q_nrm"), col("c_nrm")).as("cos_sim"))
      .distinct()
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer partitions the
    * corpus into cells; a query probes only its `nProbe` nearest cells and
    * re-ranks those candidates exactly.
    *
    * The 100 TB shape: the index build is one KMeans fit over a
    * `fitFraction` sample (centroids don't need the full corpus — the
    * iterative fit must not scan 100 TB per iteration) plus one
    * cell-assignment pass over the full corpus; search shuffles nothing
    * corpus-sized — centroids are a tiny broadcast table, candidate fetch is
    * an equi-join on cell id, and the exact re-rank touches ~nProbe/nCells
    * of the corpus.
    */
  /** Fit the coarse quantizer over a deterministic sample. Fit-set
    * MEMBERSHIP is a pure function of vec_id, never of partitioning:
    * sample(seed) is per-partition Bernoulli and a bare limit() takes
    * whichever rows arrive first — either would change which rows train
    * the model across layouts. The ordered-limit union is a tiny-corpus
    * floor guaranteeing >= 20*nCells fit rows regardless of fraction
    * (duplicate rows only re-weight KMeans). Residual caveat: Spark's
    * k-means|| INITIALIZATION draws per-partition randoms, so centroids
    * (not membership) can still vary with physical layout — inherent to
    * distributed KMeans. That nondeterminism is why the q26/q94 query
    * contracts run on [[fitQuantizerDet]] instead since round 6; this
    * trained fit stays for callers who value KMeans recall over
    * bit-reproducibility.
    */
  private[operators] def fitQuantizer(emb: DataFrame, nCells: Int,
                                      fitFraction: Double) = {
    val vecs = emb.withColumn("fvec", array_to_vector(col("embedding")))
    val keepPerMille = math.max(1L, (fitFraction * 1000).toLong)
    val fitSet = vecs
      .filter(pmod(xxhash64(col("vec_id")), lit(1000L)) < lit(keepPerMille))
      .union(vecs.orderBy(col("vec_id")).limit(nCells * 20))
    new KMeans().setK(nCells).setSeed(42L)
      .setFeaturesCol("fvec").setPredictionCol("cell")
      .fit(fitSet)
  }

  /** Centroid table: tiny (nCells × dim), meant to be broadcast. */
  private[operators] def centroidFrame(
      emb: DataFrame,
      model: org.apache.spark.ml.clustering.KMeansModel): DataFrame = {
    val spark0 = emb.sparkSession
    import spark0.implicits._
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cell", "centroid")
  }

  /** Assign each corpus vector to its `nProbe` nearest quantizer cells —
    * the multi-assignment ("cell spill") that lets cell-blocked pair
    * generation catch boundary pairs whose primary cells differ. One
    * broadcast nested-loop over the nCells-row centroid table (bounded,
    * intended), then a top-nProbe window over NARROW (vec_id, cell, dist)
    * rows — the corpus embedding column is dropped before the shuffle.
    * Output: (vec_id, cell), nProbe rows per vector.
    */
  def assignCells(emb: DataFrame, nCells: Int, nProbe: Int,
                  fitFraction: Double = 0.1): DataFrame = {
    val model = fitQuantizer(emb, nCells, fitFraction)
    val centDf = centroidFrame(emb, model)
    emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(centDf))
      .select(col("vec_id"), col("cell"),
        (vdot(col("embedding"), col("embedding"))
          - lit(2.0) * vdot(col("embedding"), col("centroid"))
          + vdot(col("centroid"), col("centroid"))).as("cdist"))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cdist").asc, col("cell").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("vec_id"), col("cell"))
  }

  def ivfKnn(emb: DataFrame, queries: DataFrame, k: Int, nCells: Int = 16,
             nProbe: Int = 3, fitFraction: Double = 0.1): DataFrame = {
    val vecs = emb.withColumn("fvec", array_to_vector(col("embedding")))
    val model = fitQuantizer(emb, nCells, fitFraction)
    val indexed = model.transform(vecs)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        vnorm(col("embedding")).as("c_nrm"), col("cell"))
    val centDf = centroidFrame(emb, model)

    // per query: rank cells by exact distance to centroid, keep nProbe
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"), vnorm(col("embedding")).as("q_nrm"))
    val probes = q.crossJoin(broadcast(centDf))
      .withColumn("cdist", vdot(col("q_emb"), col("q_emb"))
        - lit(2.0) * vdot(col("q_emb"), col("centroid"))
        + vdot(col("centroid"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cdist").asc, col("cell").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("cell"))

    probes.join(indexed, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineWithNorms(col("q_emb"), col("c_emb"), col("q_nrm"), col("c_nrm")).as("cos_sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
  }

  // squared L2 between the row's embedding and a broadcast centroid column
  // named `centroid` — the zip_with fold is element-ordered, so the double
  // sum is bit-identical on any partitioning (and mirrors the oracle's
  // list_reduce twin when one is written)
  private val sqDistCentroid = expr(
    """aggregate(zip_with(embedding, centroid,
      |  (a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
      |          * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),
      |  0D, (acc, x) -> acc + x)""".stripMargin)

  /** Deterministic Lloyd-refined coarse quantizer: the recall of a fitted
    * KMeans with the bit-reproducibility of [[detCentroids]].
    *
    * [[fitQuantizer]]'s k-means|| initialization draws per-partition
    * randoms, so its centroids — and every cell assignment downstream —
    * can change with physical layout; that nondeterminism is the single
    * reason the IVF query paths were rows-only. This fit is a pure
    * function of the data: the fit set is the xxhash64-permille sample
    * (membership is a function of vec_id), initialization is the nCells
    * smallest-md5 fit vectors (the q205 codebook convention), and each of
    * the `iters` Lloyd updates recomputes centroids in FIXED-POINT —
    * per-dimension sums of floor(x·2^24) as BIGINT, which commute, then
    * ONE double division — so no partition-order double summation exists
    * anywhere. Identical input bytes give identical centroids on any
    * cluster size, which makes ANN quality contracts (recall floors) on
    * top of it exact rather than statistical.
    *
    * Scale: `iters` bounded passes over the fit sample (not the corpus);
    * each pass is one broadcast nested-loop (nCells-row table) + a
    * map-side-combining (cell, dim) aggregate whose output is nCells×dim
    * rows. The tiny centroid frame localCheckpoints per iteration so the
    * lineage stays flat. Headroom: |x|·2^24 per element times the fit
    * count must stay under 2^63 — fine for unit-scale embeddings up to
    * ~10^10 fit rows per cell.
    *
    * Output: (cell: long-compatible int, centroid: array<double>).
    */
  def fitQuantizerDet(emb: DataFrame, nCells: Int,
                      fitFraction: Double = 0.1, iters: Int = 3): DataFrame = {
    // fit-set membership by md5-prefix bucket (the q34 contentSample
    // convention, round 6): a pure function of vec_id that a SQL oracle
    // can restate verbatim — substr(md5(id), 1, 2) < threshold keeps
    // ceil(fitFraction·256)/256 of rows. xxhash64-permille (the KMeans
    // fit's rule) is Spark-internal and would block full-hash oracles.
    // clamp to 255: a "sample" of 256/256 is the full corpus, which the
    // 2-hex-char prefix compare cannot express (and defeats the point)
    val keepHex = "%02x".format(
      math.min(255L, math.max(1L, math.ceil(fitFraction * 256).toLong)))
    // distinct: a vec_id in both the bucket sample and the tiny-corpus
    // floor must appear once — duplicate rows at the md5-ordered INIT cut
    // could seed two cells with the same centroid (assignment dedupes by
    // vec_id anyway, so distinct changes nothing else)
    val fitSet = emb.select(col("vec_id"), col("embedding"))
      .filter(substring(md5(col("vec_id").cast("string")), 1, 2) < keepHex)
      .union(emb.select(col("vec_id"), col("embedding"))
        .orderBy(col("vec_id")).limit(nCells * 20))
      .dropDuplicates("vec_id")
      .localCheckpoint() // reused by every Lloyd pass
    var cents = fitSet
      .select(col("vec_id"), col("embedding"),
        md5(col("vec_id").cast("string")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(nCells)
      .withColumn("cell",
        row_number().over(Window.orderBy(col("vec_id"))).cast("long") - 1)
      .select(col("cell"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("centroid"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      val asg = fitSet.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("cell"),
          sqDistCentroid.as("dist"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cell"), col("embedding"))).as("b"))
        .select(col("b.cell").as("cell"), col("b.embedding").as("embedding"))
      val upd = asg
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(sum(floor(col("x").cast("double") * lit(16777216.0d))
          .cast("long")).as("sfp"), count(lit(1)).as("n"))
        .groupBy(col("cell"))
        .agg(expr("""transform(array_sort(collect_list(struct(dim, sfp, n))),
          | s -> CAST(s.sfp AS DOUBLE) / (CAST(s.n AS DOUBLE) * 16777216.0D))"""
          .stripMargin).as("centroid"))
      // a cell that lost all members keeps its previous centroid
      cents = cents.as("p").join(upd.as("u"), Seq("cell"), "left")
        .select(col("cell"),
          coalesce(col("u.centroid"), col("p.centroid")).as("centroid"))
        .localCheckpoint()
      it += 1
    }
    cents
  }

  /** Multi-assignment ("cell spill") against an explicit centroid frame —
    * [[assignCells]] with the quantizer decoupled: pass
    * [[fitQuantizerDet]] output for a bit-reproducible index, or
    * `centroidFrame(kmeansModel)` when a trained fit matters more than
    * audit. Same plan shape: broadcast nested-loop over the nCells-row
    * table, top-nProbe window over narrow (vec_id, cell, dist) rows.
    */
  def assignCellsFrom(cents: DataFrame, emb: DataFrame,
                      nProbe: Int): DataFrame =
    emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell"), sqDistCentroid.as("cdist"))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("cdist").asc, col("cell").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("vec_id"), col("cell"))

  /** IVF search against an explicit centroid frame ([[ivfKnn]] with the
    * quantizer decoupled, same plan shape): corpus vectors take their
    * single nearest cell, queries probe their `nProbe` nearest cells, and
    * only in-cell candidates are scored exactly. With a
    * [[fitQuantizerDet]] frame the whole search is a pure function of the
    * data — per-query recall against [[bruteKnn]] is an exact, checkable
    * contract instead of a statistical one.
    */
  def ivfKnnFrom(cents: DataFrame, emb: DataFrame, queries: DataFrame,
                 k: Int, nProbe: Int = 3): DataFrame = {
    val indexed = emb.join(
        assignCellsFrom(cents, emb, nProbe = 1), Seq("vec_id"))
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
        vnorm(col("embedding")).as("c_nrm"), col("cell"))
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding"),
        vnorm(col("embedding")).as("q_nrm"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("embedding"), col("q_nrm"), col("cell"),
        sqDistCentroid.as("cdist"))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cdist").asc, col("cell").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("embedding").as("q_emb"), col("q_nrm"),
        col("cell"))
    probes.join(indexed, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineWithNorms(col("q_emb"), col("c_emb"),
          col("q_nrm"), col("c_nrm")).as("cos_sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos_sim").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
  }

  /** Per-dimension min-max normalization of an embedding column — the
    * feature-scaling pass before int8 quantization or distance-metric
    * mixing. Deliberately min-max rather than z-score: min/max are exact
    * order-independent aggregates and the rescale is one IEEE division, so
    * the result is bit-reproducible on any partitioning AND across engines
    * — a mean/std formulation would sum doubles in partition order and
    * drag in libm sqrt, neither of which hash-compares. Constant
    * dimensions map to 0. Output: (vec_id, embedding_std: array<double>).
    *
    * Shape: posexplode → per-dimension min/max (map-side combining, output
    * is dim-sized) → the tiny stats frame collapses to ONE row of
    * dim-indexed arrays, broadcast back, and the rescale is a map over the
    * original rows (`transform` with the element index) — the corpus is
    * never reassembled from exploded rows (no collect_list regroup
    * shuffle, the trap in naive normalize-by-explode).
    */
  def minMaxNormalize(emb: DataFrame): DataFrame = {
    val stats = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("dim"), col("mn"), col("mx"))))
        .as("s"))
      .select(transform(col("s"), e => e("mn")).as("mns"),
        transform(col("s"), e => e("mx")).as("mxs"))
    emb.crossJoin(broadcast(stats)) // 1-row stats
      .select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(element_at(col("mxs"), i + 1) === element_at(col("mns"), i + 1),
            lit(0.0))
            .otherwise((x.cast("double") - element_at(col("mns"), i + 1))
              / (element_at(col("mxs"), i + 1) - element_at(col("mns"), i + 1))))
          .as("embedding_std"))
  }

  /** Semi-hard negative mining for contrastive/embedding training: from a
    * ranked knn frame (`query_id, neighbor_id, cos_sim, rank` — the output
    * shape of [[bruteKnn]], [[lshKnn]], and [[ivfKnn]]), build triplet rows
    * `(query_id, pos_id, pos_sim, neg_id, neg_sim, neg_rank)` pairing each
    * query's top-1 neighbor (the positive stand-in) with every neighbor
    * ranked in `[negFrom, negTo]` whose similarity is within `margin` of
    * the positive — the semi-hard band of FaceNet (Schroff et al., 2015):
    * close enough to be informative, not so close it's a duplicate.
    *
    * Taking the knn frame AS INPUT (rather than recomputing it) keeps the
    * op composable: the exactness oracle feeds [[bruteKnn]]; at 100 TB the
    * same call sits on [[ivfKnn]]'s output, and the mining itself adds one
    * self-join on `query_id` — per-query cardinality is bounded by k, so
    * both sides of that join derive from the SAME ranked frame and Spark
    * reuses the exchange rather than rescoring anything.
    */
  def hardNegatives(knn: DataFrame, negFrom: Int, negTo: Int,
                    margin: Double): DataFrame = {
    require(negFrom >= 2, s"hardNegatives: negFrom $negFrom overlaps the positive (rank 1)")
    require(negTo >= negFrom, s"hardNegatives: empty band [$negFrom, $negTo]")
    val pos = knn.filter(col("rank") === 1).select(col("query_id"),
      col("neighbor_id").as("pos_id"), col("cos_sim").as("pos_sim"))
    val neg = knn.filter(col("rank").between(negFrom, negTo))
      .select(col("query_id"), col("neighbor_id").as("neg_id"),
        col("cos_sim").as("neg_sim"), col("rank").cast("long").as("neg_rank"))
    pos.join(neg, "query_id")
      .filter(col("pos_sim") - col("neg_sim") <= margin)
  }

  /** Product-quantization encode — the memory-side workhorse of
    * billion-vector ANN (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011): the vector splits into `nSub`
    * contiguous subspaces and each subvector is replaced by the id of its
    * nearest codeword, compressing dim×4 bytes to nSub codes.
    *
    * The codebook here is the DETERMINISTIC-SAMPLE variant: per subspace,
    * the codewords are the subvectors of the `nCodes` corpus vectors with
    * the smallest md5(vec_id) (the same hash-sample primitive as
    * `contentSample`), with `code` = rank of the source vec_id. That keeps
    * the whole operator a pure function of the data — reproducible on any
    * partitioning AND expressible in the DuckDB oracle — where a KMeans
    * codebook (the classical fit; see [[fitQuantizer]] for the machinery)
    * is engine state. Swapping trained codebooks in changes no plan shape.
    *
    * Scale: the codebook is nSub×nCodes rows → broadcast; scoring is
    * map-side over the exploded (vec, subspace) frame; the argmin is one
    * partial-aggregating min(struct) shuffle on (vec_id, sub_id). No
    * corpus×corpus stage exists. Output long-form:
    * (vec_id, sub_id, code, dist_micro) with the winning codeword's
    * squared-L2 distance micro-rounded (doubles only inside the fold,
    * identical expression structure on both engines).
    */
  def pqEncode(emb: DataFrame, nSub: Int, dim: Int, nCodes: Int): DataFrame = {
    require(dim % nSub == 0, s"pqEncode: dim $dim not divisible into $nSub subspaces")
    val subDim = dim / nSub
    val slices = expr(
      s"transform(sequence(0, ${nSub - 1}), s -> slice(embedding, s * $subDim + 1, $subDim))")
    // deterministic codebook sample: nCodes smallest md5(vec_id) — a
    // bounded TakeOrdered, never a global sort
    val sample = emb
      .select(col("vec_id"), col("embedding"),
        md5(col("vec_id").cast("string")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(nCodes)
    val cb = sample
      .select(col("vec_id"), posexplode(slices).as(Seq("sub_id", "cv")))
      .withColumn("code",
        row_number().over(Window.partitionBy(col("sub_id"))
          .orderBy(col("vec_id"))).cast("long") - 1)
      .select(col("sub_id"), col("code"), col("cv"))
    val sub = emb.select(col("vec_id"), posexplode(slices).as(Seq("sub_id", "v")))
    val dist = expr(
      """aggregate(zip_with(v, cv,
        |  (a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
        |          * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),
        |  0D, (acc, x) -> acc + x)""".stripMargin)
    sub.join(broadcast(cb), Seq("sub_id"))
      .select(col("vec_id"), col("sub_id"), col("code"), dist.as("dist"))
      .groupBy(col("vec_id"), col("sub_id"))
      .agg(min(struct(col("dist"), col("code"))).as("best"))
      .select(col("vec_id"), col("sub_id").cast("long").as("sub_id"),
        col("best.code").as("code"),
        floor(col("best.dist") * 1e6 + 0.5).cast("long").as("dist_micro"))
  }

  /** Asymmetric-distance (ADC) top-k search over [[pqEncode]]'s codes —
    * the query side of product quantization (Jégou et al. §IV): each
    * probe vector builds a per-subspace lookup table of exact distances
    * to every codeword, and a candidate's approximate distance is the
    * SUM of 8 table lookups instead of a 64-dim computation. At scale
    * the LUT (|probes|·nSub·nCodes rows) broadcasts, the probe never
    * touches raw corpus vectors, and the per-candidate sum is one
    * partial-aggregating shuffle on (probe, candidate).
    *
    * Determinism: per-subspace LUT distances micro-round to BIGINT
    * BEFORE the cross-subspace sum (the q109 order-free trick), so the
    * ADC total is an exact integer sum — identical on any partitioning
    * and in the oracle. Top-k carries a vec_id tie-break.
    */
  def adcTopK(emb: DataFrame, probeIds: Seq[Long], k: Int,
              nSub: Int, dim: Int, nCodes: Int): DataFrame = {
    val subDim = dim / nSub
    val slices = expr(
      s"transform(sequence(0, ${nSub - 1}), s -> slice(embedding, s * $subDim + 1, $subDim))")
    val sample = emb
      .select(col("vec_id"), col("embedding"),
        md5(col("vec_id").cast("string")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(nCodes)
    val cb = sample
      .select(col("vec_id"), posexplode(slices).as(Seq("sub_id", "cv")))
      .withColumn("code",
        row_number().over(Window.partitionBy(col("sub_id"))
          .orderBy(col("vec_id"))).cast("long") - 1)
      .select(col("sub_id"), col("code"), col("cv"))
    val dist = expr(
      """aggregate(zip_with(v, cv,
        |  (a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
        |          * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),
        |  0D, (acc, x) -> acc + x)""".stripMargin)
    // LUT: probe × codeword exact distances, micro-rounded per subspace
    val probes = emb.filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"),
        posexplode(slices).as(Seq("sub_id", "v")))
    val lut = probes.join(broadcast(cb), Seq("sub_id"))
      .select(col("probe_id"), col("sub_id"), col("code"),
        floor(dist * 1e6 + 0.5).cast("long").as("d_micro"))
    val codes = pqEncode(emb, nSub, dim, nCodes)
      .select(col("vec_id"), col("sub_id"), col("code"))
    val scored = codes.join(broadcast(lut), Seq("sub_id", "code"))
      .filter(col("vec_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("vec_id"))
      .agg(sum(col("d_micro")).as("adc_micro"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("adc_micro").asc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic coarse assignment: each vector → nearest of `nCells`
    * hash-sampled "centroids" (the nCells smallest-md5 corpus vectors, the
    * q205 codebook convention) by squared L2 over the full vector. Unlike
    * [[fitQuantizer]]'s KMeans (whose k-means|| init draws per-partition
    * randoms), this assignment is a pure function of the data, so every
    * operator built on it is exactly DuckDB-oracle-able; KMeans centroids
    * swap in with zero plan change when recall matters more than audit.
    *
    * Plan: centroid table is nCells rows → broadcast nested-loop; the
    * argmin is a partial-aggregating min(struct) on vec_id (the embedding
    * and winning centroid ride the struct, so no join-back pass exists).
    * Output: (vec_id, cell, embedding, cv) — one row per vector.
    */
  private[operators] def detCentroids(emb: DataFrame, nCells: Int): DataFrame = {
    val sample = emb
      .select(col("vec_id"), col("embedding"),
        md5(col("vec_id").cast("string")).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(nCells)
    // single-partition window is intentional: the frame is nCells rows
    sample
      .withColumn("cell",
        row_number().over(Window.orderBy(col("vec_id"))).cast("long") - 1)
      .select(col("cell"), col("embedding").as("cv"))
  }

  private[operators] def assignTo(cents: DataFrame, emb: DataFrame): DataFrame = {
    val sq = expr(
      """aggregate(zip_with(embedding, cv,
        |  (a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
        |          * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),
        |  0D, (acc, x) -> acc + x)""".stripMargin)
    emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), sq.as("dist"), col("cell"), col("embedding"),
        col("cv"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cell"), col("embedding"),
        col("cv"))).as("b"))
      .select(col("vec_id"), col("b.cell").as("cell"),
        col("b.embedding").as("embedding"), col("b.cv").as("cv"))
  }

  private[operators] def detAssign(emb: DataFrame, nCells: Int): DataFrame =
    assignTo(detCentroids(emb, nCells), emb)

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    * within-cluster embedding cosine — the curation pass that removes
    * paraphrases and re-encodings exact/MinHash dedup can't see. Vectors
    * land in [[detAssign]] cells; within a cell, a vector is pruned when a
    * LOWER-id cell-mate's cosine reaches the threshold (the paper keeps
    * one representative per duplicate group; min-id is the deterministic
    * keeper rule, and the pair predicate micro-rounds the cosine once so
    * both engines compare the same integer). Output: every vector with its
    * cell and pruned flag — the downstream filter is `!pruned`.
    *
    * Scale: the published knob IS the cluster count — the pair stage is
    * quadratic per cell but cells are sized n/nCells, so nCells grows with
    * the corpus (SemDeDup uses 50k clusters for LAION) and the per-cell
    * work stays bounded. One shuffle on the cell key feeds both join
    * sides; everything upstream is broadcast/map-side.
    */
  def semDedup(emb: DataFrame, nCells: Int, threshMicro: Long): DataFrame = {
    // one assignment pass feeds BOTH pair sides and the final flag join —
    // without the checkpoint Catalyst re-derives the broadcast-NL + argmin
    // subtree three times (three corpus scans at 100 TB)
    val asg = detAssign(emb, nCells)
      .select(col("vec_id"), col("cell"), col("embedding"),
        vnorm(col("embedding")).as("nrm"))
      .localCheckpoint()
    val dup = semPairsOf(asg, threshMicro)
      .select(col("b").as("vec_id")).distinct()
      .withColumn("pruned", lit(true))
    asg.join(dup, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("pruned"), lit(false)).as("pruned"))
  }

  /** The raw within-cell duplicate PAIRS behind [[semDedup]] — (a, b,
    * cos_micro) with a < b, cell-blocked, same micro-rounded threshold —
    * for audits that compare the semantic signal against other dedup
    * families (q229). Same one-shuffle shape as semDedup's dup stage.
    */
  def semDupPairs(emb: DataFrame, nCells: Int, threshMicro: Long): DataFrame =
    semPairsOf(
      detAssign(emb, nCells)
        .select(col("vec_id"), col("cell"), col("embedding"),
          vnorm(col("embedding")).as("nrm"))
        .localCheckpoint(),
      threshMicro)

  private def semPairsOf(asg: DataFrame, threshMicro: Long): DataFrame =
    asg.as("x").join(asg.as("y"),
        col("x.cell") === col("y.cell") &&
          col("y.vec_id") < col("x.vec_id"))
      .select(col("y.vec_id").as("a"), col("x.vec_id").as("b"),
        floor(cosineWithNorms(col("y.embedding"), col("x.embedding"),
          col("y.nrm"), col("x.nrm")) * 1e6 + 0.5).cast("long")
          .as("cos_micro"))
      .filter(col("cos_micro") >= threshMicro)

  /** Prototypicality ranking (the SSL-prototypes pruning signal, Sorscher
    * et al. 2022): cosine of each vector to its [[detAssign]] centroid,
    * ranked ascending within the cell — the bottom decile (10·rank ≤ cell
    * size, exact integer compare; ties broken by vec_id) are the cell's
    * least-prototypical members, the "hard/noisy" band a curation pipeline
    * prunes or upsamples depending on the data budget. Cosine micro-rounds
    * before ranking so the order is an integer sort on both engines.
    *
    * Plan: assignment is broadcast + one vec_id partial-agg; the rank and
    * cell-size windows share ONE cell-key shuffle (same partition key).
    */
  def prototypicality(emb: DataFrame, nCells: Int): DataFrame = {
    val scored = detAssign(emb, nCells)
      .select(col("vec_id"), col("cell"),
        floor(cosineWithNorms(col("embedding"), col("cv"),
          vnorm(col("embedding")), vnorm(col("cv"))) * 1e6 + 0.5)
          .cast("long").as("cos_micro"))
    val rw = Window.partitionBy(col("cell"))
      .orderBy(col("cos_micro").asc, col("vec_id").asc)
    val cw = Window.partitionBy(col("cell"))
    scored
      .withColumn("r", row_number().over(rw).cast("long"))
      .withColumn("n", count(lit(1)).over(cw))
      .select(col("vec_id"), col("cell"), col("cos_micro"),
        (col("r") * 10 <= col("n")).as("outlier"))
  }

  /** Incremental [[semDedup]] for micro-batch ingest: flag each NEW
    * vector whose cosine to a standing-corpus cell-mate (dup_source =
    * "corpus") or a LOWER-id same-delivery cell-mate ("batch" — the
    * keep-min-id keeper rule) reaches the threshold. Centroids derive
    * from the standing corpus so cell assignment stays stable as
    * deliveries accrue (first delivery, empty corpus: the batch trains
    * them, which makes corpus-empty output IDENTICAL to the batch
    * [[semDedup]] decision table — the spec's equivalence contract).
    *
    * Scale shape: the batch is delivery-sized; both joins key on the
    * cell, the corpus side prunes to cells the batch actually touches
    * (join pushes the cell filter into the corpus assignment), and
    * nothing batch×corpus-quadratic exists outside a cell.
    * Output: (new_id, dup_id, cos_micro, dup_source).
    *
    * RECTANGULAR GRID SPLIT (round 10, the incrementalNearDup fix in
    * cell space): a cell key group is one reducer and its pair work
    * n_x·n_y is COMPUTE-quadratic while its bytes stay small — AQE's
    * byte-threshold skew split cannot see it (measured: a 500k-vector
    * delivery ran a 1-core straggler tail for 30+ minutes before this
    * fix). Per cell, g = ceil(√(n_x·n_y / cap)) from a 16-row histogram;
    * probe vectors (group = vec_id mod g) replicate to grid row (gx, ·),
    * candidates to column (·, gy), every pair meets exactly once at
    * (gx, gy), no unit exceeds ~cap cosine evals, and the kernel-eval
    * count is IDENTICAL to the unsplit join (each (x, y) met once there
    * too) — the split costs only the ~g× replication bytes. g = 1 cells
    * keep the pre-split plan.
    */
  def incrementalSemDedup(corpus: DataFrame, batch: DataFrame, nCells: Int,
                          threshMicro: Long,
                          unitsPerPartition: Int = 8): DataFrame = {
    val parts =
      batch.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val base = if (corpus.isEmpty) batch else corpus
    val cents = detCentroids(base, nCells).localCheckpoint()
    def withNorm(asg: DataFrame) = asg
      .select(col("vec_id"), col("cell"), col("embedding"),
        vnorm(col("embedding")).as("nrm"))
    val bAsg = withNorm(assignTo(cents, batch)).localCheckpoint()
    val cAsg = withNorm(assignTo(cents, corpus))
    def pairs(news: DataFrame, cands: DataFrame, source: String,
              inBatch: Boolean) = {
      def hist(df: DataFrame, cname: String) =
        df.groupBy(col("cell")).agg(count(lit(1)).as(cname))
      val vols = hist(news, "n_x").join(hist(cands, "n_y"), Seq("cell"))
        .select(col("cell"),
          (col("n_x") * col("n_y")).cast("double").as("vol"))
      // unpartitioned window over the <= nCells-row frame, not a
      // crossJoin (a 1-row-aggregate cross join plans as BNLJ and trips
      // the no-BNLJ plan guards)
      val grid = vols
        .withColumn("tv", sum(col("vol")).over(Window.partitionBy()))
        .select(col("cell"),
          greatest(lit(1L), ceil(sqrt(col("vol") /
            greatest(lit(262144.0),
              col("tv") / lit(parts.toLong * unitsPerPartition))))
            .cast("long")).as("g_c"))
      val x = news.join(broadcast(grid), Seq("cell"))
        .select(col("vec_id"), col("cell"), col("embedding"), col("nrm"),
          pmod(col("vec_id"), col("g_c")).as("ci"),
          explode(sequence(lit(0L), col("g_c") - 1)).as("cj"))
        .repartition(parts, col("cell"), col("ci"), col("cj"))
      val y = cands.join(broadcast(grid), Seq("cell"))
        .select(col("vec_id"), col("cell"), col("embedding"), col("nrm"),
          explode(sequence(lit(0L), col("g_c") - 1)).as("ci"),
          pmod(col("vec_id"), col("g_c")).as("cj"))
        .repartition(parts, col("cell"), col("ci"), col("cj"))
      val joined = x.as("x").join(y.as("y"),
        col("x.cell") === col("y.cell") &&
          col("x.ci") === col("y.ci") && col("x.cj") === col("y.cj") &&
          (if (inBatch) col("y.vec_id") < col("x.vec_id") else lit(true)))
      joined
        .select(col("x.vec_id").as("new_id"), col("y.vec_id").as("dup_id"),
          floor(cosineWithNorms(col("y.embedding"), col("x.embedding"),
            col("y.nrm"), col("x.nrm")) * 1e6 + 0.5).cast("long")
            .as("cos_micro"))
        .filter(col("cos_micro") >= threshMicro)
        .withColumn("dup_source", lit(source))
    }
    pairs(bAsg, cAsg, "corpus", inBatch = false)
      .unionByName(pairs(bAsg, bAsg, "batch", inBatch = true))
  }

  /** Semantic decontamination: flag TRAIN vectors whose embedding cosine
    * to ANY EVAL vector reaches `threshMicro` — the modern complement of
    * text-containment decontamination (q55): a paraphrased or re-encoded
    * benchmark item shares no n-grams but sits next to its source in
    * embedding space (the SemDeDup observation applied to eval leakage).
    *
    * Cells come from [[detCentroids]] over the EVAL set (bounded — eval
    * sets are small by definition — and a pure function of the data, so
    * the whole operator is oracle-able); both sides assign to their
    * nearest eval-anchored cell and only cell-mates are compared, so no
    * train×eval all-pairs stage exists. The cosine micro-rounds once and
    * both the threshold compare and the per-train max are integer ops.
    *
    * Output: one row per contaminated train vector —
    * (train_id, n_eval_hits, max_cos_micro).
    */
  def semanticDecontaminate(train: DataFrame, eval: DataFrame, nCells: Int,
                            threshMicro: Long): DataFrame = {
    val cents = detCentroids(eval, nCells).localCheckpoint()
    def withNorm(asg: DataFrame) = asg
      .select(col("vec_id"), col("cell"), col("embedding"),
        vnorm(col("embedding")).as("nrm"))
    val tAsg = withNorm(assignTo(cents, train))
    val eAsg = withNorm(assignTo(cents, eval))
    tAsg.as("t").join(eAsg.as("e"), col("t.cell") === col("e.cell"))
      .select(col("t.vec_id").as("train_id"),
        floor(cosineWithNorms(col("t.embedding"), col("e.embedding"),
          col("t.nrm"), col("e.nrm")) * 1e6 + 0.5).cast("long")
          .as("cos_micro"))
      .filter(col("cos_micro") >= threshMicro)
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_eval_hits"),
        max(col("cos_micro")).as("max_cos_micro"))
  }

  /** ColBERT-style late-interaction (MaxSim) retrieval (Khattab &
    * Zaharia 2020): docs are BAGS of vectors (here: consecutive
    * `docSize`-vector groups of the embeddings table — the plumbing is
    * the operator; a real corpus supplies its own doc_id), and
    * score(q, d) = Σ over query vectors of max over doc vectors of
    * cosine. Each pairwise cosine micro-rounds BEFORE the max and the
    * cross-query-vector sum (q109's order-free trick), so scores are
    * exact integers on any partitioning.
    *
    * Plan: probe bags are bounded → broadcast; scoring is map-side over
    * the corpus; the max collapses at (q_id, cand_doc) grain and the sum
    * at (probe_doc, cand_doc) — both partial-aggregating, ONE shuffle
    * keyed on the candidate doc. Raw corpus vectors are touched exactly
    * once; no vector ever shuffles.
    */
  def maxSimTopK(emb: DataFrame, docSize: Int, probeDocs: Seq[Long],
                 k: Int): DataFrame = {
    val base = emb.select(col("vec_id"),
      expr(s"vec_id div $docSize").as("doc"), col("embedding"),
      vnorm(col("embedding")).as("nrm"))
    val probes = base.filter(col("doc").isin(probeDocs: _*))
      .select(col("doc").as("probe_doc"), col("vec_id").as("q_id"),
        col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val scored = base.crossJoin(broadcast(probes))
      .filter(col("doc") =!= col("probe_doc"))
      .select(col("probe_doc"), col("q_id"), col("doc").as("cand_doc"),
        floor(cosineWithNorms(col("q_emb"), col("embedding"),
          col("q_nrm"), col("nrm")) * 1e6 + 0.5).cast("long")
          .as("cos_micro"))
    val docScore = scored
      .groupBy(col("probe_doc"), col("q_id"), col("cand_doc"))
      .agg(max(col("cos_micro")).as("best_micro"))
      .groupBy(col("probe_doc"), col("cand_doc"))
      .agg(sum(col("best_micro")).as("maxsim_micro"))
    val w = Window.partitionBy(col("probe_doc"))
      .orderBy(col("maxsim_micro").desc, col("cand_doc").asc)
    docScore.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
