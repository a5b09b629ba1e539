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
}
