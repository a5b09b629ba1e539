package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class VectorDotSpec extends SparkTestBase {
  import spark.implicits._

  private def randomPairs = {
    val rng = new scala.util.Random(123)
    (1 to 50).map { i =>
      (i.toLong,
        Array.fill(64)(rng.nextFloat() * 2f - 1f),
        Array.fill(64)(rng.nextFloat() * 2f - 1f))
    }.toDF("id", "a", "b")
  }

  test("codegen'd vdot is bit-identical to the built-in fold") {
    val df = randomPairs.select(
      VectorFunctions.vdot(col("a"), col("b")).as("fast"),
      VectorFunctions.vdotFold(col("a"), col("b")).as("fold"))
    val rows = df.as[(Double, Double)].collect()
    rows.foreach { case (fast, fold) => fast shouldBe fold } // exact, no +-
  }

  test("vdot handles mixed float-array × double-array inputs") {
    val df = Seq((Array(1f, 2f, 3f))).toDF("a")
      .withColumn("d", array(lit(0.5), lit(1.5), lit(2.5)))
    df.select(VectorFunctions.vdot(col("a"), col("d")).as("v"))
      .as[Double].head() shouldBe (1.0 * 0.5 + 2.0 * 1.5 + 3.0 * 2.5)
  }

  test("graft_vector_dot is SQL-callable after registration") {
    randomPairs.createOrReplaceTempView("vd_pairs")
    val r = spark.sql(
      """SELECT max(abs(graft_vector_dot(a, b) -
        |  aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
        |            0.0d, (acc, x) -> acc + x))) AS diff
        |FROM vd_pairs""".stripMargin)
      .as[Double].head()
    r shouldBe 0.0
  }

  test("cosine zero-vector contract: zero-norm cosine is 0.0, not an ANSI crash") {
    // round-8 adversarial sweep: unguarded norm division crashed 15
    // vector-family queries on zero vectors. The contract — zero-norm
    // cosine = 0.0 (orthogonal to everything) — pinned for both forms.
    val df = Seq(
      (1L, Seq(0f, 0f, 0f), Seq(1f, 2f, 3f)),
      (2L, Seq(0f, 0f, 0f), Seq(0f, 0f, 0f)),
      (3L, Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)))
      .toDF("id", "a", "b")
    val c = df.select(col("id"),
        VectorFunctions.cosine(col("a"), col("b")).as("c"))
      .as[(Long, Double)].collect().toMap
    c shouldBe Map(1L -> 0.0, 2L -> 0.0, 3L -> 0.0)
    val cn = df.select(col("id"),
        VectorFunctions.cosineWithNorms(col("a"), col("b"),
          VectorFunctions.vnorm(col("a")), VectorFunctions.vnorm(col("b")))
          .as("c"))
      .as[(Long, Double)].collect().toMap
    cn shouldBe c
  }

  test("vdot rejects non-array inputs with a type error") {
    val df = Seq((1, 2)).toDF("x", "y")
    val e = intercept[Exception] {
      df.select(VectorFunctions.vdot(col("x"), col("y"))).collect()
    }
    e.getMessage.toLowerCase should include("graft_vector_dot")
  }
}
