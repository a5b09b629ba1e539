package graft

import graft.operators.BpeTrainer
import org.apache.spark.sql.functions._

class BpeTrainerSpec extends SparkTestBase {
  import spark.implicits._

  // the textbook BPE corpus: low x5, lower x2, newest x6, widest x3
  private def corpus = Seq(
    ((("low " * 5) + ("lower " * 2) + ("newest " * 6) + ("widest " * 3)).trim)
  ).toDF("text")

  test("trainMerges reproduces the hand-computed merge sequence") {
    val merges = BpeTrainer.trainMerges(corpus, 5)
    merges shouldBe Seq(
      (0, "e", "s", 9L),   // es=9 ties st=9, (e,s) < (s,t)
      (1, "es", "t", 9L),
      (2, "l", "o", 7L),   // lo=7 ties ow=7, (l,o) < (o,w)
      (3, "lo", "w", 7L),
      (4, "e", "w", 6L))   // ew=6 ties ne/w·est, (e,w) smallest
  }

  test("training stops early when no pairs remain") {
    val tiny = Seq("ab ab").toDF("text")
    val merges = BpeTrainer.trainMerges(tiny, 10)
    merges shouldBe Seq((0, "a", "b", 2L)) // then every word is one symbol
  }

  test("graft_pair_merge rewrites non-overlapping adjacent pairs") {
    val r = Seq(Tuple1(Array("a", "a", "a", "b"))).toDF("syms")
      .select(call_function("graft_pair_merge",
        col("syms"), lit("a"), lit("a")).as("m"))
      .as[Array[String]].head()
    r shouldBe Array("aa", "a", "b") // left-to-right, non-overlapping
  }

  test("encode applies trained merges in rank order") {
    val merges = BpeTrainer.trainMerges(corpus, 5)
    val enc = BpeTrainer.encode(corpus, merges)
      .as[(String, Array[String])].collect().toMap
    enc("low") shouldBe Array("low")              // l+o then lo+w
    enc("newest") shouldBe Array("n", "ew", "est") // es, es+t, e+w
    enc("widest") shouldBe Array("w", "i", "d", "est")
    enc("lower") shouldBe Array("low", "e", "r")
  }

  test("merges is deterministic across re-runs") {
    BpeTrainer.trainMerges(corpus, 3) shouldBe BpeTrainer.trainMerges(corpus, 3)
  }
}
