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

  test("q225's fixed-merge encode matches hand-derived tokenizations") {
    // the q225 catalog query folds graft_pair_merge over a FIXED merge
    // list ((t,h),(th,e),(i,n),(a,n),(an,d),(e,r),(o,n),(r,e),(a,t),
    // (o,r),(e,n),(t,i)); hand cases pin the in-order fold semantics the
    // DuckDB replace-chain oracle replays
    val out = SparkEntry.queries("q225_bpe_encode")(
      spark, "/root/testdata/sf0.001")
    // "the" must collapse to one subword through the chained (t,h)+(th,e)
    // merges — its count equals the corpus frequency of the word itself
    val rows = out.as[(String, Long)].collect().toMap
    val theCount = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") === "the").count()
    if (rows.contains("the")) rows("the") shouldBe theCount
    // fold semantics on canonical words, independent of the corpus
    val chars = expr(
      "transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    val fixed = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
      ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"),
      ("o", "r"), ("e", "n"), ("t", "i"))
    val enc = fixed.foldLeft(chars) { case (acc, (l, r)) =>
      call_function("graft_pair_merge", acc, lit(l), lit(r))
    }
    val got = Seq("there", "and", "thin", "banana").toDF("word")
      .select(col("word"), enc.as("toks"))
      .as[(String, Array[String])].collect().toMap
    got("there") shouldBe Array("the", "re")  // (t,h),(th,e) then (r,e)
    got("and") shouldBe Array("and")          // (a,n) then (an,d)
    got("thin") shouldBe Array("th", "in")    // (t,h) beats later (t,i)
    got("banana") shouldBe Array("b", "an", "an", "a") // leftmost pairs
  }

  test("merges is deterministic across re-runs") {
    BpeTrainer.trainMerges(corpus, 3) shouldBe BpeTrainer.trainMerges(corpus, 3)
  }

  test("maxVocabWords guards the driver fetch; minCount trims the tail") {
    val many = Seq((1 to 50).map(i => s"word$i").mkString(" ")).toDF("text")
    an[IllegalArgumentException] should be thrownBy
      BpeTrainer.trainMerges(many, 2, maxVocabWords = 10)
    // minCount drops hapax words before they reach the driver: only the
    // repeated word remains, so its pairs win every merge
    val mixed = Seq("aaa " * 5 + "zq zr zs zt").toDF("text")
    val m = BpeTrainer.trainMerges(mixed, 2, minCount = 2)
    m shouldBe Seq((0, "a", "a", 10L), (1, "aa", "a", 5L))
  }

  test("a production-scale merge count (k=300) trains in one corpus pass") {
    // 26^2 two-letter "words" with distinct counts: enough pair diversity
    // for 300+ merges. The k-sequential-Spark-jobs structure this replaced
    // would schedule ~300 jobs here; driver-side rounds make this a
    // seconds-scale spec, which is itself the regression assertion.
    val letters = 'a' to 'z'
    val text = (for { a <- letters; b <- letters } yield
      (s"$a$b$a$b " * ((a - 'a') + 2 * (b - 'a') + 1))).mkString(" ")
    val merges = BpeTrainer.trainMerges(Seq(text).toDF("text"), 300)
    merges.length shouldBe 300
    // ranks are dense and counts non-increasing only per pair lineage —
    // but the global argmax sequence must be non-increasing in count
    merges.map(_._1) shouldBe (0 until 300)
    merges.sliding(2).foreach { case Seq(x, y) => x._4 should be >= y._4 }
    // every merge's parts are either single code points or earlier merges
    val known = scala.collection.mutable.Set[String]() ++ text.map(_.toString)
    merges.foreach { case (_, l, r, _) =>
      known should contain(l)
      known should contain(r)
      known += (l + r)
    }
  }
}
