package graft

import graft.operators.Curation
import org.apache.spark.sql.functions.col

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog again and again it goes"),
    (2L, "en", "The  Quick Brown Fox jumps over the lazy dog again and again it goes"), // dup of 1
    (3L, "en", "tiny"),                                     // too short
    (4L, "en", "lots of !!! punctuation ??? everywhere !!! in *** this &&& doc %%% here ###")
  ).toDF("doc_id", "lang", "text")

  test("contentSample decisions are a pure function of content") {
    val all = "0123456789abcdef".map(_.toString)
    val r = Curation.contentSample(docs, all).count()
    r shouldBe 4 // full hex range keeps everything
    val sampled = Curation.contentSample(docs, all.take(8))
      .select("doc_id").as[Long].collect().toSet
    // duplicates 1 and 2 normalize to the same content -> same decision
    sampled.contains(1L) shouldBe sampled.contains(2L)
  }

  test("curate filters, dedups, and samples in one pipeline") {
    val r = Curation.curate(docs, 5, 100, 0.10, "0123456789abcdef".map(_.toString))
    val kept = r.select("doc_id").as[Long].collect().sorted
    // 3 fails length; 4 fails punct; of the {1,2} dup group, min doc_id wins
    kept shouldBe Array(1L)
    r.select("n_tokens").as[Long].head() shouldBe 14L
  }

  test("vocabTopK ranks tokens by frequency with deterministic ties") {
    val tiny = Seq((1L, "a b b c c c")).toDF("doc_id", "text")
    val r = Curation.vocabTopK(tiny, 2).as[(String, Long)].collect()
    r shouldBe Array(("c", 3L), ("b", 2L))
  }

  test("tokenCorpusStats computes exact tf and df per token") {
    val tiny = Seq(
      (1L, "a a b"),   // a: tf 2 here
      (2L, "a c c"),
      (3L, "b b b c")
    ).toDF("doc_id", "text")
    val r = Curation.tokenCorpusStats(tiny, 10)
      .as[(String, Long, Long)].collect()
    // tf desc, token asc: b tf=4 df=2, c tf=3 df=2, a tf=3 df=2
    r shouldBe Array(("b", 4L, 2L), ("a", 3L, 2L), ("c", 3L, 2L))
  }
}
