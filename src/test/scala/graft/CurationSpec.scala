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

  test("sequencePack bins by running token offset within each language") {
    val tiny = Seq(
      (1L, "en", "a b c"),          // en offsets: 0
      (2L, "en", "d e f g"),        // 3 -> still pack 0
      (3L, "en", "h i j"),          // 7 -> crosses into pack 1 at cap 8
      (4L, "de", "x y")             // independent de sequence
    ).toDF("doc_id", "lang", "text")
    val r = Curation.sequencePack(tiny, 8).orderBy("doc_id")
      .as[(Long, String, Long, Long, Long)].collect()
    r(0) shouldBe ((1L, "en", 3L, 0L, 0L))
    r(1) shouldBe ((2L, "en", 4L, 0L, 3L))
    r(2) shouldBe ((3L, "en", 3L, 0L, 7L)) // starts at offset 7 of pack 0
    r(3) shouldBe ((4L, "de", 2L, 0L, 0L))
  }

  test("trainValTestSplit sends exact duplicates to the same split") {
    val r = Curation.trainValTestSplit(docs, 85, 85)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // docs 1 and 2 normalize identically -> identical split
    r(1L) shouldBe r(2L)
    // re-run reproduces the assignment exactly
    val r2 = Curation.trainValTestSplit(docs, 85, 85)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    r2 shouldBe r
    // full-range buckets cover every doc
    r.size shouldBe 4
    // 256 test buckets -> everything is 'test'; 0 -> nothing is
    Curation.trainValTestSplit(docs, 256, 0)
      .filter(col("split") =!= "test").count() shouldBe 0L
    Curation.trainValTestSplit(docs, 0, 0)
      .filter(col("split") =!= "train").count() shouldBe 0L
  }

  test("chunkFixed covers the text with overlapping windows") {
    val tiny = Seq((1L, "abcdefghij")).toDF("doc_id", "text") // 10 chars
    val r = Curation.chunkFixed(tiny, 4, 3)
      .select("chunk_id", "chunk").as[(Long, String)].collect().sortBy(_._1)
    r shouldBe Array((0L, "abcd"), (1L, "defg"), (2L, "ghij"), (3L, "j"))
    // stride == width -> exact partition, no overlap
    val part = Curation.chunkFixed(tiny, 5, 5)
      .select("chunk").as[String].collect().sorted
    part.mkString shouldBe "abcdefghij"
    // empty text still yields one (empty) chunk row, never zero rows
    val empty = Seq((1L, "")).toDF("doc_id", "text")
    Curation.chunkFixed(empty, 4, 3).count() shouldBe 1L
  }

  test("lengthTrim keeps rows inside the per-language percentile window") {
    val tiny = (1 to 100).map(i => (i.toLong, "en", i.toLong)) :+
      (101L, "de", 7L)
    val df = tiny.toDF("doc_id", "lang", "n_chars")
    val r = Curation.lengthTrim(df, 0.05, 0.95)
      .filter(col("lang") === "en").agg(
        org.apache.spark.sql.functions.min("n_chars"),
        org.apache.spark.sql.functions.max("n_chars"))
      .as[(Long, Long)].head()
    // percentile_disc picks actual corpus values: 5 and 95
    r shouldBe ((5L, 95L))
    // a single-row language is its own 5th and 95th percentile -> kept
    Curation.lengthTrim(df, 0.05, 0.95)
      .filter(col("lang") === "de").count() shouldBe 1L
  }

  test("chunkTokens windows the token stream with overlap") {
    val tiny = Seq((1L, "a b c d e f g")).toDF("doc_id", "text") // 7 tokens
    val r = Curation.chunkTokens(tiny, 4, 3)
      .select("window_id", "window_text", "n_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    r shouldBe Array((0L, "a b c d", 4L), (1L, "d e f g", 4L), (2L, "g", 1L))
    // multiple spaces produce no empty tokens
    val spaced = Seq((1L, "a  b")).toDF("doc_id", "text")
    Curation.chunkTokens(spaced, 8, 8)
      .select("window_text").as[String].head() shouldBe "a b"
  }

  test("balancedSample returns exactly k per group, deterministically") {
    val many = (1 to 50).map(i => (i.toLong, if (i % 2 == 0) "en" else "de",
      s"document number $i with some text"))
    val df = many.toDF("doc_id", "lang", "text")
    val r = Curation.balancedSample(df, "lang", 5)
    r.groupBy("lang").count().as[(String, Long)].collect().toMap shouldBe
      Map("en" -> 5L, "de" -> 5L)
    // same pick on re-run (content-hash order, no RNG)
    val again = Curation.balancedSample(df, "lang", 5)
      .select("doc_id").as[Long].collect().sorted
    again shouldBe r.select("doc_id").as[Long].collect().sorted
    // k larger than the group keeps the whole group
    Curation.balancedSample(df, "lang", 100).count() shouldBe 50L
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

  test("segmentDedup keeps only the first occurrence of each segment") {
    // segTokens=2: doc 1 = [a b][c d], doc 2 = [a b][x y], doc 3 = [c d]
    // first occurrences: (1,0) a b, (1,1) c d, (2,1) x y
    val tiny = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "c d"),
      (4L, "")               // empty: no segments, no row
    ).toDF("doc_id", "text")
    val r = Curation.segmentDedup(tiny, 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    r shouldBe Array(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "x y"),    // "a b" seen first in doc 1
      (3L, 1L, 0L, ""))       // every segment already seen
  }

  test("segmentDedup order: reassembly follows seg_idx, trailing partials kept") {
    val tiny = Seq((1L, "p q r s t")).toDF("doc_id", "text") // [p q][r s][t]
    val r = Curation.segmentDedup(tiny, 2)
      .as[(Long, Long, Long, String)].collect()
    r shouldBe Array((1L, 3L, 3L, "p q r s t"))
  }

  test("boilerplateStrip removes segments shared by >= minDocs documents") {
    // "h h" appears in 3 docs (boilerplate at minDocs=3); "a b" in 2 (kept)
    val tiny = Seq(
      (1L, "h h a b"),
      (2L, "h h a b"),
      (3L, "h h z z"),
      (4L, "u v")
    ).toDF("doc_id", "text")
    val r = Curation.boilerplateStrip(tiny, 2, minDocs = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    r shouldBe Array(
      (1L, 2L, 1L, "a b"),
      (2L, 2L, 1L, "a b"),
      (3L, 2L, 1L, "z z"),
      (4L, 1L, 0L, "u v"))
  }

  test("q213 stratified k-fold: within-stratum fold sizes differ by <= 1") {
    val sizes = SparkEntry.queries("q213_stratified_kfold")(
        spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).values
    sizes.foreach { strat =>
      val counts = strat.map(_._3)
      (counts.max - counts.min) should be <= 1L
      strat.map(_._2).sorted shouldBe (0L until strat.length.toLong).toArray
    }
  }

  test("q212 leakage-safe split: no near-dup component straddles the split") {
    val r = SparkEntry.queries("q212_leakage_split")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, String)].collect()
    r.groupBy(_._2).values.foreach { comp =>
      comp.map(_._3).distinct.length shouldBe 1
    }
    // both sides populated on the test corpus
    r.map(_._3).distinct.sorted shouldBe Array("test", "train")
  }
}
