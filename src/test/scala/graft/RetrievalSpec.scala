package graft

import graft.operators.Retrieval

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  // 4 docs, dl = 4/4/2/3, query terms {cat, dog}
  private def docs = Seq(
    (1L, "cat dog cat fish"), // tf(cat)=2 tf(dog)=1
    (2L, "dog dog dog dog"),  // tf(dog)=4
    (3L, "fish bird"),        // no query terms
    (4L, "cat fish fish")     // tf(cat)=1
  ).toDF("doc_id", "text")

  /** Reference BM25 mirror of Retrieval.bm25's integer formulation:
    * rational idf, cleared-fraction tf-part, per-term micro-rounding.
    */
  private def expectedMicro(tfs: Seq[(Long, Long)], dl: Long,
                            n: Long, sumDl: Long): Long =
    tfs.map { case (tf, df) =>
      if (tf == 0L) 0L
      else {
        val idf = (2L * n - 2L * df + 1L).toDouble / (2L * df + 1L)
        val num = (tf * 22000L * sumDl).toDouble
        val den = 10000L * sumDl * tf + 3000L * sumDl + 9000L * dl * n
        math.floor(idf * (num / den) * 1000000L + 0.5).toLong
      }
    }.sum

  test("bm25 matches the closed-form integer formulation exactly") {
    val r = Retrieval.bm25(docs, Seq("cat", "dog"))
      .as[(Long, Long, Long)].collect()
    val n = 4L; val sumDl = 13L // 4+4+2+3
    // df(cat)=2 (docs 1,4), df(dog)=2 (docs 1,2)
    val exp = Map(
      1L -> expectedMicro(Seq((2L, 2L), (1L, 2L)), 4L, n, sumDl),
      2L -> expectedMicro(Seq((0L, 2L), (4L, 2L)), 4L, n, sumDl),
      4L -> expectedMicro(Seq((1L, 2L), (0L, 2L)), 3L, n, sumDl))
    r.map(_._1).toSet shouldBe exp.keySet // doc 3 (no terms) dropped
    r.foreach { case (id, _, score) => score shouldBe exp(id) }
    // ordering is (score desc, doc_id asc)
    r.map(_._3).toSeq shouldBe r.map(_._3).toSeq.sorted.reverse
  }

  test("bm25 ranks higher tf above lower tf at equal dl, and respects topK") {
    val same = Seq(
      (1L, "cat cat cat fish"),
      (2L, "cat fish fish fish"),
      (3L, "cat cat fish fish")
    ).toDF("doc_id", "text")
    val r = Retrieval.bm25(same, Seq("cat"), topK = 2)
      .as[(Long, Long, Long)].collect()
    r.map(_._1).toSeq shouldBe Seq(1L, 3L) // tf 3 > 2 > 1, capped at 2
    r(0)._3 should be > r(1)._3
  }

  test("bm25 idf weights rarer terms higher at equal tf and dl") {
    val corpus = Seq(
      (1L, "rare common pad1 pad2"),
      (2L, "common pad3 pad4 pad5"),
      (3L, "common pad6 pad7 pad8"),
      (4L, "pad9 padA padB padC")
    ).toDF("doc_id", "text")
    // doc 1 holds both terms once at the same dl: rare (df=1) must
    // contribute more than common (df=3)
    val both = Retrieval.bm25(corpus, Seq("rare"))
      .union(Retrieval.bm25(corpus, Seq("common")))
      .filter($"doc_id" === 1L).as[(Long, Long, Long)].collect()
    both(0)._3 should be > both(1)._3
  }

  test("tfidfCosinePairs: hand-computed weights, identical docs at cos 1.0") {
    val corpus = Seq(
      (1L, "apple banana"),
      (2L, "apple banana"),
      (3L, "cherry date")
    ).toDF("doc_id", "text")
    // N=3; df(apple)=df(banana)=2 -> idf_c = 300//2 = 150; weights 150
    // each; dot(1,2) = 2*150² = 45000 = both norms² -> cos exactly 1.0;
    // doc 3 shares no token with anyone
    val r = Retrieval.tfidfCosinePairs(corpus, dfCap = 50, minCos = 0.5)
      .as[(Long, Long, Long, Double)].collect()
    r shouldBe Array((1L, 2L, 45000L, 1.0))
  }

  test("tfidfCosinePairs: the df cap drops stopword postings before pairing") {
    val corpus = Seq(
      (1L, "the apple"), (2L, "the banana"), (3L, "the cherry")
    ).toDF("doc_id", "text")
    // 'the' has df=3: with the cap at 2 it never reaches the pair join,
    // and no other token is shared -> zero pairs
    Retrieval.tfidfCosinePairs(corpus, dfCap = 2, minCos = 0.0)
      .count() shouldBe 0L
  }

  test("tfidfCosinePairs plan: token equi-join, no cartesian product") {
    val corpus = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val plan = Retrieval.tfidfCosinePairs(corpus, 50, 0.1)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should include regex "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"
  }
}
