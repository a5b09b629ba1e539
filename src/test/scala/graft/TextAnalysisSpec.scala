package graft

import graft.functions.TextFunctions
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("tokenStats: whitespace tokens drop empties, BPE-ish splits runs") {
    val docs = Seq((1L, "ab1  cd! x9")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenStats(docs).head()
    r.getAs[Int]("n_tokens_ws") shouldBe 3
    // ab,1,cd,!,x,9
    r.getAs[Int]("n_tokens_bpe") shouldBe 6
    r.getAs[Int]("n_chars") shouldBe 11
  }

  test("qualityScore empty-doc contract: empty/token-free text scores 0.0, not an ANSI crash") {
    // round-8 adversarial sweep: empty docs crashed q15/q203 with
    // DIVIDE_BY_ZERO. Contract: 0.0 ratios, 0.0 score.
    val docs = Seq((1L, ""), (2L, "   "), (3L, "the table"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(docs)
      .select("doc_id", "n_tokens", "punct_ratio", "stopword_ratio",
        "quality_score")
      .as[(Long, Double, Double, Double, Double)].collect()
      .map(x => x._1 -> (x._2, x._3, x._4, x._5)).toMap
    r(1L) shouldBe ((0.0, 0.0, 0.0, 0.0))
    r(2L) shouldBe ((0.0, 0.0, 0.0, 0.0)) // spaces: length>0, zero tokens
    r(3L)._1 shouldBe 2.0
  }

  test("qualityScore components are exact ratios") {
    val docs = Seq((1L, "the cat!")).toDF("doc_id", "text") // 8 chars, 1 non-alnum
    val r = TextAnalysis.qualityScore(docs).head()
    r.getAs[Double]("n_tokens") shouldBe 2.0
    r.getAs[Double]("punct_ratio") shouldBe 1.0 / 8.0
    r.getAs[Double]("stopword_ratio") shouldBe 0.5 // "the" of 2 tokens
  }

  test("langId picks the language with most marker hits, en-first tie-break") {
    val docs = Seq(
      (1L, "en", "the cat is on the mat"),
      (2L, "de", "der hund und die katze ist da"),
      (3L, "xx", "zzz qqq www")
    ).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.langId(docs).select("doc_id", "guessed_lang")
      .as[(Long, String)].collect().sortBy(_._1)
    r shouldBe Array((1L, "en"), (2L, "de"), (3L, "unknown"))
  }

  test("fingerprints: normalization collapses case and whitespace") {
    val docs = Seq(
      (1L, "Hello   World"),
      (2L, "hello world"),
      (3L, "different")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.fingerprints(docs)
      .select("doc_id", "fp", "dup_rank").as[(Long, String, Int)]
      .collect().sortBy(_._1)
    r(0)._2 shouldBe r(1)._2 // same normalized content -> same md5
    r(0)._3 shouldBe 1
    r(1)._3 shouldBe 2 // ranked by doc_id within the fp group
    r(2)._2 should not be r(0)._2
  }

  test("rollingHash is order-sensitive where md5-normalized is not") {
    val docs = Seq((1L, "a b"), (2L, "b a")).toDF("doc_id", "text")
    val r = TextAnalysis.rollingFingerprints(docs)
      .select("rolling_fp").as[Long].collect()
    r(0) should not be r(1)
  }

  test("shingles3 produces distinct char 3-grams, empty below 3 chars") {
    val df = Seq(("abcab", 1), ("ab", 2)).toDF("text", "id")
    val r = df.select(TextFunctions.shingles3(col("text")).as("sh"))
      .as[Seq[String]].collect()
    r(0).sorted shouldBe Seq("abc", "bca", "cab") // "abcab": abc,bca,cab (distinct)
    r(1) shouldBe Seq.empty
  }

  test("piiScrub redacts emails and phones and counts matches") {
    val docs = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org or call +1-555-123-4567 now"),
      (2L, "two mails a@b.co c@d.io, no phone"),
      (3L, "clean text, nothing to redact")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.piiScrub(docs).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    r(0)._2 shouldBe "mail me at <EMAIL> or call <PHONE> now"
    r(0)._3 shouldBe 1; r(0)._4 shouldBe 1
    r(1)._2 shouldBe "two mails <EMAIL> <EMAIL>, no phone"
    r(1)._3 shouldBe 2; r(1)._4 shouldBe 0
    r(2)._2 shouldBe "clean text, nothing to redact"
    r(2)._3 shouldBe 0; r(2)._4 shouldBe 0
  }

  test("repetitionScore computes duplicate line/token/trigram fractions") {
    val docs = Seq(
      (1L, "l1\nl1\nl2"),          // 3 lines, 1 duplicate; a single token
      (2L, "x y x y x y x y z"),   // 9 tokens / 3 distinct; 7 trigrams
      (3L, "a b c")                // no repeats at all
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionScore(docs).orderBy("doc_id")
      .as[(Long, Double, Double, Double)].collect()
    r(0)._2 shouldBe (1.0 / 3.0) // one duplicate line of three
    r(0)._3 shouldBe 0.0         // the whole text is one (unique) ws-token
    r(0)._4 shouldBe 0.0
    r(1)._2 shouldBe 0.0
    r(1)._3 shouldBe (6.0 / 9.0) // 9 tokens, 3 distinct
    // trigrams: xyx,yxy,xyx,yxy,xyx,yxy,xyz -> 7 total, 3 distinct -> 4/7
    r(1)._4 shouldBe (4.0 / 7.0)
    r(2)._2 shouldBe 0.0; r(2)._3 shouldBe 0.0; r(2)._4 shouldBe 0.0
  }

  // driver-side reference edit distance for the PassJoin property specs
  private def editDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  test("unigramSurprisal: hand-computed bits, OOV vs the top-k vocab") {
    // corpus: "a" x4, "b" x2, "c" x1, "d" x1  ->  N = 8 (bitlen 4)
    // bits: a -> 4-3=1, b -> 4-2=2, c/d -> 4-1=3
    val docs = Seq(
      (1L, "a a b c"), // 1+1+2+3 = 7 bits over 4 toks
      (2L, "a a b d"), // 7 bits
      (3L, "")         // token-less: drops out
    ).toDF("doc_id", "text")
    val r = TextAnalysis.unigramSurprisal(docs, vocabK = 2)
      .select("doc_id", "n_toks", "n_oov", "surprisal_bits", "avg_bits")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    // vocab top-2 by (count desc, token asc) = {a, b}; c and d are OOV
    r shouldBe Array((1L, 4L, 1L, 7L, 7.0 / 4), (2L, 4L, 1L, 7L, 7.0 / 4))
  }

  test("unigramSurprisal plan: head lookup is a broadcast join") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.unigramSurprisal(docs, 1)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("bigramSurprisal: hand-computed conditional bits") {
    // bigrams: (a,b) x2, (a,c) x1, (b,a) x1, (c,a) x1
    // prefixes: c(a·)=3 (bitlen 2), c(b·)=1 (bitlen 1), c(c·)=1 (bitlen 1)
    // bits: (a,b) -> 2-2=0, (a,c) -> 2-1=1, (b,a) -> 1-1=0, (c,a) -> 1-1=0
    val docs = Seq(
      (1L, "a b a c"),   // bigrams (a,b),(b,a),(a,c): 0+0+1 = 1 bit
      (2L, "c a b"),     // bigrams (c,a),(a,b): 0+0 = 0 bits
      (3L, "x")          // no bigrams: drops out
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bigramSurprisal(docs, hotK = 2)
      .select("doc_id", "n_bigrams", "surprisal_bits", "avg_bits")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    r shouldBe Array((1L, 3L, 1L, 1.0 / 3), (2L, 2L, 0L, 0.0))
  }

  test("bigramSurprisal: hot-head split is invisible in the result") {
    val docs = Seq((1L, "a b a b c"), (2L, "b c a"), (3L, "a b")).toDF("doc_id", "text")
    def run(k: Int) = TextAnalysis.bigramSurprisal(docs, hotK = k)
      .select("doc_id", "n_bigrams", "surprisal_bits")
      .as[(Long, Long, Long)].collect().toSet
    run(1) shouldBe run(1024)
  }

  test("vocabGrowth: cumulative types count each token at its first bucket only") {
    val docs = Seq(
      (0L, "a b"),   // bucket 0: toks a,b -> 2 new
      (1L, "b c"),   // bucket 0: c new   -> bucket 0: n_toks 4, n_new 3
      (2L, "a d"),   // bucket 1: d new   -> n_toks 2, n_new 1
      (5L, "a b c")  // bucket 2: none new -> n_toks 3, n_new 0
    ).toDF("doc_id", "text")
    val r = TextAnalysis.vocabGrowth(docs, width = 2L)
      .select("bucket", "n_toks", "n_new", "cum_toks", "cum_types")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    r shouldBe Array(
      (0L, 4L, 3L, 4L, 3L),
      (1L, 2L, 1L, 6L, 4L),
      (2L, 3L, 0L, 9L, 4L))
  }

  test("lexicalDiversity: hapax and TTR ppm, hand-computed") {
    val docs = Seq(
      (1L, "a a b", "s1"),   // s1: tokens 5, types {a,b,c}: a x3, b x1, c x1
      (2L, "a c", "s1"),
      (3L, "z z z z", "s2")  // s2: tokens 4, 1 type, 0 hapax
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.lexicalDiversity(docs)
      .select("source", "n_tokens", "n_types", "n_hapax", "ttr_ppm", "hapax_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    r shouldBe Array(
      ("s1", 5L, 3L, 2L, 600000L, 666666L),
      ("s2", 4L, 1L, 0L, 250000L, 0L))
  }

  test("ngramNovelty: shared trigram fractions, hand-counted") {
    val docs = Seq(
      (1L, "a b c d"),   // trigrams: "a b c", "b c d"
      (2L, "a b c x"),   // trigrams: "a b c", "b c x"
      (3L, "p q r s t"), // trigrams all unique to doc 3
      (4L, "a b")        // too short -> drops out
    ).toDF("doc_id", "text")
    val r = TextAnalysis.ngramNovelty(docs, 3)
      .select("doc_id", "n_grams", "n_shared", "shared_frac")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    r shouldBe Array(
      (1L, 2L, 1L, 0.5), // "a b c" shared with doc 2
      (2L, 2L, 1L, 0.5),
      (3L, 3L, 0L, 0.0))
  }

  test("ngramNovelty: the hot-gram head is honored via the broadcast split") {
    // hotK = 1 puts only the most frequent gram in the broadcast head;
    // results must be identical to a large-head run (split is invisible)
    val docs = Seq(
      (1L, "x y z w"), (2L, "x y z v"), (3L, "x y z u")
    ).toDF("doc_id", "text")
    val small = TextAnalysis.ngramNovelty(docs, 3, hotK = 1)
      .select("doc_id", "n_grams", "n_shared").as[(Long, Long, Long)]
      .collect().toSet
    val big = TextAnalysis.ngramNovelty(docs, 3, hotK = 1024)
      .select("doc_id", "n_grams", "n_shared").as[(Long, Long, Long)]
      .collect().toSet
    small shouldBe big
    small shouldBe Set((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 1L))
  }

  test("editDistancePairs keeps non-numeric ids intact (no silent cast)") {
    val items = Seq(
      ("doc_a", "kitten"), ("doc_b", "sitten"), ("doc_c", "kitty")
    ).toDF("name", "txt")
    val r = TextAnalysis.editDistancePairs(items, "name", "txt", 1)
      .select("id_1", "id_2", "distance").as[(String, String, Long)]
      .collect().toSet
    r shouldBe Set(("doc_a", "doc_b", 1L)) // kitten~sitten; kitty is 2+ away
  }

  test("editDistancePairs equals brute-force all-pairs (randomized)") {
    // adversarial population: clusters of near-identical strings (random
    // single-char edits), plus unrelated randoms, plus tiny strings for
    // the short arm — over a 3-letter alphabet so collisions are common
    val rng = new scala.util.Random(20260813L)
    val alpha = "abc"
    def rand(n: Int) = (1 to n).map(_ => alpha(rng.nextInt(3))).mkString
    def mutate(s: String): String = rng.nextInt(3) match {
      case 0 if s.nonEmpty => // substitute
        val i = rng.nextInt(s.length)
        s.substring(0, i) + alpha(rng.nextInt(3)) + s.substring(i + 1)
      case 1 => // insert
        val i = rng.nextInt(s.length + 1)
        s.substring(0, i) + alpha(rng.nextInt(3)) + s.substring(i)
      case _ if s.length > 1 => // delete
        val i = rng.nextInt(s.length); s.substring(0, i) + s.substring(i + 1)
      case _ => s
    }
    val strings =
      (1 to 12).flatMap { _ =>
        val base = rand(4 + rng.nextInt(12))
        base +: (1 to 3).map(_ => mutate(if (rng.nextBoolean()) base
          else mutate(base)))
      } ++ (1 to 20).map(_ => rand(3 + rng.nextInt(10))) ++
        Seq("", "a", "ab", "ba", "b")
    val df = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("item_id", "name")
    for (k <- 1 to 3) {
      val expected = (for {
        i <- strings.indices; jj <- strings.indices if i < jj
        d = editDist(strings(i), strings(jj)) if d <= k
      } yield (i.toLong, jj.toLong, d.toLong)).toSet
      val got = TextAnalysis.editDistancePairs(df, "item_id", "name", k)
        .as[(Long, Long, Long)].collect().toSet
      withClue(s"k=$k: ") { got shouldBe expected }
    }
  }

  test("epoch plan: budget conservation and cap arithmetic (q323 invariants)") {
    val r = SparkEntry.queries("q323_epoch_plan")(spark,
      "/root/testdata/sf0.001")
      .select("unique_tokens", "requested_tokens", "epochs_milli",
        "granted_tokens", "shortfall_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
    r.length should be > 1
    val requested = r.map(_._2).distinct
    requested.length shouldBe 1 // uniform split
    r.foreach { case (u, req, em, granted, short) =>
      em shouldBe (1000L * req) / u
      granted shouldBe math.min(req, 6 * u)
      short shouldBe math.max(0L, req - 6 * u)
      (granted + short) shouldBe req
    }
  }

  test("editDistanceCandidatePairs: lossless superset, real prune power") {
    // the pre-verify candidate frame the PassJoin stages produce:
    // pigeonhole guarantees every true <= k pair appears (losslessness),
    // and on a mixed population the prefix machinery must prune far
    // below all-pairs (the operator's entire reason to exist)
    val strings = (1 to 30).map(i => f"item-$i%03d-" + ("x" * (i % 7))) ++
      (1 to 10).map(i => s"unrelated-string-number-$i-with-padding")
    val df = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("item_id", "name")
    val cand = TextAnalysis.editDistanceCandidatePairs(df, "item_id", "name", 2)
      .select(least(col("id_r"), col("id_s")).as("a"),
        greatest(col("id_r"), col("id_s")).as("b"))
      .as[(Long, Long)].collect().toSet
    val verified = TextAnalysis.editDistancePairs(df, "item_id", "name", 2)
      .select("id_1", "id_2").as[(Long, Long)].collect().toSet
    verified.subsetOf(cand) shouldBe true
    val allPairs = strings.length.toLong * (strings.length - 1) / 2
    cand.size.toLong should be < allPairs // genuinely prunes
  }

  test("phraseSearch: adjacency, overlaps, and repeated-term phrases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the table scan wins"),       // one match at pos 1
      (2L, "table  scan table scan"),    // two matches (double space drops)
      (3L, "scan table"),                // reversed order: no match
      (4L, "table x scan"),              // gap: no match
      (5L, "table scan table scan table scan") // three matches
    ).toDF("doc_id", "text")
    val got = TextAnalysis.phraseSearch(docs, Seq("table", "scan"))
      .as[(Long, Long, Long)].collect().toSet
    got shouldBe Set((1L, 1L, 1L), (2L, 2L, 0L), (5L, 3L, 0L))

    // repeated phrase term: "a a" must match overlapping runs correctly
    val rep = Seq((1L, "a a a"), (2L, "a b a"), (3L, "b a a b"))
      .toDF("doc_id", "text")
    val got2 = TextAnalysis.phraseSearch(rep, Seq("a", "a"))
      .as[(Long, Long, Long)].collect().toSet
    got2 shouldBe Set((1L, 2L, 0L), (3L, 1L, 1L))

    // single-term phrase degenerates to term occurrence counting
    val got3 = TextAnalysis.phraseSearch(docs, Seq("table"))
      .as[(Long, Long, Long)].collect().toSet
    got3 shouldBe Set((1L, 1L, 1L), (2L, 2L, 0L), (3L, 1L, 1L),
      (4L, 1L, 0L), (5L, 3L, 0L))
  }

  test("q224 feature hashing matches a driver-side md5 replication") {
    // replicate bucket/sign from first principles (java MessageDigest,
    // not Spark's md5) for one real document, so the query's hashing
    // convention is pinned independently of the engine
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val doc = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].head()
    val expected = doc._2.split(" ").filter(_.nonEmpty).toSeq
      .map(t => md5hex(t))
      .groupBy(h => h.substring(0, 2))
      .map { case (b, hs) =>
        b -> hs.map(h => if (h.charAt(2) < '8') 1L else -1L).sum
      }
      .filter(_._2 != 0L)
    val got = SparkEntry.queries("q224_feature_hashing")(
        spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") === doc._1)
      .as[(Long, String, Long)].collect()
      .map { case (_, b, w) => b -> w }.toMap
    got shouldBe expected
  }

  test("editDistancePairs plan: candidates come from an equi-join, no block key") {
    val df = (1 to 50).map(i => (i.toLong, s"part name number $i"))
      .toDF("item_id", "name")
    val plan = TextAnalysis.editDistancePairs(df, "item_id", "name", 2)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    // the long arm joins on (seg, j, l_r); only the bounded short arm may
    // plan a non-equi broadcast join (empty here: no strings of len <= 2)
    plan should include regex "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[seg"
  }
}
