package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions.{call_function, col, lit}

class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  private def winnow(text: String, k: Int, w: Int): Seq[Long] =
    Seq(Tuple1(text)).toDF("text")
      .select(call_function("graft_winnow", col("text"), lit(k), lit(w)))
      .as[Seq[Long]].head()

  /** Reference mirror: full k-gram hash table, then min per window. */
  private def brute(text: String, k: Int, w: Int): Set[Long] = {
    val n = text.length - k + 1
    if (n < w) return Set.empty
    val hashes = (0 until n).map { i =>
      text.substring(i, i + k).foldLeft(-1L)((acc, c) =>
        if (acc < 0) c.toLong else (acc * 257L + c.toLong) % 1000000007L)
    }
    (0 to n - w).map(j => hashes.slice(j, j + w).min).toSet
  }

  test("winnow hashes CODE POINTS: supplementary-plane text matches the codepoint reference") {
    // each emoji is 2 UTF-16 units but ONE code point — the round-8
    // adversarial sweep caught the kernel hashing units, which silently
    // weakened the winnowing guarantee on any non-BMP text. The contract
    // is pinned here against a codepoint-based reference so the
    // adversarial corpus isn't the only thing holding it.
    val text = "😀a😁b😂c" +
      "😃d😄e😅f"
    val cps = text.codePoints().toArray
    val k = 3; val w = 2
    val n = cps.length - k + 1
    val hashes = (0 until n).map { i =>
      (0 until k).foldLeft(-1L)((acc, j) =>
        if (acc < 0) cps(i + j).toLong
        else (acc * 257L + cps(i + j).toLong) % 1000000007L)
    }
    val expect = (0 to n - w).map(j => hashes.slice(j, j + w).min).toSet
    winnow(text, k, w).toSet shouldBe expect
    // and it must NOT equal the UTF-16-unit reference (12 units vs 18...
    // different window count and hash values — the old bug's fingerprint)
    winnow(text, k, w).toSet should not be brute(text, k, w)
  }

  test("winnow equals the brute-force window-minima set") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaa", // degenerate: all k-grams equal
      "abcdefghijklmnopqrstuvwxyz0123456789")
    texts.foreach { t =>
      withClue(s"text='$t': ") {
        winnow(t, 5, 4).toSet shouldBe brute(t, 5, 4)
        winnow(t, 5, 4) shouldBe winnow(t, 5, 4).sorted // sorted contract
      }
    }
  }

  test("winnow guarantee: a shared w+k-1-char run shares a fingerprint") {
    val k = 5; val w = 4
    val run = "SHAREDRUNX" * 2 // 20 chars >= w+k-1 = 8
    val a = s"left padding text $run and a tail"
    val b = s"completely different prefix $run other suffix"
    winnow(a, k, w).toSet.intersect(winnow(b, k, w).toSet) should not be empty
  }

  test("winnow: documents with no full window yield an empty array, not null") {
    winnow("short", 5, 4) shouldBe Seq.empty
    winnow("exactly8", 8, 2) shouldBe Seq.empty // one hash < w windows
  }

  test("winnowPairs finds the verbatim-copy pair and respects the df cap") {
    val shared = "this exact paragraph is copied between the two documents verbatim"
    val docs = Seq(
      (1L, s"unique lead-in. $shared. first tail."),
      (2L, s"another opening: $shared? second ending!"),
      (3L, "totally unrelated content with nothing in common at all here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, 8, 8, 3L, 64L)
      .as[(Long, Long, Long)].collect()
    pairs.map(p => (p._1, p._2)).toSet shouldBe Set((1L, 2L))
    // a df cap of 1 drops every shared fingerprint -> no pairs survive
    Dedup.winnowPairs(docs, 8, 8, 1L, 1L).count() shouldBe 0L
  }
}
