package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Property-style tests (fixed-seed random inputs) for the custom codegen'd
  * kernels: on arbitrary inputs they must agree exactly with the built-in
  * formulations they replace.
  */
class KernelPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val rng = new scala.util.Random(20240812L)

  test("property: vdot == fold for arbitrary lengths and values") {
    val pairs = (1 to 100).map { _ =>
      val n = rng.nextInt(129) // 0..128, includes empty vectors
      (Array.fill(n)(rng.nextFloat() * 200f - 100f),
        Array.fill(n)(rng.nextFloat() * 200f - 100f))
    }
    val rows = pairs.toDF("a", "b").select(
      VectorFunctions.vdot(col("a"), col("b")).as("fast"),
      VectorFunctions.vdotFold(col("a"), col("b")).as("fold"))
      .as[(Double, Double)].collect()
    rows.foreach { case (fast, fold) => assert(fast == fold) }
  }

  test("property: vdot == fold on length-mismatched arrays (both clamp to shorter)") {
    val pairs = (1 to 50).map { _ =>
      val (na, nb) = (rng.nextInt(65), rng.nextInt(65)) // usually unequal
      (Array.fill(na)(rng.nextFloat() * 10f), Array.fill(nb)(rng.nextFloat() * 10f))
    }
    val rows = pairs.toDF("a", "b").select(
      VectorFunctions.vdot(col("a"), col("b")).as("fast"),
      VectorFunctions.vdotFold(col("a"), col("b")).as("fold"))
      .as[(Double, Double)].collect()
    rows.foreach { case (fast, fold) => assert(fast == fold) } // never null/NaN
  }

  test("property: sorted_intersect_count == size(array_intersect)") {
    def sortedSet() = Array.fill(rng.nextInt(201))(
      rng.nextLong() % 1000L).distinct.sorted
    val pairs = (1 to 200).map(_ => (sortedSet(), sortedSet()))
    val rows = pairs.toDF("a", "b").select(
      call_function("graft_sorted_intersect_count", col("a"), col("b")).as("fast"),
      org.apache.spark.sql.functions.size(array_intersect(col("a"), col("b"))).as("builtin"))
      .as[(Int, Int)].collect()
    rows.foreach { case (fast, builtin) => assert(fast == builtin) }
  }

  test("property: moneySum invariant under partition count") {
    (1 to 3).foreach { _ =>
      val vals = List.fill(200)(rng.nextDouble() * 2e6 - 1e6)
      val results = Seq(1, 3, 17).map { n =>
        vals.toDF("v").repartition(n)
          .agg(graft.functions.ExactAgg.moneySum(col("v")).as("s"))
          .as[Double].head()
      }
      assert(results.distinct.size == 1)
    }
  }

  test("property: sorted_collect == sort_array(collect_list) under any partitioning") {
    val rows = (1L to 500L).map(i => (i % 7, i * 31 % 97))
    Seq(1, 3, 16).foreach { n =>
      val df = rows.toDF("k", "v").repartition(n)
      val got = df.groupBy("k")
        .agg(call_function("graft_sorted_collect", col("v")).as("s"))
        .as[(Long, Array[Long])].collect().toMap
      val want = rows.groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(_._2).sorted.toArray }
      got.keySet shouldBe want.keySet
      got.foreach { case (k, s) => assert(s.toSeq == want(k).toSeq) }
    }
  }

  test("property: normText kernel+fallback == built-in lower/regex/trim chain") {
    val pieces = Array("Hello", "WORLD", "tab\there", "nl\nthere", "  ",
      "\t\t", "\r\n", "x", "ÜBER", "naïve", " nbsp", "émigré", "123",
      "MiXeD CaSe", "vtab", "\f", "ünïcode WS line")
    val texts = (1 to 300).map { _ =>
      (0 to rng.nextInt(8)).map(_ => pieces(rng.nextInt(pieces.length)))
        .mkString(" ")
    } :+ "" :+ "   " :+ "\t\n\r"
    val rows = texts.toDF("t").select(
      graft.functions.TextFunctions.normText(col("t")).as("fused"),
      trim(regexp_replace(lower(col("t")), "\\s+", " ")).as("builtin"))
      .as[(String, String)].collect()
    rows.foreach { case (fused, builtin) => assert(fused == builtin) }
  }

  test("property: occurrence_mix preserves multiset intersection = sum of min counts") {
    // small value domain forces real multiplicities and real overlaps
    def multiset() = Array.fill(rng.nextInt(151))(rng.nextInt(30).toLong).sorted
    val pairs = (1 to 200).map(_ => (multiset(), multiset()))
    val rows = pairs.toDF("a", "b").select(
      call_function("graft_sorted_intersect_count",
        call_function("graft_occurrence_mix", col("a")),
        call_function("graft_occurrence_mix", col("b"))).as("fast"),
      col("a"), col("b")).as[(Int, Array[Long], Array[Long])].collect()
    rows.foreach { case (fast, a, b) =>
      val ca = a.groupBy(identity).view.mapValues(_.length)
      val cb = b.groupBy(identity).view.mapValues(_.length).toMap
      val sumMin = ca.map { case (v, n) => math.min(n, cb.getOrElse(v, 0)) }.sum
      assert(fast == sumMin)
    }
  }

  test("property: bloom probe agrees between codegen and interpreted paths") {
    val keys = (1 to 300).map(_ => rng.nextLong() % 100000L)
    val bloomBytes = graft.operators.BloomJoin.buildBloom(
      keys.map(Tuple1(_)).toDF("k"), "k", 1000L, 0.01)
    // probe the build keys THEMSELVES plus randoms — hits(k) below must
    // exist for every build key, so a false negative actually fails
    val probes = (keys ++ (1 to 500).map(_ => rng.nextLong() % 100000L))
      .map(Tuple1(_)).toDF("k")
    def run(codegen: String): Seq[(Long, Boolean)] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try probes.select(col("k"),
          call_function("graft_bloom_might_contain", col("k"), lit(bloomBytes))
            .as("hit"))
        .as[(Long, Boolean)].collect().sortBy(_._1).toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    val gen = run("true")
    val interp = run("false")
    gen shouldBe interp
    // and every build key hits in both paths (no false negatives, ever)
    val hits = gen.toMap
    keys.foreach(k => assert(hits(k)))
  }

  test("property: occurrence_mix output is sorted, distinct, and size-preserving") {
    def multiset() = Array.fill(rng.nextInt(151))(rng.nextInt(20).toLong).sorted
    val rows = (1 to 100).map(_ => Tuple1(multiset())).toDF("a")
      .select(call_function("graft_occurrence_mix", col("a")).as("ex"), col("a"))
      .as[(Array[Long], Array[Long])].collect()
    rows.foreach { case (ex, a) =>
      assert(ex.length == a.length)
      assert(ex.toSeq == ex.sorted.toSeq)
      assert(ex.distinct.length == ex.length)
    }
  }

  test("property: canaryScan occurrence identity == brute non-overlapping count") {
    // the replace-length identity counts LEFTMOST non-overlapping
    // occurrences — exactly what a sequential indexOf walk counts
    def brute(text: String, needle: String): Long = {
      var i = 0; var n = 0L
      while ({ i = text.indexOf(needle, i); i >= 0 }) { n += 1; i += needle.length }
      n
    }
    val alphabet = "abab "
    val canaries = Seq("ab", "aba", "b a")
    val docs = (1 to 120).map { i =>
      (i.toLong, Array.fill(rng.nextInt(40))(
        alphabet(rng.nextInt(alphabet.length))).mkString)
    }
    val got = graft.operators.TextAnalysis.canaryScan(
      docs.toDF("doc_id", "text"), canaries)
      .as[(String, Long, Long)].collect()
      .map { case (c, d, o) => c -> (d, o) }.toMap
    canaries.foreach { c =>
      val expOcc = docs.map(d => brute(d._2, c)).sum
      val expDocs = docs.count(d => d._2.contains(c)).toLong
      assert(got(c) == ((expDocs, expOcc)),
        s"canary '$c': got ${got(c)}, want ($expDocs, $expOcc)")
    }
  }
}
