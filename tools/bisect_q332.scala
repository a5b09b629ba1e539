// q332 sig-build memory bisect (round 11): replicate md5AffineLshPairs's
// sig0 aggregate over the weighted occurrence expansion EXACTLY (same
// expression shapes; screen constants replaced by arbitrary 60-bit
// literals — memory behavior, not oracle equality, is under test) and
// materialize it alone at sf10 on the 8 g protocol heap. Drive with:
//   SPARK_LOCAL_IP=127.0.0.1 /opt/spark/bin/spark-shell \
//     --master local[32] --driver-memory 8g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false \
//     --jars target/scala-2.13/<jar> < tools/bisect_q332.scala
// Set BISECT_STAGE env to sig | banded | cand.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
graft.GraftFunctions.register(spark)
val stage = sys.env.getOrElse("BISECT_STAGE", "sig")
val dir = sys.env.getOrElse("BISECT_DIR", "/root/repo/testdata-ext/sf10")
val parts = 32
val numHashes = 128
val bands = 16
val rows = numHashes / bands
val docs = spark.read.parquet(s"$dir/documents.parquet")
val elems = docs.select(col("doc_id"), col("text")).repartition(parts, col("doc_id")).select(col("doc_id"), explode(graft.functions.TextFunctions.shinglesMultiW(graft.functions.TextFunctions.normText(col("text")), 5)).as("g")).groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("tf")).select(col("doc_id"), col("g"), explode(sequence(lit(1L), col("tf"))).as("k")).select(col("doc_id"), concat(col("g"), lit("#"), col("k").cast("string")).as("e"))
val hx = md5(col("e").cast("binary"))
val h1 = conv(hx.substr(1, 15), 16, 10).cast("long")
val h2 = conv(hx.substr(16, 13), 16, 10).cast("long")
val hashed = elems.select(col("doc_id"), h1.as("h1"), h2.as("h2"))
val AffineP = 2305843009213693951L
val minCols = (0 until numHashes).map { k => min((col("h1") + lit(k.toLong) * col("h2")) % AffineP).as(s"m$k") }
val smCols = (0 until 64).map { k => min(col("h1").bitwiseXOR(lit(0x0123456789abcdL + k * 0x9e3779b97f4aL))).as(s"sm$k") }
val sig0 = hashed.groupBy(col("doc_id")).agg(array_sort(collect_set(col("h1"))).as("hs"), (minCols ++ smCols): _*).withColumn("n", size(col("hs")).cast("long"))
def pack(off: Int) = (0 until 32).map(i => shiftleft(col(s"sm${off + i}") % 4, 2 * i)).reduce(_ bitwiseOR _)
val sig = sig0.withColumn("bb0", pack(0)).withColumn("bb1", pack(32)).drop((0 until 64).map(k => s"sm$k"): _*)
val t0 = System.nanoTime()
if (stage == "sig") { sig.write.mode("overwrite").format("noop").save() }
val sigC = if (stage == "sig") sig else sig.localCheckpoint(false)
val bandKeys = (0 until bands).map { b => concat_ws(":", (0 until rows).map(r => col(s"m${b * rows + r}")): _*) }
val banded = sigC.select(col("doc_id"), col("n"), posexplode(array(bandKeys: _*)).as(Seq("band", "key")))
if (stage == "banded") { banded.write.mode("overwrite").format("noop").save() }
if (stage == "cand") { val c = banded.as("a").join(banded.as("b"), col("a.band") === col("b.band") && col("a.key") === col("b.key") && col("a.doc_id") < col("b.doc_id") && col("a.n") * 0.6 <= col("b.n") && col("b.n") * 0.6 <= col("a.n")).select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct(); c.write.mode("overwrite").format("noop").save() }
if (stage == "audit") { banded.groupBy(col("band"), col("key")).agg(count(lit(1)).as("sz")).groupBy(col("band")).agg(count(lit(1)).as("n_buckets"), max(col("sz")).as("max_bucket"), sum(expr("sz * (sz - 1) div 2")).as("cand_pairs")).agg(sum(col("cand_pairs")).as("total_cand"), max(col("max_bucket")).as("biggest_bucket")).show(false) }
println(f"BISECT_DONE stage=$stage wall=${(System.nanoTime() - t0) / 1e9}%.1f")
