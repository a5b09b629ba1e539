package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq((1L, "hello media"), (2L, "hello media"), (3L, "other"))
    .toDF("doc_id", "text")

  test("withBinaryMeta: byte length + sha-256 content addressing") {
    val r = Multimodal.withBinaryMeta(docs)
      .select("doc_id", "n_bytes", "content_id")
      .as[(Long, Int, String)].collect().sortBy(_._1)
    r(0)._2 shouldBe 11
    r(0)._3 shouldBe r(1)._3 // same payload -> same content id
    r(2)._3 should not be r(0)._3
    r(0)._3 should fullyMatch regex "[0-9a-f]{64}"
  }

  test("resize normalizes every row to the target dimensions") {
    val r = Multimodal.resize(Multimodal.decodeFeatures(spark, docs), 32, 32).collect()
    r.foreach { f =>
      f.width shouldBe 32
      f.height shouldBe 32
      f.feature.length shouldBe 8
    }
  }

  test("frameSample: 1 payload row fans out to n typed frame rows") {
    val frames = Multimodal.frameSample(spark, docs, 4).collect()
    frames.count(_.doc_id == 1L) shouldBe 4
    frames.filter(_.doc_id == 1L).map(_.frame_idx).sorted shouldBe Array(0, 1, 2, 3)
    // frames reassemble a prefix of the payload (stride slicing, no overlap)
    val joined = frames.filter(_.doc_id == 1L).sortBy(_.frame_idx)
      .flatMap(_.frame_bytes)
    new String(joined.take(8), "UTF-8") shouldBe "hello me"
  }

  test("decodeFeatures: deterministic stub decode with typed schema") {
    val ds = Multimodal.decodeFeatures(spark, docs)
    val r1 = ds.collect().sortBy(_.doc_id)
    val r2 = Multimodal.decodeFeatures(spark, docs).collect().sortBy(_.doc_id)
    r1.map(_.feature.toSeq) shouldBe r2.map(_.feature.toSeq) // deterministic
    r1(0).n_bytes shouldBe 11
    r1(0).feature.length shouldBe 8
    ds.schema.fieldNames shouldBe Array("doc_id", "n_bytes", "width", "height", "feature")
  }
}
