package graft

import graft.sources.AvroSource
import java.nio.file.Files
import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.types._

class AvroSourceSpec extends SparkTestBase {
  import spark.implicits._

  private val avroSchema = new Schema.Parser().parse(
    """{"type":"record","name":"Doc","fields":[
      |  {"name":"doc_id","type":"long"},
      |  {"name":"text","type":["null","string"],"default":null},
      |  {"name":"score","type":"double"},
      |  {"name":"flag","type":"boolean"}
      |]}""".stripMargin)

  private def writeOcf(path: String, rows: Seq[(Long, String, Double, Boolean)],
                       codec: CodecFactory = CodecFactory.nullCodec()): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.setCodec(codec)
    w.create(avroSchema, new java.io.File(path))
    rows.foreach { case (id, text, score, flag) =>
      val r = new GenericData.Record(avroSchema)
      r.put("doc_id", id); r.put("text", text)
      r.put("score", score); r.put("flag", flag)
      w.append(r)
    }
    w.close()
  }

  private val sparkSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("score", DoubleType), StructField("flag", BooleanType)))

  test("reads OCF files (null and deflate codecs) by field name") {
    val dir = Files.createTempDirectory("avro").toString
    writeOcf(s"$dir/a.avro", Seq((1L, "alpha", 0.5, true), (2L, "beta", 1.5, false)))
    writeOcf(s"$dir/b.avro", Seq((3L, "gamma", 2.5, true)),
      CodecFactory.deflateCodec(6))
    val r = AvroSource.read(spark, dir, sparkSchema)
      .as[(Long, String, Double, Boolean)].collect().sortBy(_._1)
    r shouldBe Array((1L, "alpha", 0.5, true), (2L, "beta", 1.5, false),
      (3L, "gamma", 2.5, true))
  }

  test("schema projection: subset of fields, and absent fields read as null") {
    val dir = Files.createTempDirectory("avro2").toString
    writeOcf(s"$dir/a.avro", Seq((7L, "seven", 7.0, false)))
    val subset = AvroSource.read(spark, dir,
      StructType(Seq(StructField("text", StringType),
        StructField("doc_id", LongType))))
      .as[(String, Long)].collect()
    subset shouldBe Array(("seven", 7L))
    // a column the writer never had: evolution-null
    val evolved = AvroSource.read(spark, dir,
      StructType(Seq(StructField("doc_id", LongType),
        StructField("new_col", StringType))))
      .as[(Long, Option[String])].collect()
    evolved shouldBe Array((7L, None))
  }

  test("union [null,string] carries real nulls through") {
    val dir = Files.createTempDirectory("avro3").toString
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, new java.io.File(s"$dir/n.avro"))
    val r = new GenericData.Record(avroSchema)
    r.put("doc_id", 9L); r.put("text", null); r.put("score", 0.0); r.put("flag", true)
    w.append(r); w.close()
    val out = AvroSource.read(spark, dir, sparkSchema).collect().head
    out.getLong(0) shouldBe 9L
    out.isNullAt(1) shouldBe true
  }

  test("writer/reader type mismatch takes the PERMISSIVE arm, never the encoder (review pin)") {
    val dir = Files.createTempDirectory("avro5").toString
    writeOcf(s"$dir/good.avro", Seq((1L, "ok", 1.0, true)))
    // a second file whose doc_id is a STRING: decodes fine as Avro but
    // cannot coerce to LongType — must contribute zero rows, not blow up
    // the job at the Row encoder
    val strSchema = new Schema.Parser().parse(
      """{"type":"record","name":"Doc2","fields":[
        |  {"name":"doc_id","type":"string"}]}""".stripMargin)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](strSchema))
    w.create(strSchema, new java.io.File(s"$dir/str.avro"))
    val r = new GenericData.Record(strSchema)
    r.put("doc_id", "not-a-long"); w.append(r); w.close()
    val rows = AvroSource.read(spark, dir,
      StructType(Seq(StructField("doc_id", LongType)))).collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(1L)
  }

  test("PERMISSIVE file handling: corrupt files yield zero rows; badFiles lists them") {
    val dir = Files.createTempDirectory("avro4").toString
    writeOcf(s"$dir/good.avro", Seq((1L, "ok", 1.0, true)))
    Files.write(java.nio.file.Paths.get(s"$dir/junk.avro"),
      "not avro at all".getBytes)
    // Truncation anywhere after the header is SILENT by Avro's own
    // design: DataFileStream.hasNext treats mid-block EOF as
    // end-of-stream (the sync-marker recovery contract), so a truncated
    // file yields fewer rows, not an error — the ledger catches that
    // with row-count reconciliation (q86-style), not file probing.
    val valid = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/good.avro"))
    Files.write(java.nio.file.Paths.get(s"$dir/trunc.avro"),
      valid.take(valid.length - 20))
    // header corruption IS detectable: flip the magic
    val hdrBad = valid.clone(); hdrBad(0) = 'X'
    Files.write(java.nio.file.Paths.get(s"$dir/hdr.avro"), hdrBad)
    val rows = AvroSource.read(spark, dir, sparkSchema).collect()
    rows.length shouldBe 1 // good yields its row; junk/trunc/hdr yield none
    val bad = AvroSource.badFiles(spark, dir)
      .as[String].collect().map(_.split('/').last).sorted
    bad shouldBe Array("hdr.avro", "junk.avro")
  }
}
