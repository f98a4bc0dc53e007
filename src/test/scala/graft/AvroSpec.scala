package graft

import org.apache.spark.sql.functions._
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import graft.operators.{AvroCodec, Codec}
import graft.lscl.{Lscl, LsclRun}

/** avro codec: raw binary datums against a writer schema. Ground-truth
  * datums are built with the avro Java library DIRECTLY (not our encoder),
  * so decode is checked against avro itself; encode is checked by reading
  * our bytes back with the avro library.
  */
class AvroSpec extends SparkSpec {

  private val schemaJson =
    """{"type":"record","name":"Ev","fields":[
      |  {"name":"host","type":"string"},
      |  {"name":"count","type":"long"},
      |  {"name":"ratio","type":"double"},
      |  {"name":"ok","type":"boolean"},
      |  {"name":"note","type":["null","string"],"default":null},
      |  {"name":"tags","type":{"type":"array","items":"string"}},
      |  {"name":"dims","type":{"type":"map","values":"int"}},
      |  {"name":"inner","type":{"type":"record","name":"In","fields":[
      |    {"name":"a","type":"int"}]}}
      |]}""".stripMargin

  private def datum(host: String, count: Long, note: Option[String]): Array[Byte] = {
    val schema = new Schema.Parser().parse(schemaJson)
    val r = new GenericData.Record(schema)
    r.put("host", host); r.put("count", count); r.put("ratio", 1.25)
    r.put("ok", true); r.put("note", note.orNull)
    r.put("tags", java.util.List.of("t1", "t 2"))
    r.put("dims", java.util.Map.of("x", Integer.valueOf(7)))
    val in = new GenericData.Record(schema.getField("inner").schema)
    in.put("a", 42); r.put("inner", in)
    val out = new java.io.ByteArrayOutputStream
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(r, enc)
    enc.flush(); out.toByteArray
  }

  test("ddlFor maps records, arrays, maps, enums, and null-unions") {
    assert(AvroCodec.ddlFor(schemaJson) ==
      "host STRING, count BIGINT, ratio DOUBLE, ok BOOLEAN, note STRING, " +
        "tags ARRAY<STRING>, dims MAP<STRING, INT>, inner STRUCT<a: INT>")
    intercept[IllegalArgumentException](AvroCodec.ddlFor(
      """{"type":"record","name":"B","fields":[{"name":"b","type":"bytes"}]}"""))
    intercept[IllegalArgumentException](AvroCodec.ddlFor(
      """{"type":"record","name":"U","fields":[
        |{"name":"u","type":["int","string"]}]}""".stripMargin))
  }

  test("decode: consecutive library-built datums -> typed columns") {
    import spark.implicits._
    val payload = datum("web01", 10L, Some("hi")) ++ datum("web02", 20L, None)
    val out = Codec.avroDecode(Seq(payload).toDF("payload"), "payload", schemaJson)
      .orderBy("count").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[String]("host")).toSeq == Seq("web01", "web02"))
    assert(out(0).getAs[String]("note") == "hi")
    assert(out(1).getAs[String]("note") == null)
    assert(out(0).getAs[Double]("ratio") == 1.25)
    assert(out(0).getSeq[String](out(0).fieldIndex("tags")) == Seq("t1", "t 2"))
    assert(out(0).getAs[Map[String, Int]]("dims") == Map("x" -> 7))
    assert(out(0).getAs[org.apache.spark.sql.Row]("inner").getAs[Int]("a") == 42)
  }

  test("encode: our datum reads back through the avro library") {
    import spark.implicits._
    val flat =
      """{"type":"record","name":"F","fields":[
        |  {"name":"m","type":"string"},{"name":"v","type":"long"}]}""".stripMargin
    val bytes = Seq(("hello w", 99L)).toDF("m", "v")
      .select(Codec.avroEncode(Seq("m" -> col("m"), "v" -> col("v")), flat).as("b"))
      .collect()(0).getAs[Array[Byte]]("b")
    val schema = new Schema.Parser().parse(flat)
    val rec = new GenericDatumReader[GenericRecord](schema)
      .read(null, DecoderFactory.get().binaryDecoder(bytes, null))
    assert(rec.get("m").toString == "hello w")
    assert(rec.get("v") == 99L)
  }

  test("LSCL file input with codec => avro decodes a datum file") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_avro")
    java.nio.file.Files.write(tmp.resolve("ev.avro"),
      datum("h1", 1L, None) ++ datum("h2", 2L, Some("n")))
    val cfg = Lscl.parse(
      s"""input { file { path => "$tmp/ev.avro"
         |  codec => avro { schema => '${schemaJson.replace("\n", " ")}' } } }
         |filter { }
         |output { }""".stripMargin, Map.empty)
    val rows = LsclRun.source(spark, cfg.inputs).orderBy("count").collect()
    assert(rows.map(_.getAs[String]("host")).toSeq == Seq("h1", "h2"))
  }
}
