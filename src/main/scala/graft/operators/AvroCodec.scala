package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Avro codec (logstash-codec-avro): raw binary DATUMS (the plugin's wire
  * form — `Avro::IO::BinaryDecoder` over the payload, no container file),
  * decoded against a caller-supplied writer schema. Binary datums are
  * schema-delimited, so a byte stream of consecutive datums unpacks
  * sequentially like msgpack. The JSON seam is `GenericRecord.toString`
  * (valid JSON for records of primitive/array/map/nested-record/null-union
  * fields — `bytes`/`fixed` are NOT transcodable and rejected by
  * [[ddlFor]]); the typed work stays on schema'd `from_json`, with the
  * Spark schema DERIVED from the avro schema so callers supply one schema,
  * not two.
  */
object AvroCodec {

  private val schemaCache = TrieMap.empty[String, Schema]
  private def schemaOf(json: String): Schema =
    schemaCache.getOrElseUpdate(json, new Schema.Parser().parse(json))

  /** Spark DDL equivalent of an avro RECORD schema. Unions must be
    * [null, X] (avro's nullable idiom) — they map to X's nullable type.
    */
  def ddlFor(schemaJson: String): String = {
    def sparkType(s: Schema): String = s.getType match {
      case Schema.Type.STRING => "STRING"
      case Schema.Type.INT => "INT"
      case Schema.Type.LONG => "BIGINT"
      case Schema.Type.FLOAT => "FLOAT"
      case Schema.Type.DOUBLE => "DOUBLE"
      case Schema.Type.BOOLEAN => "BOOLEAN"
      case Schema.Type.ENUM => "STRING"
      case Schema.Type.ARRAY => s"ARRAY<${sparkType(s.getElementType)}>"
      case Schema.Type.MAP => s"MAP<STRING, ${sparkType(s.getValueType)}>"
      case Schema.Type.RECORD =>
        "STRUCT<" + s.getFields.asScala.map(f =>
          s"${f.name}: ${sparkType(f.schema)}").mkString(", ") + ">"
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        require(branches.size == 1,
          s"avro codec: only [null, X] unions are supported, got $s")
        sparkType(branches.head)
      case t => throw new IllegalArgumentException(
        s"avro codec: type $t has no JSON carrier (bytes/fixed unsupported)")
    }
    val root = schemaOf(schemaJson)
    require(root.getType == Schema.Type.RECORD,
      s"avro codec: top-level schema must be a record, got ${root.getType}")
    root.getFields.asScala.map(f => s"${f.name} ${sparkType(f.schema)}")
      .mkString(", ")
  }

  /** ALL consecutive binary datums in the payload, as JSON texts. */
  def toJsonAll(bytes: Array[Byte], schemaJson: String): Seq[String] = {
    val schema = schemaOf(schemaJson)
    val reader = new GenericDatumReader[GenericRecord](schema)
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (!dec.isEnd) out += reader.read(null, dec).toString
    out.toSeq
  }

  /** One JSON event -> one binary avro datum (avro's own JsonDecoder reads
    * the text against the schema; union-typed fields follow avro's JSON
    * encoding, so encode is for union-free schemas — the reference encoder
    * has the same shape: event hash -> datum write).
    */
  def fromJson(json: String, schemaJson: String): Array[Byte] = {
    val schema = schemaOf(schemaJson)
    val rec = new GenericDatumReader[GenericRecord](schema)
      .read(null, DecoderFactory.get().jsonDecoder(schema, json))
    val out = new ByteArrayOutputStream
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }
}
