package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** protobuf codec (logstash-codec-protobuf; the wire format is Google's
  * public protobuf encoding): one message per event payload, fields
  * declared in config rather than compiled classes — `schema` gives the
  * Spark DDL, `fields` maps each column to its protobuf field number. The
  * scalar subset is decoded (varint int/long/bool, fixed64 double, fixed32
  * float, length-delimited UTF-8 string); unknown field numbers are
  * skipped by wire type exactly as the spec prescribes, so messages with
  * extra fields decode the declared subset.
  *
  * The binary seam is the same narrow bytes→JSON transcode as msgpack —
  * the typed work rides codegen'd `from_json` against the declared schema.
  */
object Protobuf {

  /** kind ∈ long | double | float | string | bool (derived from the DDL). */
  def toJson(b: Array[Byte], fields: Map[Int, (String, String)]): String = {
    val w = new java.io.StringWriter()
    val g = new com.fasterxml.jackson.core.JsonFactory().createGenerator(w)
    g.writeStartObject()
    val buf = java.nio.ByteBuffer.wrap(b)
    def varint(): Long = {
      var x = 0L; var shift = 0
      var more = true
      while (more) {
        val byte = buf.get()
        x |= (byte & 0x7fL) << shift
        shift += 7
        more = (byte & 0x80) != 0
      }
      x
    }
    while (buf.remaining() > 0) {
      val key = varint()
      val num = (key >>> 3).toInt
      val wire = (key & 7).toInt
      fields.get(num) match {
        case Some((name, kind)) => wire match {
          case 0 =>
            val v = varint()
            if (kind == "bool") g.writeBooleanField(name, v != 0)
            else g.writeNumberField(name, v)
          case 1 =>
            buf.order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val v = buf.getDouble
            buf.order(java.nio.ByteOrder.BIG_ENDIAN)
            g.writeNumberField(name, v)
          case 5 =>
            buf.order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val v = buf.getFloat
            buf.order(java.nio.ByteOrder.BIG_ENDIAN)
            g.writeNumberField(name, v)
          case 2 =>
            val n = varint().toInt
            val a = new Array[Byte](n); buf.get(a)
            g.writeStringField(name,
              new String(a, java.nio.charset.StandardCharsets.UTF_8))
          case other =>
            throw new IllegalArgumentException(s"protobuf: wire type $other")
        }
        case None => wire match { // unknown field: skip by wire type
          case 0 => varint()
          case 1 => buf.position(buf.position() + 8)
          case 5 => buf.position(buf.position() + 4)
          case 2 => val n = varint().toInt; buf.position(buf.position() + n)
          case other =>
            throw new IllegalArgumentException(s"protobuf: wire type $other")
        }
      }
    }
    g.writeEndObject(); g.close()
    w.toString
  }

  private val decodeU = udf((b: Array[Byte], spec: Map[Int, String]) =>
    if (b == null) null
    else toJson(b, spec.map { case (n, nk) =>
      val Array(name, kind) = nk.split(":", 2); n -> (name, kind)
    }))

  /** Decode one protobuf message per binary value against `schemaDdl`;
    * `fieldNumbers` maps column name -> protobuf field number.
    */
  def decode(df: DataFrame, source: String, schemaDdl: String,
             fieldNumbers: Map[String, Int]): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
    val kinds = schema.fields.map(f => f.name -> (f.dataType.typeName match {
      case "double" => "double"
      case "float" => "float"
      case "boolean" => "bool"
      case "string" => "string"
      case "integer" | "long" | "short" | "byte" => "long"
      case other => throw new IllegalArgumentException(
        s"protobuf: unsupported column type $other for ${f.name}")
    })).toMap
    val spec = fieldNumbers.map { case (name, num) =>
      require(kinds.contains(name), s"protobuf: field $name not in schema")
      num -> s"$name:${kinds(name)}"
    }
    val rest = df.columns.filter(_ != source).map(col).toSeq
    df.select(rest :+ from_json(
        decodeU(col(source), typedLit(spec)), schema).as("_ev"): _*)
      .select(rest :+ col("_ev.*"): _*)
  }

  // ---- fixture/encode side (the codec's write half)

  private def putVarint(bb: java.nio.ByteBuffer, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { bb.put(((v & 0x7f) | 0x80).toByte); v >>>= 7 }
    bb.put(v.toByte)
  }

  /** Pack one message from (fieldNumber, value) pairs — Long/Boolean as
    * varint, Double fixed64, Float fixed32, String length-delimited.
    */
  def pack(values: Seq[(Int, Any)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(
      values.map { case (_, v) => 16 + (v match {
        case s: String => s.getBytes("UTF-8").length; case _ => 0 }) }.sum)
    values.foreach { case (num, v) =>
      v match {
        case x: Long => putVarint(bb, (num.toLong << 3) | 0); putVarint(bb, x)
        case x: Int => putVarint(bb, (num.toLong << 3) | 0); putVarint(bb, x.toLong)
        case x: Boolean =>
          putVarint(bb, (num.toLong << 3) | 0); putVarint(bb, if (x) 1L else 0L)
        case x: Double =>
          putVarint(bb, (num.toLong << 3) | 1)
          bb.order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(x)
            .order(java.nio.ByteOrder.BIG_ENDIAN)
        case x: Float =>
          putVarint(bb, (num.toLong << 3) | 5)
          bb.order(java.nio.ByteOrder.LITTLE_ENDIAN).putFloat(x)
            .order(java.nio.ByteOrder.BIG_ENDIAN)
        case x: String =>
          val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          putVarint(bb, (num.toLong << 3) | 2); putVarint(bb, a.length.toLong)
          bb.put(a)
        case other => throw new IllegalArgumentException(
          s"protobuf pack: unsupported value $other")
      }
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }
}
