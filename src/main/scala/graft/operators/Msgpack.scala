package graft.operators

import java.io.StringWriter
import java.math.BigInteger
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.core.JsonFactory
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.collection.mutable.ArrayBuffer

/** MessagePack (msgpack.org public spec) encoder/decoder, transcoding
  * to/from JSON text so the typed column work stays on Spark's codegen'd
  * `from_json`/`to_json` — the binary seam is only ever this narrow
  * byte<->text transcode at the ingest/egress boundary
  * (logstash-codec-msgpack decodes the event hash the same way:
  * `MessagePack.unpack -> event fields`).
  *
  * Full format family: fixint/fixneg, (u)int8-64, float32/64, nil, bool,
  * fixstr/str8-32, bin8-32 (surfaced as base64 strings — JSON has no
  * binary), fixarray/array16/32, fixmap/map16/32. ext types are rejected
  * loudly (no reference semantics to mirror). Objects are self-delimiting,
  * so a byte stream of CONSECUTIVE objects (the wire form: one pack per
  * event) unpacks without any framing protocol — [[toJsonAll]].
  */
object Msgpack {

  private val mapper = new ObjectMapper
  private val factory = new JsonFactory

  // ---- decode: msgpack bytes -> JSON text ----

  /** Decode the single object at the buffer position (advances it). */
  private def readNode(b: ByteBuffer, g: com.fasterxml.jackson.core.JsonGenerator): Unit = {
    val t = b.get() & 0xff
    t match {
      case x if x <= 0x7f => g.writeNumber(x) // positive fixint
      case x if x >= 0xe0 => g.writeNumber(x - 0x100) // negative fixint
      case x if x >= 0x80 && x <= 0x8f => readMap(b, g, x & 0x0f)
      case x if x >= 0x90 && x <= 0x9f => readArr(b, g, x & 0x0f)
      case x if x >= 0xa0 && x <= 0xbf => g.writeString(readStr(b, x & 0x1f))
      case 0xc0 => g.writeNull()
      case 0xc2 => g.writeBoolean(false)
      case 0xc3 => g.writeBoolean(true)
      case 0xc4 => g.writeString(readBin(b, b.get() & 0xff))
      case 0xc5 => g.writeString(readBin(b, b.getShort() & 0xffff))
      case 0xc6 => g.writeString(readBin(b, b.getInt()))
      case 0xca => g.writeNumber(java.lang.Float.intBitsToFloat(b.getInt()).toDouble)
      case 0xcb => g.writeNumber(java.lang.Double.longBitsToDouble(b.getLong()))
      case 0xcc => g.writeNumber(b.get() & 0xff)
      case 0xcd => g.writeNumber(b.getShort() & 0xffff)
      case 0xce => g.writeNumber(b.getInt() & 0xffffffffL)
      case 0xcf =>
        val v = b.getLong()
        if (v >= 0) g.writeNumber(v)
        else g.writeNumber(new BigInteger(java.lang.Long.toUnsignedString(v)))
      case 0xd0 => g.writeNumber(b.get().toInt)
      case 0xd1 => g.writeNumber(b.getShort().toInt)
      case 0xd2 => g.writeNumber(b.getInt())
      case 0xd3 => g.writeNumber(b.getLong())
      case 0xd9 => g.writeString(readStr(b, b.get() & 0xff))
      case 0xda => g.writeString(readStr(b, b.getShort() & 0xffff))
      case 0xdb => g.writeString(readStr(b, b.getInt()))
      case 0xdc => readArr(b, g, b.getShort() & 0xffff)
      case 0xdd => readArr(b, g, b.getInt())
      case 0xde => readMap(b, g, b.getShort() & 0xffff)
      case 0xdf => readMap(b, g, b.getInt())
      case x => throw new IllegalArgumentException(
        f"msgpack: unsupported type byte 0x$x%02x (ext types not decoded)")
    }
  }

  private def readStr(b: ByteBuffer, n: Int): String = {
    val a = new Array[Byte](n); b.get(a); new String(a, UTF_8)
  }
  private def readBin(b: ByteBuffer, n: Int): String = {
    val a = new Array[Byte](n); b.get(a)
    java.util.Base64.getEncoder.encodeToString(a)
  }
  private def readArr(b: ByteBuffer, g: com.fasterxml.jackson.core.JsonGenerator, n: Int): Unit = {
    g.writeStartArray(); (0 until n).foreach(_ => readNode(b, g)); g.writeEndArray()
  }
  private def readMap(b: ByteBuffer, g: com.fasterxml.jackson.core.JsonGenerator, n: Int): Unit = {
    g.writeStartObject()
    (0 until n).foreach { _ =>
      // JSON keys are strings; a non-string msgpack key stringifies through
      // its own JSON render (numbers print decimal)
      val kw = new StringWriter(); val kg = factory.createGenerator(kw)
      readNode(b, kg); kg.close()
      val k = kw.toString
      val key = if (k.length >= 2 && k.charAt(0) == '"')
        mapper.readTree(k).asText() else k
      g.writeFieldName(key)
      readNode(b, g)
    }
    g.writeEndObject()
  }

  /** One object -> one JSON text. */
  def toJson(bytes: Array[Byte]): String = {
    val all = toJsonAll(bytes)
    require(all.length == 1, s"msgpack: expected 1 object, found ${all.length}")
    all.head
  }

  /** ALL consecutive objects in the byte stream (self-delimiting wire
    * form — one pack per event with no outer framing).
    */
  def toJsonAll(bytes: Array[Byte]): Seq[String] = {
    val b = ByteBuffer.wrap(bytes)
    val out = ArrayBuffer.empty[String]
    while (b.hasRemaining) {
      val w = new StringWriter(); val g = factory.createGenerator(w)
      readNode(b, g); g.close()
      out += w.toString
    }
    out.toSeq
  }

  // ---- encode: JSON text -> msgpack bytes ----

  private def writeNode(n: JsonNode, o: java.io.ByteArrayOutputStream): Unit = {
    def be16(v: Int): Unit = { o.write(v >>> 8); o.write(v) }
    def be32(v: Int): Unit = { o.write(v >>> 24); o.write(v >>> 16); o.write(v >>> 8); o.write(v) }
    def be64(v: Long): Unit = { be32((v >>> 32).toInt); be32(v.toInt) }
    if (n.isNull) o.write(0xc0)
    else if (n.isBoolean) o.write(if (n.asBoolean()) 0xc3 else 0xc2)
    else if (n.isIntegralNumber && n.canConvertToLong) {
      val v = n.asLong()
      if (v >= 0) {
        if (v <= 0x7f) o.write(v.toInt)
        else if (v <= 0xff) { o.write(0xcc); o.write(v.toInt) }
        else if (v <= 0xffff) { o.write(0xcd); be16(v.toInt) }
        else if (v <= 0xffffffffL) { o.write(0xce); be32(v.toInt) }
        else { o.write(0xd3); be64(v) }
      } else {
        if (v >= -32) o.write(0x100 + v.toInt)
        else if (v >= Byte.MinValue) { o.write(0xd0); o.write(v.toInt) }
        else if (v >= Short.MinValue) { o.write(0xd1); be16(v.toInt) }
        else if (v >= Int.MinValue) { o.write(0xd2); be32(v.toInt) }
        else { o.write(0xd3); be64(v) }
      }
    } else if (n.isBigInteger) { // uint64 range above Long
      val v = n.bigIntegerValue()
      o.write(0xcf); be64(v.longValue())
    } else if (n.isNumber) {
      o.write(0xcb); be64(java.lang.Double.doubleToLongBits(n.asDouble()))
    } else if (n.isTextual) {
      val b = n.asText().getBytes(UTF_8)
      if (b.length <= 31) o.write(0xa0 | b.length)
      else if (b.length <= 0xff) { o.write(0xd9); o.write(b.length) }
      else if (b.length <= 0xffff) { o.write(0xda); be16(b.length) }
      else { o.write(0xdb); be32(b.length) }
      o.write(b, 0, b.length)
    } else if (n.isArray) {
      val sz = n.size()
      if (sz <= 15) o.write(0x90 | sz)
      else if (sz <= 0xffff) { o.write(0xdc); be16(sz) }
      else { o.write(0xdd); be32(sz) }
      n.forEach(e => writeNode(e, o))
    } else if (n.isObject) {
      val sz = n.size()
      if (sz <= 15) o.write(0x80 | sz)
      else if (sz <= 0xffff) { o.write(0xde); be16(sz) }
      else { o.write(0xdf); be32(sz) }
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        writeNode(new com.fasterxml.jackson.databind.node.TextNode(e.getKey), o)
        writeNode(e.getValue, o)
      }
    } else throw new IllegalArgumentException(s"msgpack: unpackable node $n")
  }

  def fromJson(json: String): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream
    writeNode(mapper.readTree(json), o)
    o.toByteArray
  }

  /** Fluentd forward-protocol events (public spec, the fluent codec's wire):
    * `[tag, time, record]` (Message), `[tag, [[time, record], ...]]`
    * (Forward), or `[tag, bin(packed entries)]` (PackedForward — the bin
    * surfaces as base64 through the JSON transcode and re-unpacks here).
    * Returns (tag, epoch, record-JSON) triples.
    */
  def fluentEvents(bytes: Array[Byte]): Seq[(String, Long, String)] =
    toJsonAll(bytes).flatMap { j =>
      val n = mapper.readTree(j)
      require(n.isArray && n.size() >= 2,
        s"fluent: each object must be [tag, ...], got $j")
      val tag = n.get(0).asText()
      val second = n.get(1)
      if (second.isArray) { // Forward: [[time, record], ...]
        (0 until second.size()).map { i =>
          val e = second.get(i)
          (tag, e.get(0).asLong(), e.get(1).toString)
        }
      } else if (second.isTextual) { // PackedForward: bin of packed entries
        val inner = java.util.Base64.getDecoder.decode(second.asText())
        toJsonAll(inner).map { ej =>
          val e = mapper.readTree(ej)
          (tag, e.get(0).asLong(), e.get(1).toString)
        }
      } else { // Message: [tag, time, record]
        Seq((tag, second.asLong(), n.get(2).toString))
      }
    }
}
