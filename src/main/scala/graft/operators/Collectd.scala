package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** collectd binary network protocol codec (logstash-codec-collectd; the
  * protocol is collectd's public "binary protocol" — typed parts, each
  * `uint16 type | uint16 length | payload`, big-endian).
  *
  * Part types handled (the plain-text subset — no crypto):
  *   0x0000 host, 0x0001 time, 0x0008 time_hires (2^-30 s units),
  *   0x0002 plugin, 0x0003 plugin_instance, 0x0004 type,
  *   0x0005 type_instance, 0x0007 interval, 0x0009 interval_hires,
  *   0x0100 message, 0x0101 severity,
  *   0x0006 values: `uint16 n`, then n value-type bytes
  *     (0 COUNTER u64be, 1 GAUGE f64 LITTLE-endian — the protocol's one
  *     x86 wart, 2 DERIVE i64be, 3 ABSOLUTE u64be), then n 8-byte values.
  *
  * Decoding is a stateful prefix scan per packet: metadata parts set the
  * current field, each VALUES part emits one event carrying the metadata
  * accumulated so far — exactly the reference codec's per-packet loop. A
  * packet is one UDP datagram (≤ 64 KiB), so the per-row loop is bounded by
  * the transport; the relation-level work (schema'd fan-out) stays columnar.
  */
object Collectd {

  /** Decode one packet into per-VALUES-part JSON events. */
  def toJsonAll(b: Array[Byte]): Seq[String] = {
    if (b == null) return Seq.empty
    val buf = java.nio.ByteBuffer.wrap(b) // big-endian default
    var host, plugin, pluginInstance, typ, typeInstance = ""
    var time = 0.0; var interval = 0.0
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def str(len: Int): String = {
      val a = new Array[Byte](len - 4)
      buf.get(a)
      // strings are NUL-terminated in the payload
      new String(a, 0, math.max(0, a.length - 1),
        java.nio.charset.StandardCharsets.UTF_8)
    }
    while (buf.remaining() >= 4) {
      val ptype = buf.getShort & 0xffff
      val plen = buf.getShort & 0xffff
      if (plen < 4 || plen - 4 > buf.remaining()) return out.toSeq // malformed tail
      ptype match {
        case 0x0000 => host = str(plen)
        case 0x0002 => plugin = str(plen)
        case 0x0003 => pluginInstance = str(plen)
        case 0x0004 => typ = str(plen)
        case 0x0005 => typeInstance = str(plen)
        case 0x0001 => time = buf.getLong.toDouble
        case 0x0008 => time = buf.getLong.toDouble / 1073741824.0
        case 0x0007 => interval = buf.getLong.toDouble
        case 0x0009 => interval = buf.getLong.toDouble / 1073741824.0
        case 0x0006 =>
          val n = buf.getShort & 0xffff
          val kinds = new Array[Byte](n); buf.get(kinds)
          val vals = (0 until n).map { i =>
            kinds(i) match {
              case 1 => // GAUGE: little-endian double
                buf.order(java.nio.ByteOrder.LITTLE_ENDIAN)
                val v = buf.getDouble
                buf.order(java.nio.ByteOrder.BIG_ENDIAN)
                v.toString
              case _ => buf.getLong.toString // counter/derive/absolute
            }
          }
          val kindNames = kinds.map {
            case 0 => "counter"; case 1 => "gauge"
            case 2 => "derive"; case _ => "absolute"
          }
          out += s"""{"host":"$host","collectd_time":$time,"plugin":"$plugin"""" +
            s""","plugin_instance":"$pluginInstance","collectd_type":"$typ"""" +
            s""","type_instance":"$typeInstance","interval":$interval""" +
            s""","values":[${vals.mkString(",")}]""" +
            s""","dstypes":[${kindNames.map("\"" + _ + "\"").mkString(",")}]}"""
        case _ => buf.position(buf.position() + (plen - 4)) // skip unknown
      }
    }
    out.toSeq
  }

  private val unpackAll = udf((b: Array[Byte]) => toJsonAll(b))

  val SchemaDdl: String = "host STRING, collectd_time DOUBLE, plugin STRING, " +
    "plugin_instance STRING, collectd_type STRING, type_instance STRING, " +
    "interval DOUBLE, values ARRAY<DOUBLE>, dstypes ARRAY<STRING>"

  /** Decode a binary packet column: one event per VALUES part. */
  def decode(df: DataFrame, source: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(SchemaDdl)
    val rest = df.columns.filter(_ != source).map(col).toSeq
    df.withColumn("_cd", explode(unpackAll(col(source))))
      .select(rest :+ from_json(col("_cd"), schema).as("_ev"): _*)
      .select(rest :+ col("_ev.*"): _*)
  }

  // ---- fixture/encode side (tests + archives; the write half of the codec)

  private def part(t: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + payload.length)
    bb.putShort(t.toShort).putShort((4 + payload.length).toShort).put(payload)
    bb.array()
  }
  private def strPart(t: Int, s: String): Array[Byte] =
    part(t, s.getBytes(java.nio.charset.StandardCharsets.UTF_8) :+ 0.toByte)
  private def numPart(t: Int, v: Long): Array[Byte] =
    part(t, java.nio.ByteBuffer.allocate(8).putLong(v).array())

  /** Build one packet: shared metadata + a list of values-parts, each a list
    * of (dstype, value) where dstype ∈ counter/gauge/derive/absolute.
    */
  def packet(host: String, timeSec: Long, plugin: String, pluginInstance: String,
             typ: String, typeInstance: String, intervalSec: Long,
             valueSets: Seq[Seq[(String, Double)]]): Array[Byte] = {
    val head = strPart(0x0000, host) ++ numPart(0x0001, timeSec) ++
      strPart(0x0002, plugin) ++ strPart(0x0003, pluginInstance) ++
      strPart(0x0004, typ) ++ strPart(0x0005, typeInstance) ++
      numPart(0x0007, intervalSec)
    val vparts = valueSets.map { vs =>
      val n = vs.length
      val bb = java.nio.ByteBuffer.allocate(4 + 2 + n + 8 * n)
      bb.putShort(0x0006.toShort).putShort((6 + 9 * n).toShort)
      bb.putShort(n.toShort)
      vs.foreach { case (k, _) => bb.put((k match {
        case "counter" => 0; case "gauge" => 1
        case "derive" => 2; case _ => 3
      }).toByte) }
      vs.foreach {
        case ("gauge", v) =>
          bb.order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(v)
            .order(java.nio.ByteOrder.BIG_ENDIAN)
        case (_, v) => bb.putLong(v.toLong)
      }
      bb.array()
    }
    vparts.foldLeft(head)(_ ++ _)
  }
}
