package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NetFlow v5 codec (logstash-codec-netflow's v5 path; the record layout is
  * Cisco's public NetFlow v5 export format).
  *
  * Packet = 24-byte header (version u16, count u16, sys_uptime_ms u32,
  * unix_secs u32, unix_nsecs u32, flow_sequence u32, engine u16,
  * sampling u16) followed by `count` 48-byte records (srcaddr, dstaddr,
  * nexthop u32; input, output u16; dPkts, dOctets, first, last u32;
  * srcport, dstport u16; pad u8, tcp_flags u8, prot u8, tos u8; src_as,
  * dst_as u16; src_mask, dst_mask u8; pad2 u16) — all big-endian.
  *
  * One event per record, field names per the reference codec
  * (ipv4_src_addr dotted-quad, in_pkts/in_bytes, l4_*_port,
  * first/last_switched as epoch seconds reconstructed the reference way:
  * `unix_secs - (sys_uptime - first)/1000`). The per-packet loop is bounded
  * by the datagram (≤ 30 records/packet per the spec); the relation-level
  * fan-out is a columnar explode + schema'd from_json like every binary
  * codec here.
  */
object Netflow {

  private def ip(v: Int): String =
    s"${(v >>> 24) & 0xff}.${(v >>> 16) & 0xff}.${(v >>> 8) & 0xff}.${v & 0xff}"

  def toJsonAll(b: Array[Byte]): Seq[String] = {
    if (b == null || b.length < 24) return Seq.empty
    val buf = java.nio.ByteBuffer.wrap(b)
    val version = buf.getShort & 0xffff
    if (version != 5) return Seq.empty
    val count = buf.getShort & 0xffff
    val uptime = buf.getInt.toLong & 0xffffffffL
    val unixSecs = buf.getInt.toLong & 0xffffffffL
    buf.getInt // unix_nsecs
    val flowSeq = buf.getInt.toLong & 0xffffffffL
    buf.getShort; buf.getShort // engine, sampling
    (0 until math.min(count, buf.remaining() / 48)).map { i =>
      val src = ip(buf.getInt); val dst = ip(buf.getInt); val hop = ip(buf.getInt)
      val in = buf.getShort & 0xffff; val outIf = buf.getShort & 0xffff
      val pkts = buf.getInt.toLong & 0xffffffffL
      val bytes = buf.getInt.toLong & 0xffffffffL
      val first = buf.getInt.toLong & 0xffffffffL
      val last = buf.getInt.toLong & 0xffffffffL
      val sport = buf.getShort & 0xffff; val dport = buf.getShort & 0xffff
      buf.get // pad
      val flags = buf.get & 0xff; val prot = buf.get & 0xff; val tos = buf.get & 0xff
      val srcAs = buf.getShort & 0xffff; val dstAs = buf.getShort & 0xffff
      val srcMask = buf.get & 0xff; val dstMask = buf.get & 0xff
      buf.getShort // pad2
      val firstEpoch = unixSecs - (uptime - first) / 1000.0
      val lastEpoch = unixSecs - (uptime - last) / 1000.0
      s"""{"version":$version,"flow_seq_num":${flowSeq + i},""" +
        s""""ipv4_src_addr":"$src","ipv4_dst_addr":"$dst","ipv4_next_hop":"$hop",""" +
        s""""input_snmp":$in,"output_snmp":$outIf,"in_pkts":$pkts,"in_bytes":$bytes,""" +
        s""""first_switched":$firstEpoch,"last_switched":$lastEpoch,""" +
        s""""l4_src_port":$sport,"l4_dst_port":$dport,"tcp_flags":$flags,""" +
        s""""protocol":$prot,"src_tos":$tos,"src_as":$srcAs,"dst_as":$dstAs,""" +
        s""""src_mask":$srcMask,"dst_mask":$dstMask}"""
    }
  }

  private val unpackAll = udf((b: Array[Byte]) => toJsonAll(b))

  val SchemaDdl: String = "version INT, flow_seq_num BIGINT, " +
    "ipv4_src_addr STRING, ipv4_dst_addr STRING, ipv4_next_hop STRING, " +
    "input_snmp INT, output_snmp INT, in_pkts BIGINT, in_bytes BIGINT, " +
    "first_switched DOUBLE, last_switched DOUBLE, l4_src_port INT, " +
    "l4_dst_port INT, tcp_flags INT, protocol INT, src_tos INT, " +
    "src_as INT, dst_as INT, src_mask INT, dst_mask INT"

  /** Decode a binary packet column: one event per v5 flow record. */
  def decode(df: DataFrame, source: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(SchemaDdl)
    val rest = df.columns.filter(_ != source).map(col).toSeq
    df.withColumn("_nf", explode(unpackAll(col(source))))
      .select(rest :+ from_json(col("_nf"), schema).as("_ev"): _*)
      .select(rest :+ col("_ev.*"): _*)
  }

  // ---- fixture/encode side

  /** Build one v5 packet from (srcIp, dstIp, pkts, bytes, sport, dport,
    * proto) tuples; first/last derived deterministically from the index.
    */
  def packet(unixSecs: Long, uptimeMs: Long, flowSeq: Long,
             recs: Seq[(Int, Int, Long, Long, Int, Int, Int)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24 + 48 * recs.length)
    bb.putShort(5).putShort(recs.length.toShort)
      .putInt(uptimeMs.toInt).putInt(unixSecs.toInt).putInt(0)
      .putInt(flowSeq.toInt).putShort(0).putShort(0)
    recs.zipWithIndex.foreach { case ((s, d, pk, by, sp, dp, pr), i) =>
      bb.putInt(s).putInt(d).putInt(0x0a000001)
        .putShort(1).putShort(2)
        .putInt(pk.toInt).putInt(by.toInt)
        .putInt((uptimeMs - 1000L * (i + 1)).toInt).putInt(uptimeMs.toInt)
        .putShort(sp.toShort).putShort(dp.toShort)
        .put(0.toByte).put(0x18.toByte).put(pr.toByte).put(0.toByte)
        .putShort(100).putShort(200).put(24.toByte).put(16.toByte).putShort(0)
    }
    bb.array()
  }
}
