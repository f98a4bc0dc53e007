package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SNMP trap codec (the logstash-input-snmptrap surface): decode SNMPv1
  * Trap-PDUs and SNMPv2c TRAP PDUs from raw BER/ASN.1 datagrams — the
  * PUBLIC wire format (RFC 1157 for v1, RFC 3416 for v2c, BER per X.690);
  * the parser here is original, written from the TLV rules.
  *
  *   Message    = SEQ { INTEGER version (0=v1, 1=v2c), OCTET STRING
  *                community, PDU }
  *   v1 PDU     = [4] SEQ { OID enterprise, IpAddress agent-addr,
  *                INTEGER generic-trap, INTEGER specific-trap,
  *                TimeTicks time-stamp, varbind list }
  *   v2c PDU    = [7] SEQ { INTEGER request-id, INTEGER error-status,
  *                INTEGER error-index, varbind list }
  *   varbinds   = SEQ of SEQ { OID, value }
  *
  * Spark-first decode: ONE narrow bytes→struct UDF at the binary seam (a
  * datagram is one trap — no explode, no exchange); varbinds land as a
  * `map<oid, rendered value>` exactly like the reference's per-OID event
  * fields. Value rendering: INTEGER/Counter/Gauge/TimeTicks/Counter64 as
  * decimal (application tags unsigned), OCTET STRING as UTF-8 when
  * printable else hex, OID dotted, IpAddress dotted-quad, NULL as "null".
  * Unparseable datagrams yield null fields + `_snmptrapparsefailure`.
  */
object Snmp {

  // ---- BER encode (fixture/test side — the reference never encodes traps,
  // but deterministic archives need a writer, like Collectd.packet) ----

  private def berLen(n: Int): Array[Byte] =
    if (n < 0x80) Array(n.toByte)
    else if (n < 0x100) Array(0x81.toByte, n.toByte)
    else Array(0x82.toByte, (n >> 8).toByte, n.toByte)

  private def tlv(tag: Int, content: Array[Byte]): Array[Byte] =
    Array(tag.toByte) ++ berLen(content.length) ++ content

  private def berInt(v: Long, tag: Int = 0x02): Array[Byte] =
    tlv(tag, BigInt(v).toByteArray)

  /** Unsigned application-tag integer (Counter32/Gauge32/TimeTicks): the
    * tag implies unsigned, so the two's-complement sign pad drops.
    */
  private def berUInt(v: Long, tag: Int): Array[Byte] = {
    require(v >= 0, s"application-tag integer must be unsigned, got $v")
    val raw = BigInt(v).toByteArray
    tlv(tag, if (raw.length > 1 && raw(0) == 0) raw.tail else raw)
  }

  def oidBytes(oid: String): Array[Byte] = {
    val parts = oid.split('.').map(_.toLong)
    require(parts.length >= 2, s"oid needs >= 2 arcs: $oid")
    val out = new java.io.ByteArrayOutputStream()
    // X.690: the first SUBIDENTIFIER is 40*arc1 + arc2, itself base-128
    // (arc1=2 allows arc2 > 39, pushing it past one octet)
    ((parts(0) * 40 + parts(1)) +: parts.drop(2)).foreach { v =>
      val groups = scala.collection.mutable.ArrayBuffer.empty[Int]
      var x = v
      groups.prepend((x & 0x7f).toInt); x >>= 7
      while (x > 0) { groups.prepend(((x & 0x7f) | 0x80).toInt); x >>= 7 }
      groups.foreach(out.write)
    }
    tlv(0x06, out.toByteArray)
  }

  /** One varbind value: Left = OCTET STRING, Right = INTEGER. */
  private def varbinds(vbs: Seq[(String, Either[String, Long])]): Array[Byte] =
    tlv(0x30, vbs.flatMap { case (oid, v) =>
      tlv(0x30, oidBytes(oid) ++ (v match {
        case Left(s) => tlv(0x04, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        case Right(n) => berInt(n)
      }))
    }.toArray)

  /** Encode one SNMPv1 trap datagram. */
  def trapV1(community: String, enterprise: String, agentAddr: String,
             genericTrap: Int, specificTrap: Int, timeticks: Long,
             vbs: Seq[(String, Either[String, Long])]): Array[Byte] = {
    val addr = agentAddr.split('.').map(p => p.toInt.toByte)
    require(addr.length == 4, s"agent addr must be dotted quad: $agentAddr")
    val pdu = tlv(0xA4,
      oidBytes(enterprise) ++ tlv(0x40, addr) ++ berInt(genericTrap.toLong) ++
        berInt(specificTrap.toLong) ++ berUInt(timeticks, 0x43) ++ varbinds(vbs))
    tlv(0x30, berInt(0L) ++
      tlv(0x04, community.getBytes(java.nio.charset.StandardCharsets.UTF_8)) ++ pdu)
  }

  /** Encode one SNMPv2c TRAP datagram. */
  def trapV2c(community: String, requestId: Long,
              vbs: Seq[(String, Either[String, Long])]): Array[Byte] = {
    val pdu = tlv(0xA7,
      berInt(requestId) ++ berInt(0L) ++ berInt(0L) ++ varbinds(vbs))
    tlv(0x30, berInt(1L) ++
      tlv(0x04, community.getBytes(java.nio.charset.StandardCharsets.UTF_8)) ++ pdu)
  }

  // ---- BER decode ----

  private final class Reader(b: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    /** Read one TLV; returns (tag, content start, content end). */
    def tlv(): (Int, Int, Int) = {
      val tag = b(pos) & 0xff; pos += 1
      var len = b(pos) & 0xff; pos += 1
      if ((len & 0x80) != 0) {
        val n = len & 0x7f
        require(n >= 1 && n <= 4, s"BER length-of-length $n unsupported")
        len = 0
        (0 until n).foreach { _ => len = (len << 8) | (b(pos) & 0xff); pos += 1 }
      }
      val start = pos
      pos += len
      require(pos <= end, "BER content overruns the datagram")
      (tag, start, pos)
    }
  }

  private def sliceOf(b: Array[Byte], s: Int, e: Int): Array[Byte] =
    java.util.Arrays.copyOfRange(b, s, e)

  private def decodeOid(b: Array[Byte]): String = {
    if (b.isEmpty) return ""
    val sb = new java.lang.StringBuilder
    var i = 0
    var cur = 0L
    var first = true
    while (i < b.length) {
      cur = (cur << 7) | (b(i) & 0x7f)
      if ((b(i) & 0x80) == 0) {
        if (first) {
          // X.690 decode rule: < 40 -> (0, v); < 80 -> (1, v-40); else (2, v-80)
          val a1 = math.min(cur / 40, 2L)
          sb.append(a1).append('.').append(cur - a1 * 40)
          first = false
        } else sb.append('.').append(cur)
        cur = 0L
      }
      i += 1
    }
    sb.toString
  }

  private def printable(b: Array[Byte]): Boolean =
    b.forall(c => c >= 0x20 && c < 0x7f)

  private def renderValue(tag: Int, c: Array[Byte]): String = tag match {
    case 0x02 => new java.math.BigInteger(if (c.isEmpty) Array(0.toByte) else c).toString
    case 0x41 | 0x42 | 0x43 | 0x46 => // Counter32/Gauge32/TimeTicks/Counter64
      new java.math.BigInteger(1, if (c.isEmpty) Array(0.toByte) else c).toString
    case 0x04 =>
      if (printable(c)) new String(c, java.nio.charset.StandardCharsets.UTF_8)
      else c.map(x => f"${x & 0xff}%02x").mkString
    case 0x05 => "null"
    case 0x06 => decodeOid(c)
    case 0x40 => c.map(x => (x & 0xff).toString).mkString(".")
    case other => s"0x${c.map(x => f"${x & 0xff}%02x").mkString} (tag $other)"
  }

  private def decodeVarbinds(b: Array[Byte], s: Int, e: Int): Map[String, String] = {
    val r = new Reader(b, s, e)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    while (r.hasNext) {
      val (t, vs, ve) = r.tlv()
      require(t == 0x30, s"varbind must be a SEQUENCE, got tag $t")
      val inner = new Reader(b, vs, ve)
      val (ot, os, oe) = inner.tlv()
      require(ot == 0x06, s"varbind name must be an OID, got tag $ot")
      val (vt, vvs, vve) = inner.tlv()
      out(decodeOid(sliceOf(b, os, oe))) = renderValue(vt, sliceOf(b, vvs, vve))
    }
    out.toMap
  }

  /** Decoded trap; v1-only fields null for v2c and vice versa. */
  final case class Trap(snmp_version: String, community: String,
                        enterprise: String, agent_addr: String,
                        generic_trap: Option[Int], specific_trap: Option[Int],
                        timeticks: Option[Long], request_id: Option[Long],
                        varbinds: Map[String, String])

  def decodeTrap(b: Array[Byte]): Trap =
    try {
      val msg = new Reader(b, 0, b.length)
      val (mt, ms, me) = msg.tlv()
      require(mt == 0x30, s"message must be a SEQUENCE, got $mt")
      val r = new Reader(b, ms, me)
      val (vt, vs, ve) = r.tlv()
      require(vt == 0x02, "version must be INTEGER")
      val version = new java.math.BigInteger(sliceOf(b, vs, ve)).intValueExact()
      val (ct, cs, ce) = r.tlv()
      require(ct == 0x04, "community must be OCTET STRING")
      val community = new String(sliceOf(b, cs, ce),
        java.nio.charset.StandardCharsets.UTF_8)
      val (pt, ps, pe) = r.tlv()
      (version, pt) match {
        case (0, 0xA4) =>
          val p = new Reader(b, ps, pe)
          val (et, es, ee) = p.tlv(); require(et == 0x06, "enterprise must be OID")
          val (at, as0, ae) = p.tlv(); require(at == 0x40 || at == 0x04,
            "agent-addr must be IpAddress")
          val (gt, gs, ge) = p.tlv(); require(gt == 0x02, "generic-trap INTEGER")
          val (st, ss, se) = p.tlv(); require(st == 0x02, "specific-trap INTEGER")
          val (tt, ts, te) = p.tlv(); require(tt == 0x43 || tt == 0x02,
            "time-stamp TimeTicks")
          val (bt, bs, be) = p.tlv(); require(bt == 0x30, "varbind list SEQUENCE")
          Trap("1", community,
            decodeOid(sliceOf(b, es, ee)),
            sliceOf(b, as0, ae).map(x => (x & 0xff).toString).mkString("."),
            Some(new java.math.BigInteger(sliceOf(b, gs, ge)).intValueExact()),
            Some(new java.math.BigInteger(sliceOf(b, ss, se)).intValueExact()),
            Some(new java.math.BigInteger(1, sliceOf(b, ts, te)).longValueExact()),
            None, decodeVarbinds(b, bs, be))
        case (1, 0xA7) =>
          val p = new Reader(b, ps, pe)
          val (rt, rs, re) = p.tlv(); require(rt == 0x02, "request-id INTEGER")
          p.tlv(); p.tlv() // error-status, error-index
          val (bt, bs, be) = p.tlv(); require(bt == 0x30, "varbind list SEQUENCE")
          Trap("2c", community, null, null, None, None, None,
            Some(new java.math.BigInteger(sliceOf(b, rs, re)).longValueExact()),
            decodeVarbinds(b, bs, be))
        case (v, t) => throw new IllegalArgumentException(
          s"unsupported snmp version $v / pdu tag $t")
      }
    } catch {
      case scala.util.control.NonFatal(_) =>
        Trap(null, null, null, null, None, None, None, None, null)
    }

  private val decodeU = udf((b: Array[Byte]) =>
    if (b == null) Trap(null, null, null, null, None, None, None, None, null)
    else decodeTrap(b))

  /** Decode a binary datagram column into trap events; parse failure =
    * null fields + `_snmptrapparsefailure` tag.
    */
  def decode(df: DataFrame, source: String): DataFrame = {
    val rest = df.columns.filter(_ != source).map(col).toSeq
    df.select(rest :+ decodeU(col(source)).as("_trap"): _*)
      .select(rest :+ col("_trap.*"): _*)
      .withColumn("tags",
        when(col("snmp_version").isNull, array(lit("_snmptrapparsefailure")))
          .otherwise(array().cast("array<string>")))
  }
}
