package graft.operators

import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** MaxMind DB (mmdb) binary format — reader + minimal fixture writer.
  *
  * The FORMAT is public (the MaxMind DB File Format Specification v2.0,
  * maxmind.github.io/MaxMind-DB): a binary search tree over IP bits (one
  * node per bit, two `record_size`-bit records per node), a 16-zero-byte
  * separator, a data section of typed values (pointer / utf8 / double /
  * bytes / u16 / u32 / map / i32 / u64 / u128 / array / bool / float with
  * extended-type and extended-size control bytes), and a metadata map after
  * the last `\xAB\xCD\xEFMaxMind.com` marker. This is what the reference's
  * geoip filter loads (via libmaxmind); no MaxMind code or data is used
  * here — only the published format.
  *
  * Spark integration stance: a geo DB is config-sized, so the 100 TB plan
  * decodes it ONCE on the driver into (ip_lo, ip_hi, fields...) ranges and
  * broadcasts them into the existing range join ([[Enrich.geoLookup]]) —
  * the scan side stays a narrow probe, no per-row tree walk on executors.
  */
object Mmdb {

  final case class Metadata(nodeCount: Int, recordSize: Int, ipVersion: Int,
                            databaseType: String)

  private val Marker: Array[Byte] =
    Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++ "MaxMind.com".getBytes("US-ASCII")

  def read(path: String): Reader = new Reader(Files.readAllBytes(Paths.get(path)))

  final class Reader(bytes: Array[Byte]) {

    private def u8(i: Int): Int = bytes(i) & 0xff
    private def beInt(off: Int, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | u8(off + i); i += 1 }
      v
    }

    /** Decode one data-section value at absolute offset; returns (value,
      * offset-after). Pointers are followed for the value but the returned
      * offset is after the pointer bytes.
      */
    private def decodeAt(off: Int, dataStart: Int): (Any, Int) = {
      val ctrl = u8(off)
      var typ = ctrl >> 5
      var szBits = ctrl & 0x1f
      var p = off + 1
      if (typ == 0) { typ = u8(p) + 7; p += 1 } // extended type
      if (typ == 1) { // pointer (size bits encode pointer width + high bits)
        val ss = (szBits >> 3) & 3
        val v = szBits & 7
        val (target, after) = ss match {
          case 0 => ((v.toLong << 8) | beInt(p, 1), p + 1)
          case 1 => (((v.toLong << 16) | beInt(p, 2)) + 2048L, p + 2)
          case 2 => (((v.toLong << 24) | beInt(p, 3)) + 526336L, p + 3)
          case _ => (beInt(p, 4), p + 4)
        }
        val (value, _) = decodeAt(dataStart + target.toInt, dataStart)
        return (value, after)
      }
      var size = szBits
      if (size == 29) { size = 29 + u8(p); p += 1 }
      else if (size == 30) { size = 285 + beInt(p, 2).toInt; p += 2 }
      else if (size == 31) { size = 65821 + beInt(p, 3).toInt; p += 3 }
      typ match {
        case 2 => (new String(bytes, p, size, "UTF-8"), p + size) // utf8
        case 3 => (java.lang.Double.longBitsToDouble(beInt(p, 8)), p + 8)
        case 4 => (java.util.Arrays.copyOfRange(bytes, p, p + size), p + size)
        case 5 | 6 | 9 => (beInt(p, size), p + size) // u16 / u32 / u64
        case 7 => // map: size = number of entries, keys are strings
          var q = p
          val m = mutable.LinkedHashMap.empty[String, Any]
          for (_ <- 0 until size) {
            val (k, q1) = decodeAt(q, dataStart)
            val (v, q2) = decodeAt(q1, dataStart)
            m += k.asInstanceOf[String] -> v
            q = q2
          }
          (m.toMap, q)
        case 8 => // signed i32
          val raw = beInt(p, size)
          val shifted = 64 - 8 * size
          ((raw << shifted) >> shifted, p + size)
        case 10 => (BigInt(1, java.util.Arrays.copyOfRange(bytes, p, p + size)), p + size)
        case 11 =>
          var q = p
          val out = Vector.newBuilder[Any]
          for (_ <- 0 until size) {
            val (v, q1) = decodeAt(q, dataStart); out += v; q = q1
          }
          (out.result(), q)
        case 14 => (size != 0, p) // boolean: value IS the size field
        case 15 => (java.lang.Float.intBitsToFloat(beInt(p, 4).toInt), p + 4)
        case other => throw new IllegalArgumentException(s"mmdb: type $other unsupported")
      }
    }

    val metadata: Metadata = {
      var at = -1
      var i = bytes.length - Marker.length
      while (i >= 0 && at < 0) {
        if (bytes.startsWith(Marker, i)) at = i else i -= 1
      }
      require(at >= 0, "mmdb: metadata marker not found")
      val (m0, _) = decodeAt(at + Marker.length, 0)
      val m = m0.asInstanceOf[Map[String, Any]]
      Metadata(
        nodeCount = m("node_count").asInstanceOf[Long].toInt,
        recordSize = m("record_size").asInstanceOf[Long].toInt,
        ipVersion = m("ip_version").asInstanceOf[Long].toInt,
        databaseType = m.get("database_type").map(_.toString).getOrElse(""))
    }

    private val treeSize = metadata.nodeCount.toLong * metadata.recordSize * 2 / 8
    private val dataStart = (treeSize + 16).toInt

    /** One record of node `n` (side 0 = left, 1 = right). */
    private def record(n: Int, side: Int): Int = metadata.recordSize match {
      case 24 =>
        beInt(n * 6 + side * 3, 3).toInt
      case 28 =>
        val base = n * 7
        if (side == 0) (((u8(base + 3) & 0xf0) >> 4) << 24 | beInt(base, 3).toInt)
        else ((u8(base + 3) & 0x0f) << 24 | beInt(base + 4, 3).toInt)
      case 32 =>
        beInt(n * 8 + side * 4, 4).toInt
      case other => throw new IllegalArgumentException(s"mmdb: record_size $other")
    }

    private def dataAt(rec: Int): Any =
      decodeAt(dataStart + (rec - metadata.nodeCount - 16), dataStart)._1

    /** Root node for IPv4 lookups: in an ip_version=6 database the v4 space
      * sits under 96 leading zero bits.
      */
    private val ipv4Root: Int = {
      var n = 0
      if (metadata.ipVersion == 6) {
        var i = 0
        while (i < 96 && n < metadata.nodeCount) { n = record(n, 0); i += 1 }
      }
      n
    }

    /** Look up an IPv4 address (as unsigned 32-bit in a Long). */
    def lookup4(ip: Long): Option[Any] = {
      var n = ipv4Root
      var bit = 31
      while (bit >= 0 && n < metadata.nodeCount) {
        n = record(n, ((ip >> bit) & 1).toInt)
        bit -= 1
      }
      if (n == metadata.nodeCount) None else Some(dataAt(n))
    }

    /** Enumerate the IPv4 leaf ranges (lo, hi, value) by tree walk — the
      * driver-side materialization the broadcast range join consumes.
      */
    def leafRanges4(): Seq[(Long, Long, Any)] = {
      val out = Seq.newBuilder[(Long, Long, Any)]
      def walk(n: Int, depth: Int, prefix: Long): Unit = {
        if (depth > 32) return
        for (side <- 0 to 1) {
          val pfx = (prefix << 1) | side
          val rec = record(n, side)
          if (rec < metadata.nodeCount) walk(rec, depth + 1, pfx)
          else if (rec > metadata.nodeCount) {
            val lo = pfx << (32 - (depth + 1))
            val hi = lo | ((1L << (32 - (depth + 1))) - 1)
            out += ((lo, hi, dataAt(rec)))
          }
        }
      }
      if (metadata.nodeCount > 0) walk(ipv4Root, 0, 0L)
      out.result()
    }
  }

  // ===================================================================
  // Fixture writer — a minimal, spec-conformant encoder (record_size 24,
  // ip_version 4) so the reader can be driven against REAL format bytes
  // without shipping anyone's database. Identical values are deduplicated
  // through pointers, which also exercises the reader's pointer decode.
  // ===================================================================

  def writeFixture(path: String, entries: Seq[(String, Map[String, Any])]): Unit =
    writeFixture(path, entries, recordSize = 24)

  def writeFixture(path: String, entries: Seq[(String, Map[String, Any])],
                   recordSize: Int): Unit = {
    require(recordSize == 24 || recordSize == 28, s"fixture supports 24/28, got $recordSize")
    // ---- data section ----
    val data = mutable.ArrayBuffer.empty[Byte]
    val seen = mutable.HashMap.empty[Any, Int] // value -> data-section offset
    def encStr(s: String): Unit = {
      val b = s.getBytes("UTF-8"); require(b.length < 29)
      data += ((2 << 5) | b.length).toByte; data ++= b
    }
    def encUInt(v: Long, typ: Int): Unit = {
      var n = 0; var x = v
      while (x != 0) { n += 1; x >>>= 8 }
      if (typ <= 7) data += ((typ << 5) | n).toByte
      else { data += n.toByte; data += (typ - 7).toByte } // extended
      for (i <- (n - 1) to 0 by -1) data += ((v >>> (8 * i)) & 0xff).toByte
    }
    def encValue(v: Any): Int = {
      seen.get(v) match {
        case Some(off) => // emit a pointer (SS=3: 4-byte absolute offset)
          val at = data.length
          data += ((1 << 5) | (3 << 3)).toByte
          for (i <- 3 to 0 by -1) data += ((off >>> (8 * i)) & 0xff).toByte
          at
        case None =>
          val at = data.length
          v match {
            case s: String => encStr(s)
            case m: Map[_, _] =>
              require(m.size < 29)
              data += ((7 << 5) | m.size).toByte
              m.foreach { case (k, mv) => encStr(k.asInstanceOf[String]); encValue(mv) }
            case i: Int => encUInt(i.toLong, 6)
            case l: Long => encUInt(l, 6)
            case other => throw new IllegalArgumentException(s"fixture: $other")
          }
          seen(v) = at
          at
      }
    }
    // ---- binary trie over the CIDRs ----
    final class Node { var left: Either[Node, Option[Int]] = Right(None)
                       var right: Either[Node, Option[Int]] = Right(None) }
    val root = new Node
    for ((cidr, value) <- entries) {
      val Array(ipStr, lenStr) = cidr.split("/")
      val octs = ipStr.split("\\.").map(_.toLong)
      val ip = ((octs(0) * 256 + octs(1)) * 256 + octs(2)) * 256 + octs(3)
      val len = lenStr.toInt
      val dataOff = encValue(value)
      var n = root
      for (b <- 0 until len) {
        val bit = ((ip >> (31 - b)) & 1).toInt
        def child = if (bit == 0) n.left else n.right
        def setChild(c: Either[Node, Option[Int]]): Unit =
          if (bit == 0) n.left = c else n.right = c
        if (b == len - 1) setChild(Right(Some(dataOff)))
        else child match {
          case Left(c) => n = c
          case Right(_) => val c = new Node; setChild(Left(c)); n = c
        }
      }
    }
    // number nodes (preorder) and serialize with record_size 24
    val nodes = mutable.ArrayBuffer.empty[Node]
    def index(n: Node): Unit = { nodes += n
      n.left.left.foreach(index); n.right.left.foreach(index) }
    index(root)
    val ids = nodes.zipWithIndex.toMap
    val nodeCount = nodes.length
    val nodeBytes = recordSize * 2 / 8
    val tree = new Array[Byte](nodeCount * nodeBytes)
    def recValue(e: Either[Node, Option[Int]]): Int = e match {
      case Left(c) => ids(c)
      case Right(None) => nodeCount
      case Right(Some(dataOff)) => nodeCount + 16 + dataOff
    }
    for ((n, i) <- nodes.zipWithIndex) {
      val l = recValue(n.left); val r = recValue(n.right)
      val base = i * nodeBytes
      if (recordSize == 24) {
        for (j <- 0 until 3) {
          tree(base + j) = ((l >>> (8 * (2 - j))) & 0xff).toByte
          tree(base + 3 + j) = ((r >>> (8 * (2 - j))) & 0xff).toByte
        }
      } else { // 28: [left 23..0][left 27..24 | right 27..24][right 23..0]
        for (j <- 0 until 3) {
          tree(base + j) = ((l >>> (8 * (2 - j))) & 0xff).toByte
          tree(base + 4 + j) = ((r >>> (8 * (2 - j))) & 0xff).toByte
        }
        tree(base + 3) = ((((l >>> 24) & 0x0f) << 4) | ((r >>> 24) & 0x0f)).toByte
      }
    }
    // ---- metadata ----
    val meta = mutable.ArrayBuffer.empty[Byte]
    def mStr(s: String): Unit = { val b = s.getBytes("UTF-8"); meta += ((2 << 5) | b.length).toByte; meta ++= b }
    def mUInt(v: Long, typ: Int): Unit = {
      var n = 0; var x = v
      while (x != 0) { n += 1; x >>>= 8 }
      if (typ <= 7) meta += ((typ << 5) | n).toByte
      else { meta += n.toByte; meta += (typ - 7).toByte }
      for (i <- (n - 1) to 0 by -1) meta += ((v >>> (8 * i)) & 0xff).toByte
    }
    meta += ((7 << 5) | 6).toByte // map of 6 entries
    mStr("binary_format_major_version"); mUInt(2, 5)
    mStr("binary_format_minor_version"); mUInt(0, 5)
    mStr("node_count"); mUInt(nodeCount.toLong, 6)
    mStr("record_size"); mUInt(recordSize.toLong, 5)
    mStr("ip_version"); mUInt(4, 5)
    mStr("database_type"); mStr("graft-fixture")
    // ---- assemble ----
    val out = new java.io.ByteArrayOutputStream()
    out.write(tree)
    out.write(new Array[Byte](16)) // data section separator
    out.write(data.toArray)
    out.write(Marker)
    out.write(meta.toArray)
    Files.write(Paths.get(path), out.toByteArray)
  }
}
