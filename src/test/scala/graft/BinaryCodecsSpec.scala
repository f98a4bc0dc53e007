package graft

import graft.operators.{Collectd, Netflow}

/** collectd + netflow binary codecs: packet build -> decode round-trips,
  * endianness (collectd GAUGE little-endian vs counter big-endian),
  * malformed-tail tolerance, multi-record fan-out.
  */
class BinaryCodecsSpec extends SparkSpec {

  test("collectd: values parts emit one event each with accumulated metadata") {
    import spark.implicits._
    val pkt = Collectd.packet("web1", 1234L, "load", "x", "gauge3", "shortterm",
      10L, Seq(Seq(("gauge", 1.25), ("gauge", -2.5)), Seq(("counter", 77.0))))
    val out = Collectd.decode(Seq(pkt).toDF("frame"), "frame")
      .orderBy("dstypes").collect()
    assert(out.length == 2)
    val byKinds = out.map(r => (r.getSeq[String](8).mkString(","),
      r.getSeq[Double](7))).toMap
    assert(byKinds("gauge,gauge") == Seq(1.25, -2.5))
    assert(byKinds("counter") == Seq(77.0))
    assert(out.forall(r => r.getString(0) == "web1" && r.getDouble(1) == 1234.0 &&
      r.getString(2) == "load" && r.getString(5) == "shortterm" &&
      r.getDouble(6) == 10.0))
  }

  test("collectd: hi-res time/interval decode in 2^-30 units; malformed tail drops") {
    import spark.implicits._
    // hand-build: host + time_hires + one gauge values part + garbage tail
    def strPart(t: Int, s: String): Array[Byte] = {
      val p = s.getBytes("UTF-8") :+ 0.toByte
      java.nio.ByteBuffer.allocate(4 + p.length)
        .putShort(t.toShort).putShort((4 + p.length).toShort).put(p).array()
    }
    val timeHires = java.nio.ByteBuffer.allocate(12)
      .putShort(0x0008).putShort(12).putLong(3L << 30).array() // 3.0 s
    val vp = java.nio.ByteBuffer.allocate(15)
      .putShort(0x0006).putShort(15).putShort(1).put(1.toByte)
    vp.order(java.nio.ByteOrder.LITTLE_ENDIAN).putDouble(9.5)
    val garbage = Array[Byte](0x00, 0x01, 0x00) // truncated part header
    val pkt = strPart(0x0000, "hr") ++ timeHires ++ vp.array() ++ garbage
    val out = Collectd.decode(Seq(pkt).toDF("frame"), "frame").collect()
    assert(out.length == 1)
    assert(out(0).getDouble(1) == 3.0)
    assert(out(0).getSeq[Double](7) == Seq(9.5))
  }

  test("netflow v5: multi-record packets fan out; non-v5 drops") {
    import spark.implicits._
    val pkt = Netflow.packet(1600000000L, 360000L, 10L,
      Seq(((10 << 24) | 5, (172 << 24) | (16 << 16), 42L, 4200L, 5353, 53, 17),
        ((10 << 24) | 6, (172 << 24) | (16 << 16) | 1, 1L, 40L, 443, 443, 6)))
    val v9junk = java.nio.ByteBuffer.allocate(24).putShort(9).putShort(1).array()
    val out = Netflow.decode(Seq(pkt, v9junk).toDF("frame"), "frame")
      .orderBy("flow_seq_num").collect()
    assert(out.length == 2)
    val r0 = out(0)
    assert(r0.getAs[String]("ipv4_src_addr") == "10.0.0.5")
    assert(r0.getAs[String]("ipv4_dst_addr") == "172.16.0.0")
    assert(r0.getAs[Long]("in_pkts") == 42L && r0.getAs[Long]("in_bytes") == 4200L)
    assert(r0.getAs[Int]("l4_src_port") == 5353 && r0.getAs[Int]("protocol") == 17)
    // first = uptime - 1000*(i+1) -> epoch = unix_secs - (i+1)
    assert(r0.getAs[Double]("first_switched") == 1600000000.0 - 1.0)
    assert(r0.getAs[Double]("last_switched") == 1600000000.0)
    assert(out(1).getAs[Int]("protocol") == 6)
    assert(out(1).getAs[Long]("flow_seq_num") == 11L)
  }

  test("ganglia: XDR round-trip across padding lengths, types, escapes") {
    import spark.implicits._
    val G = graft.operators.Ganglia
    // hosts of length 0..8 hit every pad-to-4 remainder; values exercise all five
    // wire types plus a quote/backslash/unicode string and an escape in name
    val hosts = (0 to 8).map(n => "h" * n)
    val frames = hosts.zipWithIndex.flatMap { case (h, i) =>
      val name = if (i == 3) "m\"\\β" else s"m$i"
      Seq(
        G.metaPacket(h, name, "double", "u" * (i % 5), slope = i % 5,
          tmax = 60, dmax = 0),
        i % 5 match {
          case 0 => G.valueInt(h, name, -i)
          case 1 => G.valueUint(h, name, 4294967295L - i)
          case 2 => G.valueString(h, name, s"v\"$i\\π")
          case 3 => G.valueFloat(h, name, i.toFloat)
          case 4 => G.valueDouble(h, name, i + 0.5)
        })
    }
    val out = G.decode(frames.toDF("frame"), "frame")
      .orderBy("name").collect()
    assert(out.length == 9, out.length)
    val byName = out.map(r => r.getAs[String]("name") -> r).toMap
    assert(byName("m0").getAs[String]("val") == "0")
    assert(byName("m1").getAs[String]("val") == "4294967294")
    assert(byName("m2").getAs[String]("val") == "v\"2\\π")
    assert(byName("m\"\\β").getAs[String]("val") == "3.0")
    assert(byName("m4").getAs[String]("val") == "4.5")
    assert(byName("m5").getAs[String]("val") == "-5")
    // metadata annotation joined for every row (no missing tags)
    assert(out.forall(_.getAs[scala.collection.Seq[String]]("tags").isEmpty))
    assert(out.forall(_.getAs[String]("value_type") == "double"))
    val slopes = hosts.indices.map(i =>
      byName(if (i == 3) "m\"\\β" else s"m$i").getAs[String]("slope"))
    assert(slopes == Seq("zero", "positive", "negative", "both", "unspecified",
      "zero", "positive", "negative", "both"), slopes)
  }
}
