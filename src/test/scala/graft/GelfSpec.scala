package graft

import org.apache.spark.sql.functions._
import graft.operators.Gelf

/** GELF codec: frame split, gzip/zlib/plain inflate, chunk reassembly
  * (out-of-order + incomplete), remap/strip options, encode round-trip,
  * and the live udp { codec => gelf } path over a loopback socket.
  */
class GelfSpec extends SparkSpec {

  private def gz(j: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.util.zip.GZIPOutputStream(bos)
    o.write(j.getBytes("UTF-8")); o.close(); bos.toByteArray
  }

  private val Ddl = "version STRING, host STRING, short_message STRING, " +
    "full_message STRING, timestamp DOUBLE, level BIGINT, _facility STRING"

  test("whole frames decode across all three compressions; remap prefers full_message") {
    import spark.implicits._
    val mk = (i: Int, full: String) =>
      s"""{"version":"1.1","host":"h$i","short_message":"sm$i"$full,""" +
        s""""timestamp":${100 + i}.25,"level":$i,"_facility":"fx"}"""
    val frames = Seq(
      mk(0, ""","full_message":"fm0"""").getBytes("UTF-8"),
      Gelf.deflate(mk(1, "")),
      gz(mk(2, ""","full_message":"""""))) // empty full_message -> short wins
    val out = Gelf.decode(frames.toDF("frame"), "frame", Ddl)
      .orderBy("host")
      .select("host", "message", "facility", "level")
      .collect()
    assert(out.map(_.getString(1)).toSeq == Seq("fm0", "sm1", "sm2"))
    assert(out.forall(_.getString(2) == "fx"))
    // @timestamp promoted, raw timestamp column gone
    val cols = Gelf.decode(frames.toDF("frame"), "frame", Ddl).columns.toSet
    assert(cols.contains("@timestamp") && !cols.contains("timestamp"))
  }

  test("chunked frames reassemble out of order; incomplete groups drop") {
    import spark.implicits._
    val json =
      """{"version":"1.1","host":"big","short_message":"reassembled","timestamp":1.0,"level":1,"_facility":"f"}"""
    val chunks = Gelf.chunk(Gelf.deflate(json + " " * 500), 5, seed = 42L)
    assert(chunks.length == 5)
    val orphan = Gelf.chunk("{\"host\":\"never\"}".getBytes("UTF-8"), 3, seed = 7L)
    // shuffle chunk arrival order; drop one orphan chunk (incomplete group)
    val frames = (chunks.reverse ++ orphan.take(2)).toDF("frame")
    val out = Gelf.decode(frames, "frame", Ddl).select("host", "message").collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "big" && out(0).getString(1) == "reassembled")
  }

  test("remap=false and strip=false keep the raw shape; encode round-trips") {
    import spark.implicits._
    val json =
      """{"version":"1.1","host":"h","short_message":"s","timestamp":2.0,"level":3,"_facility":"f"}"""
    val raw = Gelf.decode(Seq(json.getBytes("UTF-8")).toDF("frame"), "frame", Ddl,
      remap = false, stripLeadingUnderscore = false)
    assert(raw.columns.contains("_facility") && !raw.columns.contains("message"))
    // encode (zlib default) -> decode round-trip
    val enc = spark.range(3).select(Gelf.encode(Seq(
      "host" -> concat(lit("rt"), col("id")),
      "short_message" -> lit("m"),
      "timestamp" -> (col("id") + 0.5),
      "level" -> col("id"),
      "_facility" -> lit("rtf"))).as("frame"))
    val back = Gelf.decode(enc, "frame", Ddl).orderBy("host")
      .select("host", "message", "facility", "level").collect()
    assert(back.map(_.getString(0)).toSeq == Seq("rt0", "rt1", "rt2"))
    assert(back.forall(r => r.getString(1) == "m" && r.getString(2) == "rtf"))
  }

  test("udp { codec => gelf } journals whole datagrams base64 and decodes live") {
    val port = 15957
    val tmp = java.nio.file.Files.createTempDirectory("graft_gelf_udp")
    val journal = tmp.resolve("gelf.journal")
    graft.sources.UdpSource.ensureListener(port, journal, base64Frames = true)
    try {
      val sock = new java.net.DatagramSocket()
      val body =
        """{"version":"1.1","host":"live","short_message":"over\nudp","timestamp":9.5,"level":6,"_facility":"net"}"""
      // one zlib whole frame + one 3-chunk gzip message (binary, has NULs)
      val whole = Gelf.deflate(body)
      val chunked = Gelf.chunk(gz(body.replace("live", "live2")), 3, seed = 99L)
      try (Seq(whole) ++ chunked).foreach { b =>
        sock.send(new java.net.DatagramPacket(b, b.length,
          java.net.InetAddress.getLoopbackAddress, port))
      } finally sock.close()
      val deadline = System.currentTimeMillis() + 30000
      while ((!java.nio.file.Files.exists(journal) ||
          java.nio.file.Files.readAllLines(journal).size() < 4) &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      val cfg = graft.lscl.Lscl.parse(
        s"""input { udp { port => $port journal => "$journal"
           |  codec => gelf { schema => "$Ddl" } } }""".stripMargin, Map.empty)
      val out = graft.lscl.LsclRun.source(spark, cfg.inputs)
        .orderBy("host").select("host", "message", "facility").collect()
      assert(out.length == 2)
      assert(out.map(_.getString(0)).toSeq == Seq("live", "live2"))
      // embedded newline survives the binary journal (would split in line mode)
      assert(out.forall(_.getString(1) == "over\nudp"))
      assert(out.forall(_.getString(2) == "net"))
    } finally graft.sources.UdpSource.stopListener(port)
  }

  test("the NAMED gelf input is the udp+codec lowering (default-able port)") {
    val port = 15993
    val tmp = java.nio.file.Files.createTempDirectory("graft_gelf_named")
    val journal = tmp.resolve("gelf_named.journal")
    graft.sources.UdpSource.ensureListener(port, journal, base64Frames = true)
    try {
      val sock = new java.net.DatagramSocket()
      val b = Gelf.deflate(
        """{"version":"1.1","host":"nmd","short_message":"hi","level":4}""")
      try sock.send(new java.net.DatagramPacket(b, b.length,
        java.net.InetAddress.getLoopbackAddress, port))
      finally sock.close()
      val deadline = System.currentTimeMillis() + 30000
      while ((!java.nio.file.Files.exists(journal) ||
          java.nio.file.Files.readAllLines(journal).size() < 1) &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      val cfg = graft.lscl.Lscl.parse(
        s"""input { gelf { port => $port journal => "$journal"
           |  schema => "$Ddl" } }""".stripMargin, Map.empty)
      val out = graft.lscl.LsclRun.source(spark, cfg.inputs)
        .select("host", "message", "level").collect()
      assert(out.length == 1)
      assert(out(0).getString(0) == "nmd" && out(0).getString(1) == "hi")
      // schema is the codec contract on the named form too
      val e = intercept[IllegalArgumentException] {
        graft.lscl.LsclRun.source(spark, graft.lscl.Lscl.parse(
          s"""input { gelf { port => $port journal => "$journal" } }""",
          Map.empty).inputs)
      }
      assert(e.getMessage.contains("schema"), e.getMessage)
    } finally graft.sources.UdpSource.stopListener(port)
  }

  test("runConfigStream: udp gelf config streams, restart picks up only the delta") {
    val port = 15958
    val tmp = java.nio.file.Files.createTempDirectory("graft_gelf_stream")
    val journal = tmp.resolve("gelf.journal")
    val out = s"$tmp/out"; val ck = s"$tmp/ck"
    graft.sources.UdpSource.ensureListener(port, journal, base64Frames = true)
    try {
      def send(ids: Range): Unit = {
        val sock = new java.net.DatagramSocket()
        try ids.foreach { i =>
          val b = Gelf.deflate(
            s"""{"version":"1.1","host":"s$i","short_message":"m$i","timestamp":$i.0,"level":1,"_facility":"f"}""")
          sock.send(new java.net.DatagramPacket(b, b.length,
            java.net.InetAddress.getLoopbackAddress, port))
        } finally sock.close()
      }
      def awaitLines(n: Int): Unit = {
        val deadline = System.currentTimeMillis() + 30000
        while ((!java.nio.file.Files.exists(journal) ||
            java.nio.file.Files.readAllLines(journal).size() < n) &&
            System.currentTimeMillis() < deadline) Thread.sleep(50)
      }
      val cfg =
        s"""input { udp { port => $port journal => "$journal"
           |  codec => gelf { schema => "$Ddl" } } }
           |filter { mutate { add_field => { "src" => "gelf-stream" } } }
           |output { sink { id => "s_gelf" } }
           |""".stripMargin
      def runOnce(): Unit = {
        val q = graft.lscl.LsclRun.runConfigStream(spark, cfg, out, ck, Map.empty)
        q.awaitTermination(120000); ()
      }
      send(0 until 20); awaitLines(20)
      runOnce()
      val first = spark.read.parquet(s"$out/s_gelf")
      assert(first.count() == 20)
      assert(first.filter(col("src") === "gelf-stream").count() == 20)
      assert(first.select("host").distinct().count() == 20)
      // restart: only the 5 new frames land (exactly-once over the journal)
      send(20 until 25); awaitLines(25)
      runOnce()
      val all = spark.read.parquet(s"$out/s_gelf")
      assert(all.count() == 25)
      assert(all.select("host").distinct().count() == 25)
    } finally graft.sources.UdpSource.stopListener(port)
  }
}
