package graft

import org.apache.spark.sql.functions._

/** BeatsSource: a synthetic lumberjack-v2 client (window + json frames +
  * data frames + zlib-compressed frames) against the listener — acks arrive
  * after the journal append, events read back through the batch source and
  * a json filter from config text.
  */
class BeatsSpec extends SparkSpec {

  private def frameW(n: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(6)
    b.put('2'.toByte).put('W'.toByte).putInt(n); b.array()
  }
  private def frameJ(seq: Int, json: String): Array[Byte] = {
    val p = json.getBytes("UTF-8")
    val b = java.nio.ByteBuffer.allocate(10 + p.length)
    b.put('2'.toByte).put('J'.toByte).putInt(seq).putInt(p.length).put(p); b.array()
  }
  private def frameD(seq: Int, pairs: Seq[(String, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    o.writeByte('2'); o.writeByte('D'); o.writeInt(seq); o.writeInt(pairs.length)
    pairs.foreach { case (k, v) =>
      val kb = k.getBytes("UTF-8"); val vb = v.getBytes("UTF-8")
      o.writeInt(kb.length); o.write(kb); o.writeInt(vb.length); o.write(vb)
    }
    bos.toByteArray
  }
  private def frameC(inner: Array[Byte]*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.util.zip.DeflaterOutputStream(bos)
    inner.foreach(d.write); d.finish()
    val packed = bos.toByteArray
    val b = java.nio.ByteBuffer.allocate(6 + packed.length)
    b.put('2'.toByte).put('C'.toByte).putInt(packed.length).put(packed); b.array()
  }

  test("lumberjack v2: window/json/data/compressed frames journal + ack") {
    val port = 15971
    val tmp = java.nio.file.Files.createTempDirectory("graft_beats")
    val journal = tmp.resolve("beats.journal")
    graft.sources.BeatsSource.ensureListener(port, journal)
    try {
      val sock = new java.net.Socket("127.0.0.1", port)
      val out = sock.getOutputStream
      val in = new java.io.DataInputStream(sock.getInputStream)
      // window of 3, then three JSON events -> expect ack(3) after the third
      out.write(frameW(3))
      out.write(frameJ(1, """{"message":"b-1","beat":"filebeat"}"""))
      out.write(frameJ(2, """{"message":"b-2","beat":"filebeat"}"""))
      out.write(frameJ(3, """{"message":"b-3","beat":"filebeat"}"""))
      out.flush()
      assert(in.readByte() == '2'.toByte && in.readByte() == 'A'.toByte)
      assert(in.readInt() == 3)
      // a compressed batch of two DATA frames, new window; sequence numbers
      // keep increasing within the connection (real beats clients never
      // reset), so the ack carries the highest seq
      out.write(frameW(2))
      out.write(frameC(
        frameD(4, Seq("message" -> "d-1", "host" -> "h1")),
        frameD(5, Seq("message" -> "d-2", "host" -> "h2"))))
      out.flush()
      assert(in.readByte() == '2'.toByte && in.readByte() == 'A'.toByte)
      assert(in.readInt() == 5)
      sock.close()

      // journal holds one JSON line per event, in arrival order
      val lines = java.nio.file.Files.readAllLines(journal)
      assert(lines.size == 5)
      assert(lines.get(0).contains("\"b-1\"") && lines.get(4).contains("\"d-2\""))

      // events flow through the batch source + json filter from CONFIG TEXT
      val cfg = graft.lscl.Lscl.parse(
        s"""input { beats { port => $port journal => "$journal" } }
           |filter { json { source => "message" schema => "message STRING, beat STRING, host STRING" } }
           |""".stripMargin, Map.empty)
      val df = graft.lscl.LsclRun.applyFilters(
        graft.lscl.LsclRun.source(spark, cfg.inputs), cfg.filters)
      val got = df.select("message", "host").orderBy("message")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(got == Seq(("b-1", null), ("b-2", null), ("b-3", null),
        ("d-1", "h1"), ("d-2", "h2")))
    } finally graft.sources.BeatsSource.stopListener(port)
  }
}
