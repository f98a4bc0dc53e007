package graft

import java.nio.charset.StandardCharsets.UTF_8

/** RELP input: live-socket sessions against the listener (open offers,
  * syslog commands acked only after the durable journal append, close).
  */
class RelpSpec extends SparkSpec {

  private def frame(txnr: Long, cmd: String, data: String): Array[Byte] = {
    val d = data.getBytes(UTF_8)
    val head = s"$txnr $cmd ${d.length}" + (if (d.nonEmpty) " " else "")
    (head.getBytes(UTF_8) ++ d) :+ '\n'.toByte
  }

  /** Read one `TXNR rsp DATALEN [SP DATA] \n` response. */
  private def readRsp(in: java.io.InputStream): (Long, String) = {
    def token(): String = {
      val sb = new java.lang.StringBuilder
      var c = in.read()
      while (c != -1 && c != ' ' && c != '\n') { sb.append(c.toChar); c = in.read() }
      sb.toString
    }
    val txnr = token().toLong
    assert(token() == "rsp")
    val len = token().toInt
    val b = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val n = in.read(b, off, len - off); assert(n >= 0); off += n
    }
    if (len > 0) in.read() // trailer
    (txnr, new String(b, UTF_8))
  }

  test("relp session: open negotiates, syslog acks after durable append, close ends") {
    val port = 15973
    val tmp = java.nio.file.Files.createTempDirectory("graft_relp")
    val journal = tmp.resolve("relp.journal")
    graft.sources.RelpSource.ensureListener(port, journal)
    try {
      val sock = new java.net.Socket("127.0.0.1", port)
      try {
        val out = sock.getOutputStream
        val in = new java.io.BufferedInputStream(sock.getInputStream)
        out.write(frame(1, "open",
          "relp_version=0\nrelp_software=testclient,1.0\ncommands=syslog"))
        out.flush()
        val (t1, openRsp) = readRsp(in)
        assert(t1 == 1 && openRsp.startsWith("200 OK"))
        assert(openRsp.contains("commands=syslog"))

        (2 to 4).foreach { i =>
          out.write(frame(i, "syslog", s"<34>Oct 11 22:14:1$i host app: msg $i"))
          out.flush()
          val (t, rsp) = readRsp(in)
          assert(t == i && rsp == "200 OK")
          // ack implies durable: the journal already holds this message
          val lines = java.nio.file.Files.readAllLines(journal)
          assert(lines.size() >= i - 1 &&
            lines.get(i - 2).endsWith(s"msg $i"), s"journal=$lines")
        }

        out.write(frame(5, "close", "")); out.flush()
        val (t5, closeRsp) = readRsp(in)
        assert(t5 == 5 && closeRsp == "200 OK")
      } finally sock.close()

      // the LSCL relp input reads the journal through the FileTail machinery
      val cfg = graft.lscl.Lscl.parse(
        s"""input { relp { port => $port journal => "$journal" } }""",
        Map.empty)
      val rows = graft.lscl.LsclRun.source(spark, cfg.inputs)
        .orderBy("offset").select("message").collect()
      assert(rows.map(_.getString(0)).toSeq ==
        (2 to 4).map(i => s"<34>Oct 11 22:14:1$i host app: msg $i"))
    } finally graft.sources.RelpSource.stopListener(port)
  }

  test("relp listener: unknown commands get 500, session survives; embedded newline flattens") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_relp2")
    val journal = tmp.resolve("relp.journal")
    val listener = new graft.sources.RelpSource.Listener(0, journal)
    try {
      val sock = new java.net.Socket("127.0.0.1", listener.localPort)
      // (direct Listener — this test never reads through the source)
      try {
        val out = sock.getOutputStream
        val in = new java.io.BufferedInputStream(sock.getInputStream)
        out.write(frame(1, "open", "relp_version=0\ncommands=syslog")); out.flush()
        assert(readRsp(in)._2.startsWith("200 OK"))
        out.write(frame(2, "abort", "x")); out.flush()
        val (t2, r2) = readRsp(in)
        assert(t2 == 2 && r2.startsWith("500"))
        out.write(frame(3, "syslog", "line one\nline two")); out.flush()
        assert(readRsp(in)._2 == "200 OK")
      } finally sock.close()
      val lines = java.nio.file.Files.readAllLines(journal)
      assert(lines.size() == 1 && lines.get(0) == "line one line two")
    } finally listener.close()
  }
}
