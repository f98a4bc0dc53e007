package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** UdpSource: loopback datagrams -> journal -> byte-offset micro-batches,
  * same replayable-journal architecture as TcpSource; plus the syslog input
  * over its udp transport from config text.
  */
class UdpSpec extends SparkSpec {

  private def send(port: Int, payloads: Seq[String]): Unit = {
    val s = new java.net.DatagramSocket()
    try payloads.foreach { p =>
      val b = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      s.send(new java.net.DatagramPacket(b, b.length,
        java.net.InetAddress.getLoopbackAddress, port))
    } finally s.close()
  }

  private def awaitJournal(journal: java.nio.file.Path, bytes: Long): Unit = {
    val deadline = System.currentTimeMillis() + 30000
    while ((!java.nio.file.Files.exists(journal) ||
        java.nio.file.Files.size(journal) < bytes) &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(java.nio.file.Files.size(journal) >= bytes, "journal never filled")
  }

  test("datagrams stream exactly once; multi-line datagrams split per line") {
    val port = 15951
    val tmp = java.nio.file.Files.createTempDirectory("graft_udp")
    val journal = tmp.resolve("udp.journal")
    val ck = s"$tmp/ck"; val out = s"$tmp/out"
    graft.sources.UdpSource.ensureListener(port, journal)
    try {
      // 40 single-line datagrams + 10 two-line datagrams = 60 events
      val singles = (1 to 40).map(i => s"dgram-$i")
      val doubles = (1 to 10).map(i => s"pair-$i-a\npair-$i-b")
      send(port, singles ++ doubles)
      val expectedBytes =
        (singles.map(_.length + 1) ++ doubles.map(_.length + 1)).sum.toLong
      awaitJournal(journal, expectedBytes)

      def runOnce(): Unit = {
        val q = spark.readStream.format("graft.sources.UdpSource")
          .option("port", port).option("journal", journal.toString).load()
          .writeStream.option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .format("parquet").option("path", out).start()
        q.awaitTermination(60000); ()
      }
      runOnce()
      val rows = spark.read.parquet(out).collect()
      assert(rows.length == 60)
      assert(rows.map(_.getLong(0)).distinct.length == 60) // distinct offsets
      // restart with more datagrams: only the delta lands
      send(port, Seq("late-1"))
      awaitJournal(journal, expectedBytes + "late-1\n".length)
      runOnce()
      assert(spark.read.parquet(out).count() == 61)
    } finally graft.sources.UdpSource.stopListener(port)
  }

  test("syslog input over udp transport from config text") {
    val port = 15952
    val tmp = java.nio.file.Files.createTempDirectory("graft_udp_syslog")
    val journal = tmp.resolve("udp.journal")
    graft.sources.UdpSource.ensureListener(port, journal)
    try {
      val lines = (0 until 30).map(i =>
        f"<${i % 24}>Oct 11 22:14:${i % 60}%02d host${i % 3} app[${100 + i}]: boom $i")
      send(port, lines)
      awaitJournal(journal, lines.map(_.length + 1).sum.toLong)
      val cfg = graft.lscl.Lscl.parse(
        s"""input { syslog { port => $port protocol => "udp" journal => "$journal" } }""",
        Map.empty)
      val df = graft.lscl.LsclRun.source(spark, cfg.inputs)
      val got = df.select("priority", "severity", "facility", "logsource", "msgbody")
        .collect()
      assert(got.length == 30)
      assert(got.forall(r => r.getInt(1) == (r.getLong(0) % 8).toInt))
      assert(got.forall(_.getString(4).startsWith("boom ")))
    } finally graft.sources.UdpSource.stopListener(port)
  }
}
