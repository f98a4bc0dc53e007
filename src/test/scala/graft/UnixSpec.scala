package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** UnixSource: AF_UNIX stream socket -> journal -> byte-offset micro-batches
  * (logstash-input-unix server mode). Same persistent-queue contract as
  * TcpSource; the client here is a real UNIX-domain SocketChannel.
  */
class UnixSpec extends SparkSpec {

  private def send(socket: java.nio.file.Path, lines: Seq[String]): Unit = {
    val ch = java.nio.channels.SocketChannel.open(
      java.net.UnixDomainSocketAddress.of(socket))
    try {
      val bytes = lines.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val buf = java.nio.ByteBuffer.wrap(bytes)
      while (buf.hasRemaining) ch.write(buf)
    } finally ch.close()
  }

  private def awaitJournal(journal: java.nio.file.Path, bytes: Long): Unit = {
    val deadline = System.currentTimeMillis() + 30000
    while ((!java.nio.file.Files.exists(journal) ||
        java.nio.file.Files.size(journal) < bytes) &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(java.nio.file.Files.size(journal) >= bytes, "journal never filled")
  }

  test("unix socket lines stream exactly once across query restarts") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_unix")
    val sock = tmp.resolve("in.sock")
    val journal = tmp.resolve("unix.journal")
    val ck = s"$tmp/ck"; val out = s"$tmp/out"
    graft.sources.UnixSource.ensureListener(sock, journal)
    try {
      val batch1 = (1 to 80).map(i => s"u-$i")
      send(sock, batch1)
      awaitJournal(journal, batch1.map(_.length + 1).sum.toLong)

      def runOnce(): Unit = {
        val q = spark.readStream.format("graft.sources.UnixSource")
          .option("socket", sock.toString)
          .option("journal", journal.toString).load()
          .writeStream.option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .format("parquet").option("path", out).start()
        q.awaitTermination(60000); ()
      }

      runOnce()
      assert(spark.read.parquet(out).count() == 80)

      val batch2 = (81 to 100).map(i => s"u-$i")
      send(sock, batch2)
      awaitJournal(journal, (batch1 ++ batch2).map(_.length + 1).sum.toLong)
      runOnce()
      val rows = spark.read.parquet(out)
        .select("message").collect().map(_.getString(0)).toSeq
      assert(rows.size == 100 && rows.distinct.size == 100)
      assert(rows.toSet == (1 to 100).map(i => s"u-$i").toSet)
    } finally graft.sources.UnixSource.stopListener(sock)
  }

  test("unix input lowers from LSCL config text, batch mode") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_unix_lscl")
    val sock = tmp.resolve("cfg.sock")
    val journal = tmp.resolve("cfg.journal")
    val cfg =
      s"""input { unix { path => "$sock" journal => "$journal" mode => "server" } }
         |filter { mutate { add_field => { "src" => "unix" } } }
         |output { sink { id => "s" } }
         |""".stripMargin
    // the listener starts at scan planning; pre-start it so the client can
    // connect before the batch read plans
    graft.sources.UnixSource.ensureListener(sock, journal)
    try {
      send(sock, Seq("alpha", "beta", "gamma"))
      awaitJournal(journal, 17L)
      val out = java.nio.file.Files.createTempDirectory("graft_unix_out").toString
      val res = graft.lscl.LsclRun.runConfig(spark, cfg, out, Map.empty)
      assert(res.counts("s") == 3L)
      val rows = spark.read.parquet(s"$out/s")
        .select("message", "src").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows == Set(("alpha", "unix"), ("beta", "unix"), ("gamma", "unix")))
    } finally graft.sources.UnixSource.stopListener(sock)
  }

  test("stale socket path: fails loudly without force_unlink, binds with it") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_unix_stale")
    val sock = tmp.resolve("stale.sock")
    java.nio.file.Files.createFile(sock) // leftover path from a dead process
    intercept[java.io.IOException](
      new graft.sources.UnixSource.Listener(sock, tmp.resolve("j1")))
    val l = new graft.sources.UnixSource.Listener(sock, tmp.resolve("j2"),
      forceUnlink = true)
    try {
      send(sock, Seq("ok"))
      awaitJournal(tmp.resolve("j2"), 3L)
    } finally l.close()
  }
}
