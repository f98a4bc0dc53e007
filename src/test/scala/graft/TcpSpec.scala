package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** TcpSource: socket lines -> journal -> byte-offset micro-batches. The
  * listener journals received lines (the persistent-queue role), so the
  * non-replayable network input becomes replayable: restarted queries
  * resume from the committed journal offset exactly once.
  */
class TcpSpec extends SparkSpec {

  private def send(port: Int, lines: Seq[String]): Unit = {
    val s = new java.net.Socket("127.0.0.1", port)
    try {
      val w = new java.io.OutputStreamWriter(s.getOutputStream,
        java.nio.charset.StandardCharsets.UTF_8)
      w.write(lines.mkString("", "\n", "\n"))
      w.flush()
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

  test("socket lines stream exactly once across query restarts") {
    val port = 15941
    val tmp = java.nio.file.Files.createTempDirectory("graft_tcp")
    val journal = tmp.resolve("tcp.journal")
    val ck = s"$tmp/ck"; val out = s"$tmp/out"
    graft.sources.TcpSource.ensureListener(port, journal)
    try {
      val batch1 = (1 to 100).map(i => s"msg-$i")
      send(port, batch1)
      awaitJournal(journal, batch1.map(_.length + 1).sum.toLong)

      def runOnce(): Unit = {
        val q = spark.readStream.format("graft.sources.TcpSource")
          .option("port", port).option("journal", journal.toString).load()
          .writeStream.option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .format("parquet").option("path", out).start()
        q.awaitTermination(60000); ()
      }

      runOnce()
      assert(spark.read.parquet(out).count() == 100)

      // more lines over a NEW connection, restart from the checkpoint
      val batch2 = (101 to 130).map(i => s"msg-$i")
      send(port, batch2)
      awaitJournal(journal, (batch1 ++ batch2).map(_.length + 1).sum.toLong)
      runOnce()
      val rows = spark.read.parquet(out).collect()
      assert(rows.length == 130)
      assert(rows.map(_.getLong(0)).distinct.length == 130) // exactly-once
      assert(rows.map(_.getString(1)).sorted.toSeq ==
        (batch1 ++ batch2).sorted)
    } finally graft.sources.TcpSource.stopListener(port)
  }

  test("sizeLimit guard: oversized frames drop with bounded memory, counted") {
    val port = 15943
    val tmp = java.nio.file.Files.createTempDirectory("graft_tcp_limit")
    val journal = tmp.resolve("tcp.journal")
    // tiny cap so the fixture exercises the guard cheaply
    val listener = graft.sources.TcpSource.ensureListener(port, journal, sizeLimit = 64)
    try {
      val big = "X" * 500 // 500 B > 64 B cap: buffered at most 64 B, then dropped
      send(port, Seq("ok-1", big, "ok-2"))
      awaitJournal(journal, "ok-1\nok-2\n".length.toLong)
      val deadline = System.currentTimeMillis() + 10000
      while (listener.oversized < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(listener.oversized == 1)
      val kept = java.nio.file.Files.readAllLines(journal)
      assert(kept.toArray.toSeq == Seq("ok-1", "ok-2")) // the oversized frame never lands
    } finally graft.sources.TcpSource.stopListener(port)
  }

  test("connection close flushes a final unterminated line") {
    val port = 15944
    val tmp = java.nio.file.Files.createTempDirectory("graft_tcp_flush")
    val journal = tmp.resolve("tcp.journal")
    graft.sources.TcpSource.ensureListener(port, journal)
    try {
      val s = new java.net.Socket("127.0.0.1", port)
      try {
        val w = new java.io.OutputStreamWriter(s.getOutputStream,
          java.nio.charset.StandardCharsets.UTF_8)
        w.write("lined\nunterminated") // no trailing newline before close
        w.flush()
      } finally s.close()
      awaitJournal(journal, "lined\nunterminated\n".length.toLong)
      val kept = java.nio.file.Files.readAllLines(journal)
      assert(kept.toArray.toSeq == Seq("lined", "unterminated"))
      // a second listener request for the same port with a DIFFERENT journal
      // fails loudly instead of silently reading the wrong path
      intercept[IllegalArgumentException] {
        graft.sources.TcpSource.ensureListener(port, tmp.resolve("other.journal"))
      }
    } finally graft.sources.TcpSource.stopListener(port)
  }

  test("LSCL tcp input drives a full streaming config") {
    val port = 15942
    val tmp = java.nio.file.Files.createTempDirectory("graft_tcp_lscl")
    val journal = tmp.resolve("tcp.journal")
    val out = s"$tmp/out"
    graft.sources.TcpSource.ensureListener(port, journal)
    try {
      val lines = (0 until 90).map { i =>
        val sev = i % 3 match { case 0 => "ERROR"; case 1 => "WARN"; case _ => "INFO" }
        s"$sev event-$i"
      }
      send(port, lines)
      awaitJournal(journal, lines.map(_.length + 1).sum.toLong)

      val cfg =
        s"""input { tcp { port => $port journal => "$journal" } }
           |filter { if [message] =~ /^ERROR/ { mutate { add_tag => ["err"] } } }
           |output {
           |  if "err" in [tags] { sink { id => "t_err" } }
           |  else { sink { id => "t_rest" } }
           |}
           |""".stripMargin
      val q = graft.lscl.LsclRun.runConfigStream(spark, cfg, out, s"$tmp/ck", Map.empty)
      q.awaitTermination(60000)
      assert(spark.read.parquet(s"$out/t_err").count() == 30)
      assert(spark.read.parquet(s"$out/t_rest").count() == 60)
    } finally graft.sources.TcpSource.stopListener(port)
  }
}
