package graft

import org.apache.spark.sql.functions._

/** Round-5 output surface: exec / opentsdb / gelf / zabbix sinks, each
  * driven from CONFIG TEXT against a live local receiver.
  */
class SinkSurfaceSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Accept-loop line collector for the tcp-transport sinks. */
  private final class LineServer {
    private val server = new java.net.ServerSocket(0)
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def port: Int = server.getLocalPort
    private val t = new Thread(() => {
      try while (true) {
        val s = server.accept()
        new Thread(() => {
          val in = new java.io.BufferedReader(new java.io.InputStreamReader(
            s.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
          var l = in.readLine()
          while (l != null) { lines.add(l); l = in.readLine() }
          s.close()
        }).start()
      } catch { case _: java.io.IOException => () }
    })
    t.setDaemon(true); t.start()
    def await(n: Int): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (lines.size() < n && System.currentTimeMillis() < deadline)
        Thread.sleep(25)
    }
    def close(): Unit = server.close()
  }

  test("exec output: command runs once per event, sprintf'd") {
    val dir = tmpDir("graft_execout")
    val out = tmpDir("graft_execout_sink")
    graft.lscl.LsclRun.runConfig(spark,
      s"""input { generator { count => 6 lines => ["e"] } }
         |output { exec { command => "echo %{message}%{seq} >> $dir/got.txt" } }
         |""".stripMargin, out, Map.empty)
    val got = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(dir, "got.txt")))
      .asScala.sorted
    assert(got == (0 until 6).map(i => s"e$i").sorted, s"got=$got")
  }

  test("exec output: non-zero exit fails the task loudly") {
    import spark.implicits._
    val df = Seq("x").toDF("message").repartition(1)
    intercept[org.apache.spark.SparkException] {
      graft.operators.Route.execSink(df, lit("exit 3"))
    }
  }

  test("opentsdb output: put lines with epoch, value, and tags over tcp") {
    val srv = new LineServer
    try {
      val out = tmpDir("graft_tsdb_sink")
      graft.lscl.LsclRun.runConfig(spark,
        s"""input { generator { count => 4 lines => ["m"] } }
           |filter { mutate { add_field => { "@timestamp" => "2024-01-02T03:04:05Z" } } }
           |output {
           |  opentsdb {
           |    host => "127.0.0.1"
           |    port => ${srv.port}
           |    metrics => ["sys.%{message}", "%{seq}", "rack", "r%{seq}"]
           |  }
           |}""".stripMargin, out, Map.empty)
      srv.await(4)
      val got = scala.jdk.CollectionConverters.IteratorHasAsScala(
        srv.lines.iterator()).asScala.toSeq.sorted
      val epoch = java.time.Instant.parse("2024-01-02T03:04:05Z").getEpochSecond
      assert(got == (0 until 4).map(i => s"put sys.m $epoch $i.0 rack=r$i").sorted,
        s"got=$got")
    } finally srv.close()
  }

  test("gelf output round-trips through the udp gelf listener, chunking included") {
    val port = 15983
    val tmp = java.nio.file.Files.createTempDirectory("graft_gelfout")
    val journal = tmp.resolve("gelf.journal")
    graft.sources.UdpSource.ensureListener(port, journal, base64Frames = true)
    try {
      val out = tmpDir("graft_gelfout_sink")
      graft.lscl.LsclRun.runConfig(spark,
        s"""input { generator { count => 3 lines => ["hello gelf"] } }
           |output {
           |  gelf {
           |    host => "127.0.0.1"
           |    port => $port
           |    sender => "graft-%{seq}"
           |    custom_fields => { "env" => "test" }
           |  }
           |}""".stripMargin, out, Map.empty)
      val deadline = System.currentTimeMillis() + 30000
      while ((!java.nio.file.Files.exists(journal) ||
          java.nio.file.Files.readAllLines(journal).size() < 3) &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      val decoded = graft.operators.Gelf.decode(
        spark.read.text(journal.toString).select(unbase64(col("value")).as("frame")),
        "frame", "version STRING, host STRING, short_message STRING, level INT, _env STRING")
        .orderBy("host").collect()
      assert(decoded.length == 3)
      assert(decoded.map(_.getAs[String]("host")).toSeq ==
        Seq("graft-0", "graft-1", "graft-2"))
      assert(decoded.forall(_.getAs[String]("message") == "hello gelf"))
      assert(decoded.forall(_.getAs[Int]("level") == 6))
      assert(decoded.forall(_.getAs[String]("env") == "test"))

      // chunked path: a body past the threshold splits into spec chunks the
      // decoder's id-keyed reassembly restores byte-exactly
      import spark.implicits._
      val big = "x" * 4000
      val frames = graft.operators.Gelf.encode(Seq(
        "host" -> lit("bulk"), "short_message" -> lit(big)), compress = false)
      graft.operators.Route.gelfSink(
        Seq(1).toDF("i").repartition(1), "127.0.0.1", port, frames,
        chunkThreshold = 512)
      val d2 = System.currentTimeMillis() + 30000
      while (java.nio.file.Files.readAllLines(journal).size() < 3 + 8 &&
          System.currentTimeMillis() < d2) Thread.sleep(50)
      val bulk = graft.operators.Gelf.decode(
        spark.read.text(journal.toString).select(unbase64(col("value")).as("frame")),
        "frame", "version STRING, host STRING, short_message STRING")
        .filter(col("host") === "bulk").collect()
      assert(bulk.length == 1 && bulk.head.getAs[String]("message") == big)
    } finally graft.sources.UdpSource.stopListener(port)
  }

  test("zabbix output: sender-protocol envelopes reach a live trapper, batched") {
    val items = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      try while (true) {
        val s = server.accept()
        val in = new java.io.DataInputStream(s.getInputStream)
        val hdr = new Array[Byte](13); in.readFully(hdr)
        assert(new String(hdr, 0, 4) == "ZBXD" && hdr(4) == 0x01)
        val len = java.nio.ByteBuffer.wrap(hdr, 5, 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toInt
        val body = new Array[Byte](len); in.readFully(body)
        requests.incrementAndGet()
        "\\{\"host\":.*?\\}".r.findAllIn(
          new String(body, java.nio.charset.StandardCharsets.UTF_8))
          .foreach(items.add)
        val resp = ("{\"response\":\"success\",\"info\":\"processed: x\"}")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val os = new java.io.DataOutputStream(s.getOutputStream)
        os.write("ZBXD".getBytes); os.write(0x01)
        os.write(java.nio.ByteBuffer.allocate(8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(resp.length.toLong).array())
        os.write(resp); os.flush(); s.close()
      } catch { case _: java.io.IOException => () }
    })
    t.setDaemon(true); t.start()
    try {
      val out = tmpDir("graft_zbx_sink")
      graft.lscl.LsclRun.runConfig(spark,
        s"""input { generator { count => 7 lines => ["v"] } }
           |filter { mutate { add_field => { "zhost" => "web1" "zkey" => "app.rate" } } }
           |output {
           |  zabbix {
           |    zabbix_server_host => "127.0.0.1"
           |    zabbix_server_port => ${server.getLocalPort}
           |    zabbix_host => "zhost"
           |    zabbix_key => "zkey"
           |    batch_size => 3
           |  }
           |}""".stripMargin, out, Map.empty)
      val deadline = System.currentTimeMillis() + 30000
      while (items.size() < 7 && System.currentTimeMillis() < deadline)
        Thread.sleep(25)
      val got = scala.jdk.CollectionConverters.IteratorHasAsScala(items.iterator())
        .asScala.toSeq
      assert(got.length == 7)
      assert(got.forall(_ ==
        "{\"host\":\"web1\",\"key\":\"app.rate\",\"value\":\"v\"}"), s"got=$got")
      // batch_size 3 over 7 single-partition... events may span partitions;
      // each request carries <= batch_size items
      assert(requests.get() >= 3)
    } finally server.close()
  }

  test("runConfigStream delivers network sinks per micro-batch, delta-only on restart") {
    val f = java.nio.file.Files.createTempFile("graft_streamnet", ".log")
    val tmp = java.nio.file.Files.createTempDirectory("graft_streamnet")
    def append(s: String): Unit =
      java.nio.file.Files.writeString(f, s,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    append((0 until 5).map(i => s"ev-$i\n").mkString)
    val srv = new LineServer
    try {
      val cfg =
        s"""input { file { path => "$f" mode => "tail" } }
           |output {
           |  tcp { host => "127.0.0.1" port => ${srv.port} }
           |  sink { id => "s" }
           |}""".stripMargin
      def runOnce(): Unit = {
        val q = graft.lscl.LsclRun.runConfigStream(spark, cfg, s"$tmp/out",
          s"$tmp/ck", Map.empty)
        q.awaitTermination(120000); ()
      }
      runOnce()
      srv.await(5)
      def messages: Seq[String] = scala.jdk.CollectionConverters
        .IteratorHasAsScala(srv.lines.iterator()).asScala.toSeq
        .flatMap(l => "\"message\":\"(ev-\\d+)\"".r.findFirstMatchIn(l).map(_.group(1)))
      assert(messages.sorted == (0 until 5).map(i => s"ev-$i").sorted)
      // restart from the checkpoint: only the appended delta re-sends
      append((5 until 8).map(i => s"ev-$i\n").mkString)
      runOnce()
      srv.await(8)
      assert(messages.sorted == (0 until 8).map(i => s"ev-$i").sorted,
        s"got $messages")
      // the file sink stayed exactly-once alongside
      assert(spark.read.parquet(s"$tmp/out/s").count() == 8)
    } finally srv.close()
  }

  test("zabbix output: non-success response fails the task loudly") {
    val server = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      try while (true) {
        val s = server.accept()
        val in = new java.io.DataInputStream(s.getInputStream)
        val hdr = new Array[Byte](13); in.readFully(hdr)
        val len = java.nio.ByteBuffer.wrap(hdr, 5, 8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toInt
        in.readFully(new Array[Byte](len))
        val resp = "{\"response\":\"failed\"}"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val os = new java.io.DataOutputStream(s.getOutputStream)
        os.write("ZBXD".getBytes); os.write(0x01)
        os.write(java.nio.ByteBuffer.allocate(8)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(resp.length.toLong).array())
        os.write(resp); os.flush(); s.close()
      } catch { case _: java.io.IOException => () }
    })
    t.setDaemon(true); t.start()
    try {
      import spark.implicits._
      val df = Seq(("h", "k", "1")).toDF("host", "key", "value").repartition(1)
      val e = intercept[org.apache.spark.SparkException] {
        graft.operators.Route.zabbixSink(df, "127.0.0.1", server.getLocalPort,
          to_json(struct(col("host"), col("key"), col("value"))))
      }
      assert(String.valueOf(e.getMessage).nonEmpty)
    } finally server.close()
  }
}
