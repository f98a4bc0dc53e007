package graft

import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentLinkedQueue

/** tcp/http OUTPUT plugins against live local servers, and the es_bulk
  * decoder's positional correction.
  */
class NetSinkSpec extends SparkSpec {

  test("tcp output: whole config text, events arrive newline-framed as json") {
    import spark.implicits._
    val received = new ConcurrentLinkedQueue[String]()
    val ss = new java.net.ServerSocket(0, 50,
      java.net.InetAddress.getByName("127.0.0.1"))
    val acceptor = new Thread(() => {
      try while (true) {
        val s = ss.accept()
        new Thread(() => {
          val rd = new java.io.BufferedReader(new java.io.InputStreamReader(
            s.getInputStream, "UTF-8"))
          var l = rd.readLine()
          while (l != null) { received.add(l); l = rd.readLine() }
          s.close()
        }).start()
      } catch { case _: Exception => () }
    })
    acceptor.setDaemon(true); acceptor.start()
    val out = java.nio.file.Files.createTempDirectory("graft_tcpout").toString
    try {
      graft.lscl.LsclRun.runConfig(spark,
        s"""input { generator { count => 20 lines => ["a", "b"] } }
           |output {
           |  if [message] == "a" { tcp { host => "127.0.0.1" port => ${ss.getLocalPort} } }
           |}""".stripMargin, out, Map.empty)
      // writes happen at runConfig time; drain with a bounded wait
      val deadline = System.nanoTime() + 10_000_000_000L
      while (received.size < 10 && System.nanoTime() < deadline) Thread.sleep(50)
      val seqs = received.toArray(Array.empty[String]).toSeq
        .map(l => ujsonSeq(l)).sorted
      assert(seqs == (0L until 20L by 2).toSeq, s"got $seqs")
    } finally ss.close()
  }

  private def ujsonSeq(line: String): Long = {
    // payload is to_json of the row: {"seq":N,"message":"m"}
    val m = "\"seq\":(\\d+)".r.findFirstMatchIn(line)
    m.map(_.group(1).toLong).getOrElse(sys.error(s"no seq in $line"))
  }

  test("http output: json_batch POSTs, batch boundaries respected") {
    val bodies = new ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/in", (ex: com.sun.net.httpserver.HttpExchange) => {
      bodies.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      ex.sendResponseHeaders(200, 2); ex.getResponseBody.write("ok".getBytes); ex.close()
    })
    server.start()
    val out = java.nio.file.Files.createTempDirectory("graft_httpout").toString
    try {
      graft.lscl.LsclRun.runConfig(spark,
        s"""input { generator { count => 12 message => "m" } }
           |output {
           |  http { url => "http://127.0.0.1:${server.getAddress.getPort}/in"
           |         batch_size => 5 }
           |}""".stripMargin, out, Map.empty)
      val all = bodies.toArray(Array.empty[String]).toSeq
      assert(all.nonEmpty)
      all.foreach(b => assert(b.startsWith("[") && b.endsWith("]"), s"not a batch: $b"))
      val seqs = all.flatMap(b => "\"seq\":(\\d+)".r.findAllMatchIn(b).map(_.group(1).toLong)).sorted
      assert(seqs == (0L until 12L).toSeq)
      // no batch exceeds batch_size
      all.foreach(b => assert("\"seq\":".r.findAllIn(b).size <= 5))
    } finally server.stop(0)
  }

  test("http output: non-2xx fails the job loudly") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.start() // no context -> 404
    val out = java.nio.file.Files.createTempDirectory("graft_httpfail").toString
    try {
      val e = intercept[Exception] {
        graft.lscl.LsclRun.runConfig(spark,
          s"""input { generator { count => 3 message => "m" } }
             |output { http { url => "http://127.0.0.1:${server.getAddress.getPort}/x" } }""".stripMargin,
          out, Map.empty)
      }
      def causes(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: causes(x.getCause))
      assert(causes(e).exists(m => m != null && m.contains("returned 404")))
    } finally server.stop(0)
  }

  test("es_bulk: action-shaped source doc right after meta parses as doc") {
    import spark.implicits._
    val lines = Seq(
      (0L, """{"index":{"_index":"a","_id":"1"}}"""),
      (10L, """{"delete":{"_index":"a","_id":"gotcha"}}"""), // SOURCE doc shaped like an action
      (20L, """{"index":{"_index":"a","_id":"2"}}"""),
      (30L, """{"plain":"doc"}"""))
    val df = lines.toDF("offset", "message").withColumn("_stream", lit("s"))
    val got = graft.operators.Codec.esBulk(df)
      .select("action", "bulk_id", "message").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("index", "1", """{"delete":{"_index":"a","_id":"gotcha"}}"""),
      ("index", "2", """{"plain":"doc"}""")))
  }

  test("graphite output: sprintf'd metric lines with metrics_format wrap and epoch") {
    val received = new ConcurrentLinkedQueue[String]()
    val ss = new java.net.ServerSocket(0, 50,
      java.net.InetAddress.getByName("127.0.0.1"))
    val acceptor = new Thread(() => {
      try while (true) {
        val s = ss.accept()
        new Thread(() => {
          val rd = new java.io.BufferedReader(new java.io.InputStreamReader(
            s.getInputStream, "UTF-8"))
          var l = rd.readLine()
          while (l != null) { received.add(l); l = rd.readLine() }
          s.close()
        }).start()
      } catch { case _: Exception => () }
    })
    acceptor.setDaemon(true); acceptor.start()
    val out = java.nio.file.Files.createTempDirectory("graft_graphout").toString
    try {
      graft.lscl.LsclRun.runConfig(spark,
        s"""input { generator { count => 6 lines => ["a", "b"] } }
           |filter { mutate { add_field => { "ts" => "2025-01-01 00:00:00" } } }
           |output {
           |  graphite { host => "127.0.0.1" port => ${ss.getLocalPort}
           |             metrics => { "svc.%{message}.count" => "%{seq}" }
           |             metrics_format => "prod.*.g"
           |             timestamp_field => "ts" }
           |}""".stripMargin, out, Map.empty)
      val deadline = System.nanoTime() + 10_000_000_000L
      while (received.size < 6 && System.nanoTime() < deadline) Thread.sleep(50)
      val lines = received.toArray(Array.empty[String]).toSeq
      assert(lines.size == 6, s"got $lines")
      val parsed = lines.map { l =>
        val Array(name, v, epoch) = l.split(" ")
        assert(epoch.matches("\\d+"), s"bad epoch in $l")
        (name, v)
      }.sorted
      assert(parsed == Seq(
        ("prod.svc.a.count.g", "0.0"), ("prod.svc.a.count.g", "2.0"),
        ("prod.svc.a.count.g", "4.0"), ("prod.svc.b.count.g", "1.0"),
        ("prod.svc.b.count.g", "3.0"), ("prod.svc.b.count.g", "5.0")),
        s"got $parsed")
      assert(lines.map(_.split(" ")(2)).distinct.size == 1, "epochs differ")
    } finally ss.close()
  }

  test("statsd output: namespaced datagrams for increment and gauge") {
    val received = new ConcurrentLinkedQueue[String]()
    val ds = new java.net.DatagramSocket(0,
      java.net.InetAddress.getByName("127.0.0.1"))
    val rx = new Thread(() => {
      try while (true) {
        val p = new java.net.DatagramPacket(new Array[Byte](2048), 2048)
        ds.receive(p)
        received.add(new String(p.getData, 0, p.getLength, "UTF-8"))
      } catch { case _: Exception => () }
    })
    rx.setDaemon(true); rx.start()
    val out = java.nio.file.Files.createTempDirectory("graft_statsdout").toString
    try {
      graft.lscl.LsclRun.runConfig(spark,
        s"""input { generator { count => 4 lines => ["a", "b"] } }
           |output {
           |  statsd { host => "127.0.0.1" port => ${ds.getLocalPort}
           |           namespace => "ls" sender => "h1"
           |           increment => ["hits.%{message}"]
           |           gauge => { "depth" => "%{seq}" } }
           |}""".stripMargin, out, Map.empty)
      val deadline = System.nanoTime() + 10_000_000_000L
      while (received.size < 8 && System.nanoTime() < deadline) Thread.sleep(50)
      val grams = received.toArray(Array.empty[String]).toSeq.sorted
      assert(grams == Seq(
        "ls.h1.depth:0|g", "ls.h1.depth:1|g", "ls.h1.depth:2|g", "ls.h1.depth:3|g",
        "ls.h1.hits.a:1|c", "ls.h1.hits.a:1|c", "ls.h1.hits.b:1|c", "ls.h1.hits.b:1|c"),
        s"got $grams")
    } finally ds.close()
  }

  private def udpListener(): (java.net.DatagramSocket, ConcurrentLinkedQueue[String]) = {
    val received = new ConcurrentLinkedQueue[String]()
    val ds = new java.net.DatagramSocket(0,
      java.net.InetAddress.getByName("127.0.0.1"))
    val rx = new Thread(() => {
      try while (true) {
        val p = new java.net.DatagramPacket(new Array[Byte](65536), 65536)
        ds.receive(p)
        received.add(new String(p.getData, 0, p.getLength, "UTF-8"))
      } catch { case _: Exception => () }
    })
    rx.setDaemon(true); rx.start()
    (ds, received)
  }

  private def drain(received: ConcurrentLinkedQueue[String], n: Int): Seq[String] = {
    val deadline = System.nanoTime() + 10_000_000_000L
    while (received.size < n && System.nanoTime() < deadline) Thread.sleep(50)
    received.toArray(Array.empty[String]).toSeq.sorted
  }

  test("udp output: one json datagram per event") {
    val (ds, received) = udpListener()
    val out = java.nio.file.Files.createTempDirectory("graft_udpout").toString
    try {
      graft.lscl.LsclRun.runConfig(spark,
        s"""input { generator { count => 3 lines => ["x"] } }
           |output { udp { host => "127.0.0.1" port => ${ds.getLocalPort} } }
           |""".stripMargin, out, Map.empty)
      val grams = drain(received, 3)
      assert(grams.size == 3, s"got $grams")
      val seqs = grams.map(g => "\"seq\":(\\d+)".r.findFirstMatchIn(g)
        .map(_.group(1).toLong).getOrElse(-1L)).sorted
      assert(seqs == Seq(0L, 1L, 2L), s"got $grams")
    } finally ds.close()
  }

  test("syslog output: RFC3164 lines with label-derived PRI over udp") {
    val (ds, received) = udpListener()
    val out = java.nio.file.Files.createTempDirectory("graft_syslogout").toString
    try {
      graft.lscl.LsclRun.runConfig(spark,
        s"""input { generator { count => 2 lines => ["boom"] } }
           |output {
           |  syslog { host => "127.0.0.1" port => ${ds.getLocalPort}
           |           facility => "local4" severity => "error"
           |           appname => "app" procid => "%{seq}"
           |           sourcehost => "h1" }
           |}""".stripMargin, out, Map.empty)
      val lines = drain(received, 2)
      assert(lines.size == 2, s"got $lines")
      // local4=20, error=3 -> PRI 163; day-of-month is space-padded
      val re = ("^<163>[A-Z][a-z]{2} [ \\d]\\d \\d{2}:\\d{2}:\\d{2} " +
        "h1 app\\[(\\d)\\]: boom$").r
      val ids = lines.map { l =>
        val m = re.findFirstMatchIn(l)
        assert(m.isDefined, s"line does not match RFC3164 shape: $l")
        m.get.group(1).toLong
      }.sorted
      assert(ids == Seq(0L, 1L))
    } finally ds.close()
  }

  test("syslog output: RFC5424 with numeric codes and use_labels false") {
    val (ds, received) = udpListener()
    val out = java.nio.file.Files.createTempDirectory("graft_syslog5424").toString
    try {
      graft.lscl.LsclRun.runConfig(spark,
        s"""input { generator { count => 1 lines => ["m1"] } }
           |output {
           |  syslog { host => "127.0.0.1" port => ${ds.getLocalPort}
           |           rfc => "rfc5424" use_labels => false priority => "165"
           |           appname => "svc" msgid => "ID7" sourcehost => "h2" }
           |}""".stripMargin, out, Map.empty)
      val lines = drain(received, 1)
      assert(lines.size == 1, s"got $lines")
      val re = ("^<165>1 \\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}\\.\\d{3}" +
        "(Z|[+-]\\d{2}:\\d{2}) h2 svc - ID7 - m1$").r
      assert(re.findFirstMatchIn(lines.head).isDefined,
        s"line does not match RFC5424 shape: ${lines.head}")
    } finally ds.close()
  }

  test("kafka output: option mapping is exact, write fails loudly without jars") {
    val cfg = graft.lscl.Lscl.parse(
      """output { kafka { bootstrap_servers => "b1:9092" topic_id => "t"
        |  client_id => "c" compression_type => "lz4" acks => "all" } }""".stripMargin)
    val p = cfg.outputs.collect {
      case graft.lscl.Lscl.PluginItem(pl) if pl.name == "kafka" => pl }.head
    assert(graft.lscl.LsclRun.kafkaOutputOptions(p) == Map(
      "kafka.bootstrap.servers" -> "b1:9092", "topic" -> "t",
      "kafka.client.id" -> "c", "kafka.compression.type" -> "lz4",
      "kafka.acks" -> "all"))
    // topic_id required
    val bad = graft.lscl.Lscl.parse("""output { kafka { } }""").outputs.collect {
      case graft.lscl.Lscl.PluginItem(pl) => pl }.head
    intercept[IllegalArgumentException] {
      graft.lscl.LsclRun.kafkaOutputOptions(bad) }
    // the write path fails loudly when the connector is absent
    val out = java.nio.file.Files.createTempDirectory("graft_kafkaout").toString
    val e = intercept[IllegalStateException] {
      graft.lscl.LsclRun.runConfig(spark,
        """input { generator { count => 1 lines => ["x"] } }
          |output { kafka { topic_id => "t" } }""".stripMargin, out, Map.empty)
    }
    assert(e.getMessage.contains("connector"))
  }

  test("stdout and null outputs: bounded debug print + swallow, conditional") {
    val out = java.nio.file.Files.createTempDirectory("graft_stdnull").toString
    val res = graft.lscl.LsclRun.runConfig(spark,
      s"""input { generator { count => 30 lines => ["a", "b"] } }
         |output {
         |  if [message] == "a" { stdout { limit => 3 } }
         |  null { }
         |  sink { id => "keep" }
         |}""".stripMargin, out, Map.empty)
    // file sink unaffected by the debug sinks
    assert(res.counts("keep") == 30L)
    assert(spark.read.parquet(s"$out/keep").count() == 30L)
  }

  test("logstash-to-logstash: output half ships ndjson to the input half") {
    val port = 15990
    val tmp = java.nio.file.Files.createTempDirectory("graft_l2l")
    val journal = tmp.resolve("l2l.journal")
    // input half first (listener registry factory + fixed port, so the
    // config read below attaches to the same listener)
    graft.sources.HttpSource.ensureListener(port, journal)
    try {
      val out = tmp.resolve("out").toString
      graft.lscl.LsclRun.runConfig(spark,
        s"""input { generator { count => 8 message => "m" } }
           |output { logstash { ssl_enabled => false
           |                    hosts => ["127.0.0.1:$port"] batch_size => 3 } }
           |""".stripMargin, out, Map.empty)
      // receiver acks only after the durable append, so the journal is
      // complete once runConfig returns
      val inCfg = graft.lscl.Lscl.parse(
        s"""input { logstash { ssl_enabled => false
           |          port => $port journal => "$journal" } }""".stripMargin,
        Map.empty)
      // the input half decodes the ndjson documents back into event fields
      val got = graft.lscl.LsclRun.source(spark, inCfg.inputs)
        .select("seq", "message").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got.size == 8, s"got ${got.size}: $got")
      assert(got.map(_._1).sorted == (0L until 8L).toSeq, s"got $got")
      assert(got.forall(_._2 == "m"), s"got $got")
    } finally graft.sources.HttpSource.stopListener(port)
  }

  test("logstash_to_logstash fixture configs run VERBATIM (both halves)") {
    // qa/integration/fixtures/logstash_to_logstash_spec.yml — basic_ls_input
    // and basic_ls_output verbatim (ERB holes filled: output path, count 10);
    // the input half names no port/journal, so the default port 9800 +
    // default journal carry the round trip
    val tmp = java.nio.file.Files.createTempDirectory("graft_l2lfix")
    val dj = graft.sources.HttpSource.defaultJournal(9800)
    graft.sources.HttpSource.stopListener(9800)
    java.nio.file.Files.deleteIfExists(dj)
    val inputCfgText =
      s"""input {
         |  logstash {
         |    ssl_enabled => false
         |    username => "logstash"
         |    password => "$$e0re!"
         |  }
         |}
         |output {
         |  file {
         |    path => '$tmp/out.log'
         |    flush_interval => 0
         |    codec => line { format => "%{message}" }
         |  }
         |}""".stripMargin
    val outputCfgText =
      """input {
        |  generator {
        |    count => '10'
        |  }
        |}
        |output {
        |  logstash {
        |    ssl_enabled => false
        |    hosts => ["127.0.0.1:9800"]
        |    username => "logstash"
        |    password => "$e0re!"
        |  }
        |}""".stripMargin
    try {
      val inCfg = graft.lscl.Lscl.parse(inputCfgText, Map.empty)
      // reading the source starts the listener (registry factory, port 9800)
      graft.lscl.LsclRun.source(spark, inCfg.inputs).count()
      graft.lscl.LsclRun.runConfig(spark, outputCfgText,
        tmp.resolve("sender").toString, Map.empty)
      graft.lscl.LsclRun.runConfig(spark, inputCfgText,
        tmp.resolve("receiver").toString, Map.empty)
      val lines = spark.read.text(s"$tmp/receiver/file_1")
        .collect().map(_.getString(0)).toSeq
      assert(lines.size == 10 && lines.forall(_ == "Hello world!"),
        s"${lines.size}: ${lines.take(3).mkString("|")}")
    } finally {
      graft.sources.HttpSource.stopListener(9800)
      java.nio.file.Files.deleteIfExists(dj)
    }
  }

  test("nagios output: events without the nagios fields skip, absent COLUMNS do not crash") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_nagios_abs").toString
    // frame has NO nagios_host/nagios_service columns at all — the
    // reference drops such events with a warning; the Truthy-gated sink
    // cond must resolve to false, not throw UNRESOLVED_COLUMN
    val cfg = graft.lscl.Lscl.parse(
      """output { nagios { id => "n" } }""", Map.empty)
    val df = Seq((1L, "m1"), (2L, "m2")).toDF("seq", "message")
    val res = graft.operators.Route.run(spark, df,
      graft.lscl.LsclRun.sinkSpecs(cfg.outputs), out, writeDefault = false)
    assert(res.counts("n") == 0L, res.counts.toString)
  }

  test("email output fails loudly with a routing hint") {
    val cfg = graft.lscl.Lscl.parse(
      """output { email { to => "ops@example.com" } }""", Map.empty)
    val e = intercept[IllegalArgumentException] {
      graft.lscl.LsclRun.sinkSpecs(cfg.outputs)
    }
    assert(e.getMessage.contains("external service"))
  }
}
