package graft

import org.apache.spark.sql.functions._

/** Round-5 plugin surface: yaml filter, jdbc input (embedded Derby), pipe
  * input/output, lumberjack output round-tripping through the beats
  * listener.
  */
class PluginSurfaceSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("yaml filter: schema'd parse, nested map, failure tag, target mode") {
    import spark.implicits._
    val df = Seq(
      (1L, "lvl: warn\nn: 7\nmeta:\n  flag: true"),
      (2L, "lvl: info\nn: 9\nmeta:\n  flag: false"),
      (3L, "lvl: [broken")).toDF("id", "message")
    val cfg = graft.lscl.Lscl.parse(
      """filter {
        |  yaml { source => "message" schema => "lvl STRING, n BIGINT, meta STRUCT<flag: BOOLEAN>" }
        |}""".stripMargin, Map.empty)
    val out = graft.lscl.LsclRun.applyFilters(df, cfg.filters)
      .select(col("id"), col("lvl"), col("n"), col("meta.flag"),
        array_join(col("tags"), ",").as("t"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "warn" && out(0).getLong(2) == 7 &&
      out(0).getBoolean(3) && out(0).getString(4) == "")
    assert(out(1).getString(1) == "info" && !out(1).getBoolean(3))
    assert(out(2).isNullAt(1) && out(2).isNullAt(2) &&
      out(2).getString(4) == "_yamlparsefailure")

    // target mode: the parsed document lands UNDER target, source untouched
    val cfgT = graft.lscl.Lscl.parse(
      """filter {
        |  yaml { source => "message" target => "doc" schema => "lvl STRING" }
        |}""".stripMargin, Map.empty)
    val t = graft.lscl.LsclRun.applyFilters(df, cfgT.filters)
      .select(col("id"), col("doc.lvl")).orderBy("id").collect()
    assert(t(0).getString(1) == "warn" && t(2).isNullAt(1))
  }

  test("yaml filter under a conditional: excluded rows keep fields null and no tag") {
    import spark.implicits._
    val df = Seq(
      (1L, "go", "n: 5"),
      (2L, "skip", "n: 6"),
      (3L, "go", "n: [broken")).toDF("id", "kind", "message")
    val cfg = graft.lscl.Lscl.parse(
      """filter {
        |  if [kind] == "go" {
        |    yaml { source => "message" schema => "n BIGINT" }
        |  }
        |}""".stripMargin, Map.empty)
    val out = graft.lscl.LsclRun.applyFilters(df, cfg.filters)
      .select(col("id"), col("n"), array_join(col("tags"), ",").as("t"))
      .orderBy("id").collect()
    assert(out(0).getLong(1) == 5 && out(0).getString(2) == "")
    assert(out(1).isNullAt(1) && out(1).getString(2) == "")
    assert(out(2).isNullAt(1) && out(2).getString(2) == "_yamlparsefailure")
  }

  test("jdbc input: Derby end-to-end with parameters, lowercase folding, partitioned read") {
    val db = tmpDir("graft_jdbc_spec") + "/db"
    val url = s"jdbc:derby:$db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE T (ID INT, NAME VARCHAR(16), RANK INT)")
      val ins = conn.prepareStatement("INSERT INTO T VALUES (?, ?, ?)")
      (1 to 30).foreach { i =>
        ins.setInt(1, i); ins.setString(2, s"n$i"); ins.setInt(3, i % 5); ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()

    val cfg = graft.lscl.Lscl.parse(
      s"""input {
         |  jdbc {
         |    jdbc_connection_string => "$url"
         |    statement => "SELECT ID, NAME FROM T WHERE RANK >= :minrank"
         |    parameters => { "minrank" => "2" }
         |  }
         |}""".stripMargin, Map.empty)
    val df = graft.lscl.LsclRun.source(spark, cfg.inputs)
    assert(df.columns.toSeq == Seq("id", "name")) // lowercase fold
    assert(df.count() == 18) // ranks 2,3,4 of 0..4 over 30 rows

    // partitioned scan: the statement wraps as a derived table and the
    // ranged WHERE pushes into Derby — 3 jdbc partitions
    val cfgP = graft.lscl.Lscl.parse(
      s"""input {
         |  jdbc {
         |    jdbc_connection_string => "$url"
         |    statement => "SELECT ID, NAME FROM T"
         |    partition_column => "ID"
         |    lower_bound => "1"
         |    upper_bound => "31"
         |    num_partitions => "3"
         |    lowercase_column_names => "false"
         |  }
         |}""".stripMargin, Map.empty)
    val dfP = graft.lscl.LsclRun.source(spark, cfgP.inputs)
    assert(dfP.columns.toSeq == Seq("ID", "NAME")) // folding off
    assert(dfP.rdd.getNumPartitions == 3)
    assert(dfP.count() == 30)
  }

  test("pipe input: one event per stdout line of the command") {
    val cfg = graft.lscl.Lscl.parse(
      """input { pipe { command => "printf 'a\nb\nc\n'" } }""", Map.empty)
    val rows = graft.lscl.LsclRun.source(spark, cfg.inputs)
      .orderBy("message").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(rows.head.getString(1).startsWith("printf"))
  }

  test("pipe output: lines reach the command's stdin; sprintf'd command splits streams") {
    val dir = tmpDir("graft_pipeout")
    val out = tmpDir("graft_pipeout_sink")
    graft.lscl.LsclRun.runConfig(spark,
      s"""input { generator { count => 10 lines => ["a", "b"] } }
         |output {
         |  pipe {
         |    command => "cat >> $dir/%{message}.txt"
         |    message_format => "%{message}-%{seq}"
         |  }
         |}""".stripMargin, out, Map.empty)
    def lines(f: String): Seq[String] = {
      val p = java.nio.file.Paths.get(dir, f)
      if (java.nio.file.Files.exists(p))
        scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(p)).asScala.toSeq
      else Seq.empty
    }
    val a = lines("a.txt").sorted
    val b = lines("b.txt").sorted
    assert(a == (0 until 10 by 2).map(i => s"a-$i").sorted, s"a=$a")
    assert(b == (1 until 10 by 2).map(i => s"b-$i").sorted, s"b=$b")
  }

  test("pipe output: non-zero exit fails the job loudly") {
    import spark.implicits._
    val df = Seq("x", "y").toDF("message").repartition(1)
    val e = intercept[org.apache.spark.SparkException] {
      graft.operators.Route.pipeSink(df, lit("false"))
    }
    assert(String.valueOf(e.getMessage).nonEmpty)
  }

  test("lumberjack output round-trips through the beats listener (zlib windows, acks)") {
    val journal = java.nio.file.Files.createTempFile("graft_lumber", ".journal")
    java.nio.file.Files.delete(journal)
    val listener = new graft.sources.BeatsSource.Listener(0, journal)
    try {
      val out = tmpDir("graft_lumber_sink")
      graft.lscl.LsclRun.runConfig(spark,
        s"""input { generator { count => 57 lines => ["ev"] } }
           |output {
           |  lumberjack { hosts => ["127.0.0.1"] port => ${listener.localPort} flush_size => 10 }
           |}""".stripMargin, out, Map.empty)
      // acks are synchronous with the journal append, so the journal is
      // complete once runConfig returns
      val got = scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(journal)).asScala
        .map(l => "\"seq\":(\\d+)".r.findFirstMatchIn(l).get.group(1).toLong)
        .toSeq.sorted
      assert(got == (0L until 57L), s"got ${got.size}: $got")
    } finally listener.close()
  }

  test("plain output codec renders its sprintf'd format (line-codec rendering)") {
    import spark.implicits._
    val out = tmpDir("graft_plainout")
    graft.lscl.LsclRun.runConfig(spark,
      s"""input { generator { count => 4 message => "m" } }
         |output { file { id => "p" codec => plain { format => "s=%{seq}" } } }
         |""".stripMargin, out, Map.empty)
    val got = spark.read.text(s"$out/p").as[String].collect().sorted.toSeq
    assert(got == Seq("s=0", "s=1", "s=2", "s=3"), got.mkString(","))
  }

  test("elastic_serverless_forwarder input: ndjson POSTs land one event per line") {
    val port = 15991
    val tmp = java.nio.file.Files.createTempDirectory("graft_esf")
    val journal = tmp.resolve("esf.journal")
    graft.sources.HttpSource.ensureListener(port, journal)
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"http://127.0.0.1:$port/"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          "{\"a\":1}\n{\"a\":2}"))
        .build()
      assert(client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode() == 200)
      val cfg = graft.lscl.Lscl.parse(
        s"""input { elastic_serverless_forwarder { ssl_enabled => false
           |  port => $port journal => "$journal" } }""".stripMargin, Map.empty)
      val got = graft.lscl.LsclRun.source(spark, cfg.inputs)
        .collect().map(_.getString(1)).sorted.toSeq
      assert(got == Seq("{\"a\":1}", "{\"a\":2}"), got.mkString("|"))
    } finally graft.sources.HttpSource.stopListener(port)
  }

  test("mixed_codec fixture configs run VERBATIM (java_stdin codecs, java_stdout json)") {
    // qa/integration/fixtures/mixed_codec_spec.yml — input_decode,
    // input_decode_configured, output_encode verbatim (PATH_TO_OUT via env)
    val tmp = tmpDir("graft_mixedcodec")
    val oldIn = System.in
    try {
      System.setIn(new java.io.ByteArrayInputStream(
        "{\"a\":1,\"m\":\"x\"}\n{\"a\":2,\"m\":\"y\"}\n".getBytes("UTF-8")))
      graft.lscl.LsclRun.runConfig(spark,
        """input {
          |  java_stdin {
          |      codec => json
          |  }
          |}
          |output {
          |  file {
          |    path => "${PATH_TO_OUT}"
          |  }
          |}""".stripMargin, s"$tmp/dec", Map("PATH_TO_OUT" -> s"$tmp/out.log"))
      val got = spark.read.parquet(s"$tmp/dec/file_1")
        .select("a", "m").collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toSeq
      assert(got == Seq((1L, "x"), (2L, "y")), got.mkString(","))

      System.setIn(new java.io.ByteArrayInputStream("p1\np2\n".getBytes("UTF-8")))
      graft.lscl.LsclRun.runConfig(spark,
        """input {
          |  java_stdin {
          |      codec => plain {
          |        charset => "ASCII-8BIT"
          |      }
          |  }
          |}
          |output {
          |  file {
          |    path => "${PATH_TO_OUT}"
          |  }
          |}""".stripMargin, s"$tmp/plain", Map("PATH_TO_OUT" -> s"$tmp/out2.log"))
      val plain = spark.read.parquet(s"$tmp/plain/file_1")
        .select("message").collect().map(_.getString(0)).sorted.toSeq
      assert(plain == Seq("p1", "p2"), plain.mkString(","))
    } finally System.setIn(oldIn)

    // output_encode: generator -> java_stdout { codec => json } (driver print)
    graft.lscl.LsclRun.runConfig(spark,
      """input {
        |  generator {
        |    count => 4
        |  }
        |}
        |output {
        |  java_stdout {
        |    codec => json
        |  }
        |}""".stripMargin, s"$tmp/enc", Map.empty)
  }

  test("external-service inputs and the elastic_integration filter fail loudly") {
    val e1 = intercept[UnsupportedOperationException] {
      graft.lscl.LsclRun.source(spark, graft.lscl.Lscl.parse(
        """input { snmp { get => ["1.3.6.1.2.1.1.1.0"] } }""",
        Map.empty).inputs)
    }
    assert(e1.getMessage.contains("snmptrap"), e1.getMessage)
    val e2 = intercept[UnsupportedOperationException] {
      graft.lscl.LsclRun.applyFilters(
        spark.range(1).toDF(),
        graft.lscl.Lscl.parse("""filter { elastic_integration { } }""",
          Map.empty).filters)
    }
    assert(e2.getMessage.contains("ingest pipelines"), e2.getMessage)
  }
}
