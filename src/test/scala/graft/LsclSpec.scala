package graft

import org.apache.spark.sql.functions._
import graft.conditions._
import graft.lscl.{Lscl, LsclRun}

/** LSCL config-text frontend specs. The flagship case is the reference's
  * `qa/integration/fixtures/env_variables_condition_spec.yml` pipeline,
  * embedded VERBATIM: its filter section exercises every condition operator
  * with env-var substitution, and the consuming spec
  * (env_variables_condition_spec.rb:74) pins the exact expected tag list —
  * including that `wrong_regex_substitution` is ABSENT (no `${VAR}`
  * substitution inside regexp literals).
  */
class LsclSpec extends SparkSpec {

  private val fixtureEnv = Map(
    "APP" -> "foobar", "BIG" -> "100", "SMALL" -> "1", "TAG1" -> "mytag1",
    "TEST_ENV_PATH" -> "/tmp/lscl_fixture")

  // verbatim from qa/integration/fixtures/env_variables_condition_spec.yml
  private val fixtureConfig = """input {
    generator {
      lines => ['{"app": "foobar", "amount": "100", "version": 1, "tag1": "mytag1"}']
      count => 1
    }
  }
  filter {
    json {
       source => "message"
    }

    if ("${APP}") {
       mutate { add_tag => ["Truthy"] }
    }
    if !([version] == "${BIG}") {
       mutate { add_tag => ["Not"] }
    }
    if "${BIG}" > "${SMALL}" {
       mutate { add_tag => [">"] }
    }
    if "${BIG}" >= "100" {
       mutate { add_tag => [">="] }
    }
    if "${SMALL}" < "${BIG}" {
       mutate { add_tag => ["<"] }
    }
    if "${SMALL}" <= "1" {
       mutate { add_tag => ["<="] }
    }
    if [app] == "${APP}" {
       mutate { add_tag => ["=="] }
    }
    if "${SMALL}" != "${BIG}" {
       mutate { add_tag => ["!="] }
    }
    if [amount] in ["${SMALL}", "${BIG}"] {
       mutate { add_tag => ["in"] }
    }
    if [amount] not in ["${SMALL}", "2", "3"] {
       mutate { add_tag => ["not in"] }
    }
    if [amount] =~ /\d+/ {
       mutate { add_tag => ["=~"] }
    }
    if [amount] =~ /${BIG}/ {
       mutate { add_tag => ["wrong_regex_substitution"] }
    }
    if [amount] !~ /[a-z]+/ {
       mutate { add_tag => ["!~"] }
    }
    if ([app] == "${APP}") and ([app] == "foobar") {
       mutate { add_tag => ["and"] }
    }
    if ([app] == "${APP}") and ([amount] == "${BIG}") and ([version] == 1) and [tag1] == "${TAG1}" {
       mutate { add_tag => ["more_and"] }
    }
    if (1 > 2) or ([app] == "${APP}") {
       mutate { add_tag => ["or"] }
    }
    if ([app] == "${APP}") nand (1 > 2) {
       mutate { add_tag => ["nand"] }
    }
    if (1 > 2) xor ([app] == "${APP}") {
       mutate { add_tag => ["xor"] }
    }
  }
  output {
    file {
      path => "${TEST_ENV_PATH}/env_variables_condition_output.log"
      flush_interval => 0
      codec => line { format => "%{message} %{tags}" }
    }
  }"""

  test("fixture pipeline reproduces the reference's exact tag list") {
    import spark.implicits._
    val cfg = Lscl.parse(fixtureConfig, fixtureEnv)
    assert(cfg.inputs.nonEmpty && cfg.filters.nonEmpty && cfg.outputs.nonEmpty)
    // the generator event from the fixture's input section
    val df = Seq("""{"app": "foobar", "amount": "100", "version": 1, "tag1": "mytag1"}""")
      .toDF("message")
    val out = LsclRun.applyFilters(df, cfg.filters)
    val tags = out.select("tags").collect()(0).getSeq[String](0)
    // env_variables_condition_spec.rb:74 — and NO wrong_regex_substitution
    assert(tags == Seq("Truthy", "Not", ">", ">=", "<", "<=", "==", "!=",
      "in", "not in", "=~", "!~", "and", "more_and", "or", "nand", "xor"),
      tags.mkString(","))
  }

  // verbatim from qa/integration/fixtures/env_variables_config_spec.yml —
  // tcp input on an env-substituted port, env-tag decorator, file output
  // with the LINE codec (`format => "%{message} %{tags}"`)
  private val envCfgFixture = """input {
    tcp {
      port => "${TEST_ENV_TCP_PORT}"
    }
  }
  filter {
    mutate {
      add_tag => [ "blah", "${TEST_ENV_TAG}" ]
    }
  }
  output {
    file {
      path => "${TEST_ENV_PATH}/logstash_env_test.log"
      flush_interval => 0
      codec => line { format => "%{message} %{tags}" }
    }
  }"""

  test("env_variables_config fixture runs verbatim end-to-end (live tcp -> line-codec file)") {
    val port = 15971
    val tmp = java.nio.file.Files.createTempDirectory("graft_envcfg")
    // the default journal lives in /tmp and would accumulate across JVM
    // runs — start from a clean one (the listener, if any, died with the
    // previous JVM)
    java.nio.file.Files.deleteIfExists(graft.sources.TcpSource.defaultJournal(port))
    graft.sources.TcpSource.ensureListener(port,
      graft.sources.TcpSource.defaultJournal(port))
    try {
      val sock = new java.net.Socket("127.0.0.1", port)
      val w = new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8")
      w.write("foo\nbar\n"); w.flush(); sock.close()
      val deadline = System.nanoTime() + 10_000_000_000L
      val j = graft.sources.TcpSource.defaultJournal(port)
      while ((!java.nio.file.Files.exists(j) || java.nio.file.Files.size(j) < 8) &&
        System.nanoTime() < deadline) Thread.sleep(50)
      val res = LsclRun.runConfig(spark, envCfgFixture, s"$tmp/out", Map(
        "TEST_ENV_TCP_PORT" -> port.toString,
        "TEST_ENV_TAG" -> "mytag",
        "TEST_ENV_PATH" -> tmp.toString))
      assert(res.counts("_total") == 2L)
      // sink lands under the run's outDir (the lake model of the literal
      // file path); the line codec renders message + comma-joined tags
      val sinkPath = res.sinkPaths.values.head
      val lines = spark.read.text(sinkPath).collect().map(_.getString(0)).sorted.toSeq
      assert(lines == Seq("bar blah,mytag", "foo blah,mytag"), lines.mkString("|"))
    } finally graft.sources.TcpSource.stopListener(port)
  }

  test("reserved_tags_field fixture configs run verbatim: illegal tags quarantine to _tags") {
    // verbatim from qa/integration/fixtures/reserved_tags_field_spec.yml
    // (create_tags_map / create_tags_number): a json event whose top-level
    // `tags` is a MAP or a NUMBER LIST quarantines to `_tags` +
    // `_tagsparsefailure` (Event.java:100-130), visible in the json-codec
    // file output
    val tmp = java.nio.file.Files.createTempDirectory("graft_rsvtags")
    for ((name, msg, probe) <- Seq(
        ("create_tags_map", """{"tags": {"poison":true} }""", "\"poison\":true"),
        ("create_tags_number", """{"tags": [1,2,3] }""", "[1,2,3]"))) {
      val cfg = s"""input {
        |  generator {
        |    message => '$msg'
        |    codec => json
        |    count => 1
        |  }
        |}
        |output {
        |  file {
        |    path => "$${TEMP_PATH}/$name.log"
        |    flush_interval => 0
        |    codec => json
        |  }
        |}""".stripMargin
      LsclRun.runConfig(spark, cfg, s"$tmp/$name", Map("TEMP_PATH" -> tmp.toString))
      val line = spark.read.text(s"$tmp/$name/file_1").collect()(0).getString(0)
      assert(line.contains("\"tags\":[\"_tagsparsefailure\"]"), s"$name: $line")
      assert(line.contains("\"_tags\":"), s"$name: $line")
      assert(line.replace(" ", "").contains(probe.replace(" ", "")), s"$name: $line")
    }
  }

  test("undefined env var without default aborts the parse (reference compile error)") {
    val e = intercept[IllegalArgumentException] {
      Lscl.parse("""filter { if "${NOT_EXIST}" { mutate { add_tag => ["x"] } } }""",
        Map.empty)
    }
    assert(e.getMessage.contains("Cannot evaluate `${NOT_EXIST}`"))
  }

  test("${VAR:default} falls back; set var wins") {
    val c1 = Lscl.parse("""filter { mutate { add_field => { "t" => "${V:dflt}" } } }""", Map.empty)
    val Lscl.PluginItem(p1) = c1.filters.head: @unchecked
    assert(p1.attr("add_field").contains(Lscl.VHash(Seq("t" -> Lscl.VString("dflt")))))
    val c2 = Lscl.parse("""filter { mutate { add_field => { "t" => "${V:dflt}" } } }""",
      Map("V" -> "real"))
    val Lscl.PluginItem(p2) = c2.filters.head: @unchecked
    assert(p2.attr("add_field").contains(Lscl.VHash(Seq("t" -> Lscl.VString("real")))))
  }

  test("if/else-if/else lowers to exclusive sink conditions") {
    val cfg = Lscl.parse(
      """output {
        |  if [sev] == "ERROR" { s { id => "a" } }
        |  else if [sev] == "WARN" { s { id => "b" } }
        |  else { s { id => "c" } }
        |}""".stripMargin, Map.empty)
    val specs = LsclRun.sinkSpecs(cfg.outputs)
    assert(specs.map(_.name) == Seq("a", "b", "c"))
    // exactly one of the three conditions holds for any sev value
    for (sev <- Seq("ERROR", "WARN", "INFO", null)) {
      val row = Map[String, Any]("sev" -> sev)
      val hits = specs.map(s => RowOracle.eval(s.cond, row)).count(identity)
      assert(hits == 1, s"sev=$sev hits=$hits")
    }
  }

  test("branch semantics over a frame: else-if arm sees NOT(prior arms)") {
    import spark.implicits._
    val df = Seq(("ERROR", 10), ("WARN", 99), ("WARN", 1), ("INFO", 5))
      .toDF("sev", "n")
    val cfg = Lscl.parse(
      """filter {
        |  if [sev] == "ERROR" { mutate { add_tag => ["e"] } }
        |  else if [n] > 50 { mutate { add_tag => ["big"] } }
        |  else { mutate { add_tag => ["rest"] } }
        |}""".stripMargin, Map.empty)
    val got = LsclRun.applyFilters(df, cfg.filters)
      .select(col("sev"), col("n"), array_join(col("tags"), ",").as("t"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(got == Set(("ERROR", 10, "e"), ("WARN", 99, "big"),
      ("WARN", 1, "rest"), ("INFO", 5, "rest")))
  }

  test("conditional value mutations: gsub/lowercase/translate under a branch") {
    import spark.implicits._
    val df = Seq(("A", "Hello-World"), ("B", "Hello-World")).toDF("k", "v")
    val cfg = Lscl.parse(
      """filter {
        |  if [k] == "A" {
        |    mutate { gsub => ["v", "-", "_"] lowercase => ["v"] }
        |    translate { source => "k" target => "t" dictionary => { "A" => "alpha" } }
        |  }
        |}""".stripMargin, Map.empty)
    val got = LsclRun.applyFilters(df, cfg.filters)
      .select("k", "v", "t").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("A", "hello_world", "alpha"), ("B", "Hello-World", null)))
  }

  test("LSCL pipeline runs in STREAMING mode: micro-batch fan-out == batch") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("lscl_stream").toString
    val rows = Seq(("ERROR", 10, "s1"), ("WARN", 99, "s2"), ("WARN", 1, "s1"),
      ("INFO", 5, "s2"), ("ERROR", 70, "s2"))
    rows.toDF("sev", "n", "src").repartition(2).write.parquet(s"$tmp/in")
    val cfg = Lscl.parse(
      """filter {
        |  if [sev] == "ERROR" { mutate { add_tag => ["e"] } }
        |  else if [n] > 50 { mutate { add_tag => ["big"] } }
        |}
        |output {
        |  if "e" in [tags] { s { id => "errors" } }
        |  else { s { id => "rest" } }
        |}""".stripMargin, Map.empty)
    val batch = spark.read.parquet(s"$tmp/in")
    val source = spark.readStream.schema(batch.schema).parquet(s"$tmp/in")
    val q = graft.streaming.StreamPipeline.run(
      spark, source,
      b => LsclRun.applyFilters(b, cfg.filters),
      LsclRun.sinkSpecs(cfg.outputs).toIndexedSeq,
      s"$tmp/out", s"$tmp/chk",
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(s"$tmp/out/errors")
      .select("sev", "n").collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(streamed == Set(("ERROR", 10), ("ERROR", 70)))
    val rest = spark.read.parquet(s"$tmp/out/rest")
      .select("sev", "n").collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(rest == Set(("WARN", 99), ("WARN", 1), ("INFO", 5)))
  }

  test("runConfig executes a complete config text: input -> filter -> sinks on disk") {
    val out = java.nio.file.Files.createTempDirectory("lscl_run").toString
    val r = LsclRun.runConfig(spark,
      """input { generator { count => 600 lines => ["a err", "b ok"] } }
        |filter {
        |  if [message] =~ /err/ { mutate { add_tag => ["bad"] } }
        |}
        |output {
        |  if "bad" in [tags] { sink { id => "bad_rows" } }
        |  else { sink { id => "good_rows" } }
        |}""".stripMargin, out, Map.empty)
    assert(r.counts("bad_rows") == 300 && r.counts("good_rows") == 300
      && r.counts("_total") == 600)
    assert(spark.read.parquet(s"$out/bad_rows").count() == 300)
    assert(r.manifestPath.nonEmpty) // snapshot-chain commit point written
  }

  test("nodeStats: /_node/stats JSON over a completed run's surfaces") {
    val out = java.nio.file.Files.createTempDirectory("lscl_stats").toString
    LsclRun.runConfig(spark,
      """input { generator { count => 100 lines => ["a err", "b ok"] } }
        |filter { if [message] =~ /err/ { mutate { add_tag => ["bad"] } } }
        |output {
        |  if "bad" in [tags] { sink { id => "bad_rows" } }
        |  else { sink { id => "good_rows" } }
        |}""".stripMargin, out, Map.empty)
    val json = graft.operators.Route.nodeStats(spark, out)
    assert(json.contains("\"events\":{\"in\":100,\"out\":100}"), json)
    assert(json.contains("\"bad_rows\":{\"events_out\":50}"), json)
    assert(json.contains("\"good_rows\":{\"events_out\":50}"), json)
    assert(json.contains("\"snapshot_id\":0"), json)
  }

  test("parser plugins from config text: grok, dissect, csv, kv, date, drop") {
    import spark.implicits._
    val df = Seq(
      ("id=7 lvl=ERROR", "a,b,c", "2024-03-05 10:00:00", "GET /x 200"),
      ("id=9 lvl=WARN", "d,e,f", "2024-03-06 11:30:00", "POST /y 500"))
      .toDF("kvline", "csvline", "when", "reqline")
    val cfg = Lscl.parse(
      """filter {
        |  grok { match => { "reqline" => "%{WORD:verb} %{NOTSPACE:path} %{INT:code:int}" } }
        |  kv { source => "kvline" target => "kvs" }
        |  csv { source => "csvline" columns => ["c1", "c2", "c3"] }
        |  date { match => ["when", "yyyy-MM-dd HH:mm:ss"] target => "ts" }
        |  if [code] >= 500 { drop { } }
        |}""".stripMargin, Map.empty)
    val out = LsclRun.applyFilters(df, cfg.filters)
    val rows = out.select(col("verb"), col("code"), col("kvs")("lvl"),
        col("c2"), year(col("ts"))).collect()
    assert(rows.length == 1) // the 500 row dropped by the conditional drop
    val r = rows(0)
    assert(r.getString(0) == "GET" && r.getLong(1) == 200L) // grok :int -> long
    assert(r.getString(2) == "ERROR" && r.getString(3) == "b" && r.getInt(4) == 2024)
  }

  test("reference reload_config fixture's apache grok runs verbatim from config text") {
    import spark.implicits._
    // the `reload` filter section of qa/integration/fixtures/reload_config_spec.yml
    val cfg = Lscl.parse(
      """filter {
        |  grok {
        |    match => {
        |      "message" => "%{IPORHOST:clientip} %{USER:ident} %{USER:auth} \[%{HTTPDATE:timestamp}\] \"%{WORD:verb} %{DATA:request} HTTP/%{NUMBER:httpversion}\" %{NUMBER:response:int} (?:-|%{NUMBER:bytes:int}) %{QS:referrer} %{QS:agent}"
        |    }
        |  }
        |}""".stripMargin, Map.empty)
    val df = Seq(
      """127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326 "http://ref" "Mozilla/4.08"""",
      """10.1.2.3 - - [11/Oct/2000:00:01:02 +0000] "POST /submit HTTP/1.1" 500 - "-" "curl/7.1"""")
      .toDF("message")
    val out = LsclRun.applyFilters(df, cfg.filters)
      .select("clientip", "verb", "response", "bytes", "agent").collect()
      .map(r => (r.getString(0), r.getString(1), r.get(2), r.get(3), r.getString(4)))
    assert(out(0) == (("127.0.0.1", "GET", 200L, 2326L, "\"Mozilla/4.08\"")))
    assert(out(1) == (("10.1.2.3", "POST", 500L, null, "\"curl/7.1\"")))
  }

  test("reference dlq_spec fixture config runs near-verbatim: generator+DLQ inputs, json codec") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("lscl_dlq").toString
    // a persisted DLQ side-channel table to replay (one failed event)
    graft.operators.Dlq.entries(
        Seq((2L, """{"ip":2}""")).toDF("ip", "message"),
        lit("_jsonfail"), "filter", "json",
        to_timestamp(lit("2024-01-01 00:00:00")))
      .write.parquet(s"$tmp/dlq")
    // qa/integration/fixtures/dlq_spec.yml config, ERB path substituted
    val config =
      s"""input {
         |    generator{
         |      message => '{"ip":1}'
         |      codec => "json"
         |      count => 1000
         |    }
         |
         |    dead_letter_queue {
         |      path => "$tmp/dlq"
         |      commit_offsets => true
         |    }
         |  }
         |
         |  filter {
         |    if ([ip]) {
         |        mutate {
         |            remove_field => ["ip"]
         |            add_field => {
         |              "mutated" => "true"
         |            }
         |        }
         |    }
         |  }
         |  output {
         |    elasticsearch { index => "test-index" }
         |  }""".stripMargin
    val r = LsclRun.runConfig(spark, config, s"$tmp/out", Map.empty)
    assert(r.counts("test-index") == 1001) // 1000 generated + 1 replayed
    val sink = spark.read.parquet(s"$tmp/out/test-index")
    assert(sink.filter(col("mutated") === "true").count() == 1001)
    assert(sink.filter(col("ip").isNotNull).count() == 0) // removed everywhere
  }

  test("full filter-plugin surface from config text: fingerprint/prune/truncate/clone/split/geoip/useragent/translate-file") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("lscl_plugins").toString
    graft.operators.Mmdb.writeFixture(s"$tmp/geo.mmdb",
      Seq("10.0.0.0/8" -> Map("country" -> Map("iso_code" -> "aa"))))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/ua.yml"),
      "user_agent_parsers:\n  - regex: '(TB)/(\\d+)'\n    family_replacement: 'TB'\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/dict.csv"),
      "alpha,A\nbeta,B\n")
    val df = Seq(
      ("alpha", "10.1.2.3", "TB/9 agent", "a b c", "verylongvalue"),
      ("beta", "11.0.0.1", "other", "d e", "xy"))
      .toDF("key", "ip", "ua", "words", "big")
    val cfg = Lscl.parse(
      s"""filter {
         |  fingerprint { source => ["key", "ip"] target => "fp" method => "md5" }
         |  truncate { fields => ["big"] length_bytes => 4 }
         |  geoip { source => "ip" database => "$tmp/geo.mmdb" }
         |  useragent { source => "ua" regexes => "$tmp/ua.yml" }
         |  translate { source => "key" target => "t" dictionary_path => "$tmp/dict.csv" }
         |  mutate { split => { "words" => " " } }
         |  split { field => "words" target => "word" }
         |}""".stripMargin, Map.empty)
    val out = LsclRun.applyFilters(df, cfg.filters)
    val a = out.filter(col("key") === "alpha")
    assert(a.count() == 3) // split: one row per word
    val r = a.orderBy("word").collect()(0)
    assert(r.getAs[String]("fp").length == 32) // md5 hex
    assert(r.getAs[String]("big") == "very")
    assert(r.getAs[String]("geo_country_iso") == "aa")
    assert(r.getAs[String]("ua_family") == "TB" && r.getAs[String]("ua_major") == "9")
    assert(r.getAs[String]("t") == "A")
    val b = out.filter(col("key") === "beta").collect()(0)
    assert(b.getAs[String]("geo_country_iso") == null) // 11.x outside range
    assert(b.getAs[String]("ua_family") == "")
    // prune keeps only whitelisted columns (top-level schema op)
    val pruned = LsclRun.applyFilters(df,
      Lscl.parse("""filter { prune { whitelist_names => ["key", "ip"] } }""", Map.empty).filters)
    assert(pruned.columns.toSet == Set("key", "ip"))
    // mutate copy/merge/capitalize (reference mutate tail ops)
    val cm = LsclRun.applyFilters(
      Seq((Seq("a", "b"), Seq("c"), "hello world")).toDF("xs", "ys", "txt"),
      Lscl.parse(
        """filter {
          |  mutate { merge => { "xs" => "ys" } copy => { "txt" => "txt2" }
          |           capitalize => ["txt"] }
          |}""".stripMargin, Map.empty).filters).collect()(0)
    assert(cm.getAs[scala.collection.Seq[String]]("xs").toSeq == Seq("a", "b", "c"))
    assert(cm.getAs[String]("txt") == "Hello World")
    // copy is the LAST mutate op (reference order), so it sees capitalize
    assert(cm.getAs[String]("txt2") == "Hello World")
  }

  test("stdin input drains the driver's stdin into events (reference default input)") {
    val old = System.in
    try {
      System.setIn(new java.io.ByteArrayInputStream(
        "ERROR one\nINFO two\nERROR three\n".getBytes("UTF-8")))
      val cfg = graft.lscl.Lscl.parse(
        """input { stdin {} }
          |filter { if [message] =~ /^ERROR/ { mutate { add_tag => ["err"] } } }
          |""".stripMargin, Map.empty)
      val df = graft.lscl.LsclRun.applyFilters(
        graft.lscl.LsclRun.source(spark, cfg.inputs), cfg.filters)
      assert(df.count() == 3)
      assert(df.filter(org.apache.spark.sql.functions.array_contains(
        org.apache.spark.sql.functions.col("tags"), "err")).count() == 2)
    } finally System.setIn(old)
  }

  test("split filter on a STRING field fans out per terminator piece") {
    import spark.implicits._
    val df = Seq(("a|b|c", 1), ("solo", 2)).toDF("message", "id")
    val cfg = Lscl.parse(
      """filter { split { field => "message" target => "piece" terminator => "|" } }""",
      Map.empty)
    val out = LsclRun.applyFilters(df, cfg.filters)
      .select("id", "piece").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out == Set((1, "a"), (1, "b"), (1, "c"), (2, "solo")))
  }

  test("parse errors carry position; conditional rename merges, split normalizes") {
    val e = intercept[Lscl.ParseError](Lscl.parse("filter { mutate { x => } }", Map.empty))
    assert(e.getMessage.contains("line 1"))
    // rename under a conditional is a predicate-gated column merge
    // (CommonActions.java contract): matched rows move the value, unmatched
    // rows keep the source
    val cfg = Lscl.parse(
      """filter { if [a] == "x" { mutate { rename => { "a" => "b" } } } }""", Map.empty)
    import spark.implicits._
    val df = Seq("x", "y").toDF("a")
    val out = LsclRun.applyFilters(df, cfg.filters)
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set((null, "x"), ("y", null)))
    // conditional mutate split normalizes through the array type: matched
    // rows split, unmatched scalars become 1-element arrays (the engine's
    // scalar-as-list convention)
    val df2 = Seq("x,z", "y,w").toDF("a")
    val cfg2 = Lscl.parse(
      """filter { if [a] == "x,z" { mutate { split => { "a" => "," } } } }""", Map.empty)
    val out2 = LsclRun.applyFilters(df2, cfg2.filters)
      .select("a").collect().map(_.getSeq[String](0).toList).toSet
    assert(out2 == Set(List("x", "z"), List("y,w")))
  }

  test("kafka input: option mapping is exact, read fails loudly without connector jars") {
    val cfg = Lscl.parse(
      """input {
        |  kafka {
        |    bootstrap_servers => "broker1:9092,broker2:9092"
        |    topics => ["logs", "metrics"]
        |    group_id => "graft"
        |    auto_offset_reset => "earliest"
        |    security_protocol => "SSL"
        |  }
        |}""".stripMargin, Map.empty)
    val p = cfg.inputs.collect { case Lscl.PluginItem(pl) => pl }.head
    assert(LsclRun.kafkaOptions(p) == Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "logs,metrics",
      "kafka.group.id" -> "graft",
      "startingOffsets" -> "earliest",
      "kafka.security.protocol" -> "SSL"))
    // topics_pattern maps to subscribePattern; both together are rejected
    val p2 = Lscl.parse("""input { kafka { topics_pattern => "logs-.*" } }""",
      Map.empty).inputs.collect { case Lscl.PluginItem(pl) => pl }.head
    assert(LsclRun.kafkaOptions(p2)("subscribePattern") == "logs-.*")
    intercept[IllegalArgumentException](LsclRun.kafkaOptions(
      Lscl.parse("""input { kafka { } }""", Map.empty)
        .inputs.collect { case Lscl.PluginItem(pl) => pl }.head))
    // no connector jars in this environment: the source fails loudly with
    // a pointer at the missing artifact, never a silent empty frame
    val e = intercept[IllegalStateException](LsclRun.source(spark, cfg.inputs))
    assert(e.getMessage.contains("spark-sql-kafka"))
  }

  test("ruby filter fails loudly with a pointer at the typed escape hatch") {
    import spark.implicits._
    val df = Seq("x").toDF("a")
    val cfg = Lscl.parse(
      """filter { ruby { code => "event.set('b', 1)" } }""", Map.empty)
    val e = intercept[UnsupportedOperationException](
      LsclRun.applyFilters(df, cfg.filters))
    assert(e.getMessage.contains("ruby"))
    assert(e.getMessage.contains("escape hatch"))
  }
}
