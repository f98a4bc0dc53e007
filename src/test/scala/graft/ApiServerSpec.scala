package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._

import graft.lscl.{LsclRun, Settings}
import graft.operators.ApiServer

/** The monitoring API webserver over completed runs — the behaviors the
  * reference's monitoring_api_spec / webserver_spec / secret_store_spec
  * (settings case) drive over HTTP.
  */
class ApiServerSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()
  private def get(port: Int, path: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }
  private def put(port: Int, path: String, body: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .PUT(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def runCfg(cfg: String, out: String): Unit = {
    LsclRun.runConfig(spark, cfg, out, Map.empty); ()
  }

  test("drop and clone pipelines expose the reference event counters") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_api").toString
    // monitoring_api_spec.rb dropping_events: in=1, filtered=1, out=0
    runCfg("""input { generator { count => 1 } }
             |filter { drop { } }
             |output { file { path => "x" } }""".stripMargin, s"$tmp/drop")
    // cloning_events: clone fans 1 -> 3 on the OUT side only
    runCfg("""input { generator { count => 1 } }
             |filter { clone { clones => ["a", "b"] } }
             |output { file { path => "x" } }""".stripMargin, s"$tmp/clone")
    val api = new ApiServer(spark)
      .register("dropping", s"$tmp/drop")
      .register("cloning", s"$tmp/clone")
    try {
      val (code, body) = get(api.port, "/_node/stats")
      assert(code == 200, body)
      assert(body.contains(""""dropping":{"events":{"in":1,"filtered":1,"out":0}"""), body)
      assert(body.contains(""""cloning":{"events":{"in":1,"filtered":1,"out":3}"""), body)
      // global counters sum the pipelines (monitoring_api event_stats)
      assert(body.contains(""""events":{"in":2,"filtered":2,"out":3}"""), body)
      // jvm uptime is the real JVM's (spec asserts > 100 ms)
      val up = "\"uptime_in_millis\":(\\d+)".r.findFirstMatchIn(body).get.group(1).toLong
      assert(up > 100L)
      // queue stats present with the memory type (no PQ model)
      assert(body.contains(""""queue":{"type":"memory"}"""), body)
    } finally api.stop()
  }

  test("dead_letter_queue stats appear only when a _dlq table exists") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_apidlq").toString
    runCfg("""input { generator { count => 3 } }
             |output { file { path => "x" } }""".stripMargin, s"$tmp/run")
    val api = new ApiServer(spark).register("main", s"$tmp/run")
    try {
      val (_, before) = get(api.port, "/_node/stats")
      assert(!before.contains("dead_letter_queue"), before)
      // persist a DLQ table under the run dir -> stats gain the key
      Seq(("ev1", "parse fail")).toDF("message", "reason")
        .write.parquet(s"$tmp/run/_dlq")
      val (_, after) = get(api.port, "/_node/stats")
      val size = "\"queue_size_in_bytes\":(\\d+)".r
        .findFirstMatchIn(after).map(_.group(1).toLong)
      assert(size.exists(_ > 0L), after)
    } finally api.stop()
  }

  test("settings pipeline.id resolves from the secret store (secret_store_spec settings case)") {
    val ksPath = java.nio.file.Paths.get("/root/reference/qa/integration/logstash.keystore")
    assume(java.nio.file.Files.exists(ksPath))
    val settings = Settings.fromYaml("pipeline.id: ${pipeline.id}\n", Map(
      "LOGSTASH_KEYSTORE_PATH" -> ksPath.toString,
      "LOGSTASH_KEYSTORE_PASS" -> "keystore_pa9454w3rd"))
    assert(Settings.pipelineId(settings) == "mypipeline")
    val tmp = java.nio.file.Files.createTempDirectory("graft_apiks").toString
    runCfg("""input { generator { count => 2 } }
             |output { file { path => "x" } }""".stripMargin, s"$tmp/run")
    val api = new ApiServer(spark).register(Settings.pipelineId(settings), s"$tmp/run")
    try {
      // secret_store_spec.rb:72-79 — node_stats pipelines contains mypipeline
      val (_, body) = get(api.port, "/_node/stats")
      assert(body.contains("\"mypipeline\":{\"events\""), body)
    } finally api.stop()
  }

  test("logging API: PUT applies log4j2 levels, reset restores") {
    val api = new ApiServer(spark)
    try {
      val (c1, b1) = put(api.port, "/_node/logging", """{"logger.graft.apitest": "DEBUG"}""")
      assert(c1 == 200 && b1.contains("acknowledged"), b1)
      assert(org.apache.logging.log4j.LogManager.getLogger("graft.apitest")
        .getLevel == org.apache.logging.log4j.Level.DEBUG)
      val (_, levels) = get(api.port, "/_node/logging")
      assert(levels.contains("\"graft.apitest\":\"DEBUG\""), levels)
      val (c2, _) = put(api.port, "/_node/logging/reset", "")
      assert(c2 == 200)
      val (_, after) = get(api.port, "/_node/logging")
      assert(after == """{"loggers":{}}""", after)
      // malformed body is a 400
      val (c3, _) = put(api.port, "/_node/logging", """{"nope": 1}""")
      assert(c3 == 400)
    } finally api.stop()
  }

  test("webserver behaviors: port range scan, root doc, health report") {
    val a = new ApiServer(spark)
    val b = new ApiServer(spark) // second server takes the next free port
    try {
      assert(a.port >= 9600 && a.port <= 9700)
      assert(b.port > a.port && b.port <= 9700)
      val (_, root) = get(a.port, "/")
      assert(root.contains("\"status\":\"green\"") &&
        root.contains(s""""http_address":"127.0.0.1:${a.port}""""), root)
      val (_, health) = get(b.port, "/_health_report")
      assert(health.contains("\"status\":\"green\""), health)
      val (c404, _) = get(a.port, "/_nothing")
      assert(c404 == 404)
      // hot_threads: real ThreadMXBean dump in the reference report shape
      val (chs, hs) = get(a.port, "/_node/hot_threads?threads=3")
      assert(chs == 200 && hs.contains("\"threads\":3") &&
        hs.contains("Hot threads at"), hs.take(200))
      // plugins inventory: implemented names present, fail-louds absent
      val (cpl, pl) = get(a.port, "/_node/plugins")
      assert(cpl == 200, pl.take(200))
      assert(pl.contains("""{"name":"grok","type":"filter""""), pl.take(300))
      assert(pl.contains("""{"name":"beats","type":"input""""))
      assert(!pl.contains("\"ruby\"") && !pl.contains("\"memcached\""))
      val total = "\"total\":(\\d+)".r.findFirstMatchIn(pl).get.group(1).toInt
      assert(total > 100, s"inventory suspiciously small: $total")
    } finally { a.stop(); b.stop() }
  }

  test("plugin inventory: every listed filter name actually dispatches") {
    import spark.implicits._
    val df = Seq(("m1", "k=v")).toDF("message", "kvs")
    LsclRun.pluginInventory("filter").foreach { name =>
      val cfg = graft.lscl.Lscl.parse(s"filter { $name {} }", Map.empty)
      try { LsclRun.applyFilters(df, cfg.filters); () }
      catch {
        case e: UnsupportedOperationException
            if String.valueOf(e.getMessage).contains("unsupported filter plugin") =>
          fail(s"inventory filter `$name` hit the unsupported path")
        case _: Exception => () // missing required attrs etc. — still dispatched
      }
    }
  }
}
