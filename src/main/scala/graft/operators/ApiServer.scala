package graft.operators

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.SparkSession

import graft.model.Json

/** The reference's monitoring API webserver (`logstash-core/lib/logstash/
  * webserver.rb` + the `api/modules` endpoints): a driver-side JDK
  * httpserver publishing node state over COMPLETED run surfaces — the
  * persisted `_counts`/`_metrics`/`_dlq` tables a [[Route.run]]/`runConfig`
  * leaves under each pipeline's output directory. Binding scans the
  * reference's port range (9600-9700, first free wins — webserver.rb
  * PORT_RANGE) unless an explicit port is given.
  *
  * Served endpoints (the public API surface the qa specs drive):
  *   - `GET /`                      root node document (status green)
  *   - `GET /_health_report`        top-level status + pipeline indicators
  *   - `GET /_node`                 node info: pipelines + jvm
  *   - `GET /_node/stats`           the full stats document (see below)
  *   - `GET /_node/logging`         active logger levels
  *   - `PUT /_node/logging`         `{"logger.<name>":"<LEVEL>"}` — applied
  *                                  to the log4j2 runtime like the reference
  *   - `PUT /_node/logging/reset`   restore pre-override levels
  *
  * Stats semantics (monitoring_api_spec.rb:142-172): `events.in` and
  * `events.filtered` count events ENTERING the pipeline/filter stage (a
  * `drop` still counts — in=1/filtered=1/out=0; a `clone` fans out only the
  * OUT side — in=1/filtered=1/out=3); `events.out` sums the per-sink routed
  * counts. Per-pipeline documents add plugin out-counters, flow metrics
  * (when `runWithMetrics` persisted them), `queue.type` (always "memory" —
  * the journal sources are the durable-queue analogue), and
  * `dead_letter_queue.queue_size_in_bytes` when a `_dlq` table exists under
  * the run directory (absent otherwise, like the reference with DLQ off).
  */
final class ApiServer(spark: SparkSession, explicitPort: Option[Int] = None) {

  private val pipelines = mutable.LinkedHashMap.empty[String, String]
  private val loggerOverrides = mutable.LinkedHashMap.empty[String, String]

  /** Publish a completed run: its stats appear as pipeline `id`. */
  def register(id: String, outDir: String): this.type =
    synchronized { pipelines += id -> outDir; this }

  // ---- bind: the reference scans 9600-9700 and takes the first free port
  val (server: HttpServer, port: Int) = {
    def tryBind(p: Int): Option[HttpServer] =
      try Some(HttpServer.create(new InetSocketAddress("127.0.0.1", p), 0))
      catch { case _: java.io.IOException => None }
    val bound = explicitPort match {
      case Some(p) => tryBind(p).map(s => (s, p)).getOrElse(
        throw new IllegalStateException(s"api port $p is in use"))
      case None =>
        (9600 to 9700).iterator.flatMap(p => tryBind(p).map(s => (s, p)))
          .nextOption().getOrElse(
            throw new IllegalStateException("no free port in 9600-9700"))
    }
    bound
  }

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.getResponseHeaders.add("Content-Type", "application/json")
    x.sendResponseHeaders(code, bytes.length.toLong)
    x.getResponseBody.write(bytes)
    x.close()
  }

  private def handler(f: HttpExchange => (Int, String)): com.sun.net.httpserver.HttpHandler =
    (x: HttpExchange) =>
      try { val (c, b) = f(x); respond(x, c, b) }
      catch { case e: Exception => respond(x, 500, s"""{"error":${Json.quote(String.valueOf(e.getMessage))}}""") }

  // ---- documents --------------------------------------------------------

  private def rootDoc: String =
    s"""{"host":${Json.quote(java.net.InetAddress.getLocalHost.getHostName)},""" +
      s""""version":"graft","http_address":"127.0.0.1:$port","status":"green"}"""

  private def healthReport: String = {
    val pl = synchronized(pipelines.keys.toSeq)
      .map(id => s"${Json.quote(id)}:{\"status\":\"green\"}").mkString(",")
    s"""{"status":"green","indicators":{"pipelines":{"status":"green","details":{$pl}}}}"""
  }

  private def counts(outDir: String): Map[String, Long] =
    try spark.read.parquet(s"$outDir/_counts")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    catch { case _: Exception => Map.empty }

  private def flow(outDir: String): Seq[(String, Double)] =
    try spark.read.parquet(s"$outDir/_metrics")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq.sortBy(_._1)
    catch { case _: Exception => Nil }

  /** DLQ byte size: filesystem-level sum over the run's `_dlq` table, when
    * one was persisted (driver-side directory listing, no job).
    */
  private def dlqBytes(outDir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(outDir, "_dlq")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(fs.listStatus(p).filter(_.isFile).map(_.getLen).sum)
  }

  private def pipelineDoc(outDir: String): String = {
    val c = counts(outDir)
    val in = c.getOrElse("_in", c.getOrElse("_total", 0L))
    val out = c.filter(!_._1.startsWith("_")).values.sum
    val plugins = c.toSeq.filter(!_._1.startsWith("_")).sortBy(_._1)
      .map { case (k, v) => s"""{"id":${Json.quote(k)},"events":{"out":$v}}""" }
      .mkString(",")
    val fl = flow(outDir).map { case (k, v) => s"${Json.quote(k)}:$v" }.mkString(",")
    val dlq = dlqBytes(outDir)
      .map(b => s""","dead_letter_queue":{"queue_size_in_bytes":$b}""").getOrElse("")
    s"""{"events":{"in":$in,"filtered":$in,"out":$out},""" +
      s""""plugins":{"outputs":[$plugins]},"flow":{$fl},""" +
      s""""reloads":{"successes":0,"failures":0},"queue":{"type":"memory"}$dlq}"""
  }

  private def statsDoc: String = {
    val snap = synchronized(pipelines.toSeq)
    val per = snap.map { case (id, dir) => s"${Json.quote(id)}:${pipelineDoc(dir)}" }
    val totals = snap.map { case (_, dir) => counts(dir) }
    val in = totals.map(c => c.getOrElse("_in", c.getOrElse("_total", 0L))).sum
    val out = totals.map(_.filter(!_._1.startsWith("_")).values.sum).sum
    s"""{"host":${Json.quote(java.net.InetAddress.getLocalHost.getHostName)},""" +
      s""""version":"graft","status":"green",""" +
      s""""jvm":{"uptime_in_millis":${java.lang.management.ManagementFactory.getRuntimeMXBean.getUptime}},""" +
      s""""events":{"in":$in,"filtered":$in,"out":$out},""" +
      s""""pipelines":{${per.mkString(",")}}}"""
  }

  private def nodeDoc: String = {
    val pl = synchronized(pipelines.keys.toSeq)
      .map(id => s"${Json.quote(id)}:{\"workers\":${spark.sparkContext.defaultParallelism}}")
      .mkString(",")
    s"""{"host":${Json.quote(java.net.InetAddress.getLocalHost.getHostName)},""" +
      s""""version":"graft","pipelines":{$pl},""" +
      s""""jvm":{"pid":${ProcessHandle.current().pid()}}}"""
  }

  /** `GET /_node/hot_threads` (api/modules/node.rb hot_threads): the
    * busiest JVM threads by cpu time with their stacks — REAL ThreadMXBean
    * data, the reference's human-text report shape inside a JSON envelope.
    */
  private def hotThreads(n: Int): String = {
    val mx = java.lang.management.ManagementFactory.getThreadMXBean
    val infos = mx.dumpAllThreads(false, false).toSeq
      .map(ti => (ti, mx.getThreadCpuTime(ti.getThreadId)))
      .sortBy(-_._2).take(n)
    val report = new StringBuilder
    report.append(s"::: {graft}\n   Hot threads at ${java.time.Instant.now()}:\n")
    infos.foreach { case (ti, cpu) =>
      report.append(f"   ${cpu / 1e9}%.2f s cpu | ${ti.getThreadName} [${ti.getThreadState}]%n")
      ti.getStackTrace.take(3).foreach(f => report.append(s"     $f\n"))
    }
    s"""{"hot_threads":{"threads":${infos.size},"report":${Json.quote(report.toString)}}}"""
  }

  /** `GET /_node/plugins` (api/modules/plugins.rb): the installed-plugin
    * inventory — the LSCL-lowerable names by section, the analogue of the
    * reference's gem list.
    */
  private def pluginsDoc: String = {
    val items = graft.lscl.LsclRun.pluginInventory.toSeq.sortBy(_._1)
      .flatMap { case (section, names) =>
        names.sorted.map(n =>
          s"""{"name":${Json.quote(n)},"type":${Json.quote(section)},"version":"graft"}""")
      }
    s"""{"total":${items.size},"plugins":[${items.mkString(",")}]}"""
  }

  // ---- logging API (api/modules/logging.rb): GET levels, PUT overrides
  // applied to the LIVE log4j2 runtime, PUT /reset restores ---------------

  private def loggingDoc: String = {
    val ls = synchronized(loggerOverrides.toSeq).sortBy(_._1)
      .map { case (k, v) => s"${Json.quote(k)}:${Json.quote(v)}" }.mkString(",")
    s"""{"loggers":{$ls}}"""
  }

  private val PutLogger = "\"logger\\.([^\"]+)\"\\s*:\\s*\"([^\"]+)\"".r

  private def loggingPut(body: String): (Int, String) = {
    val ms = PutLogger.findAllMatchIn(body).toSeq
    if (ms.isEmpty) (400, """{"error":"expected {\"logger.<name>\":\"<LEVEL>\"}"}""")
    else {
      ms.foreach { m =>
        val (name, level) = (m.group(1), m.group(2).toUpperCase)
        org.apache.logging.log4j.core.config.Configurator.setLevel(
          name, org.apache.logging.log4j.Level.valueOf(level))
        synchronized { loggerOverrides += name -> level }
      }
      (200, """{"acknowledged":true}""")
    }
  }

  private def loggingReset(): (Int, String) = {
    synchronized {
      loggerOverrides.keys.foreach { name =>
        // null level = inherit from configuration again (the reference's
        // reset re-reads the log4j config file)
        org.apache.logging.log4j.core.config.Configurator.setLevel(
          name, null: org.apache.logging.log4j.Level)
      }
      loggerOverrides.clear()
    }
    (200, """{"acknowledged":true}""")
  }

  server.createContext("/", handler { x =>
    val path = x.getRequestURI.getPath.stripSuffix("/")
    val method = x.getRequestMethod
    (method, if (path.isEmpty) "/" else path) match {
      case ("GET", "/") => (200, rootDoc)
      case ("GET", "/_health_report") => (200, healthReport)
      case ("GET", "/_node") => (200, nodeDoc)
      case ("GET", "/_node/stats") => (200, statsDoc)
      case ("GET", "/_node/hot_threads") =>
        val q = Option(x.getRequestURI.getQuery).getOrElse("")
        val n = "threads=(\\d+)".r.findFirstMatchIn(q)
          .flatMap(m => scala.util.Try(m.group(1).toInt).toOption).getOrElse(10)
        (200, hotThreads(n))
      case ("GET", "/_node/plugins") => (200, pluginsDoc)
      case ("GET", "/_node/logging") => (200, loggingDoc)
      case ("PUT", "/_node/logging") =>
        loggingPut(new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      case ("PUT", "/_node/logging/reset") => loggingReset()
      case _ => (404, s"""{"error":"no handler for $method $path"}""")
    }
  })
  server.setExecutor(null)
  server.start()

  def stop(): Unit = server.stop(0)
}
