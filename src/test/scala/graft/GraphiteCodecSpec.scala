package graft

import org.apache.spark.sql.functions._
import graft.operators.Codec
import graft.lscl.{Lscl, LsclRun}

/** graphite codec decode (logstash-codec-graphite) + the graphite INPUT
  * plugin (= tcp listener + codec) over a live loopback socket.
  */
class GraphiteCodecSpec extends SparkSpec {

  private def decode1(line: String) = {
    import spark.implicits._
    Codec.graphiteDecode(Seq(line).toDF("message"), "message").collect()(0)
  }

  test("decode: metric value timestamp with Ruby prefix-parse semantics") {
    val r = decode1("servers.web01.cpu.load 1.5 1700000000")
    assert(r.getAs[String]("metric") == "servers.web01.cpu.load")
    assert(r.getAs[Double]("value") == 1.5)
    assert(r.getAs[java.sql.Timestamp]("@timestamp").getTime == 1700000000000L)
    assert(r.getAs[Map[String, Double]]("metrics") ==
      Map("servers.web01.cpu.load" -> 1.5))
    // Ruby to_f: suffix junk parses the numeric prefix; garbage -> 0.0
    assert(decode1("m 12.5x 10").getAs[Double]("value") == 12.5)
    assert(decode1("m 1.5e2 10").getAs[Double]("value") == 150.0)
    assert(decode1("m junk 10").getAs[Double]("value") == 0.0)
    // Ruby to_i on the epoch: prefix parse
    assert(decode1("m 1 99abc").getAs[java.sql.Timestamp]("@timestamp").getTime == 99000L)
  }

  test("decode: short line tags _graphiteparsefailure with null fields") {
    val r = decode1("just two")
    assert(r.getSeq[String](r.fieldIndex("tags")) == Seq("_graphiteparsefailure"))
    assert(r.getAs[String]("metric") == null)
    assert(r.get(r.fieldIndex("value")) == null)
  }

  test("LSCL graphite input decodes lines from a live tcp listener") {
    val port = 15984
    val tmp = java.nio.file.Files.createTempDirectory("graft_graphite")
    val journal = tmp.resolve("graphite.journal")
    graft.sources.TcpSource.ensureListener(port, journal)
    try {
      val s = new java.net.Socket("127.0.0.1", port)
      try {
        val w = new java.io.OutputStreamWriter(s.getOutputStream,
          java.nio.charset.StandardCharsets.UTF_8)
        w.write("a.b.c 1.25 1700000001\nd.e.f 2.5 1700000002\n")
        w.flush()
      } finally s.close()
      val deadline = System.currentTimeMillis() + 30000
      while ((!java.nio.file.Files.exists(journal) ||
          java.nio.file.Files.size(journal) < 44) &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)

      val cfg = Lscl.parse(
        s"""input { graphite { port => $port journal => "$journal" } }
           |filter { }
           |output { }""".stripMargin, Map.empty)
      val rows = LsclRun.source(spark, cfg.inputs).orderBy("metric").collect()
      assert(rows.map(_.getAs[String]("metric")).toSeq == Seq("a.b.c", "d.e.f"))
      assert(rows.map(_.getAs[Double]("value")).toSeq == Seq(1.25, 2.5))
    } finally graft.sources.TcpSource.stopListener(port)
  }
}
