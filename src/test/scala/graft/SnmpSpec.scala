package graft

import org.apache.spark.sql.functions._
import graft.operators.Snmp

class SnmpSpec extends SparkSpec {

  test("BER oid round-trip covers multi-byte arcs and edge first-octets") {
    Seq("1.3.6.1.4.1.8072.2.3.0.1", "2.999.3", "0.0", "1.3.6.1.2.1.1.3.0")
      .foreach { oid =>
        val t = Snmp.trapV2c("c", 1, Seq(oid -> Right(5L)))
        val d = Snmp.decodeTrap(t)
        assert(d.varbinds.keySet == Set(oid), s"oid=$oid got=${d.varbinds}")
      }
  }

  test("value rendering: unsigned timeticks, binary octet string as hex, large ints") {
    val t = Snmp.trapV1("c", "1.3.6.1.4.1.42", "192.168.255.1",
      genericTrap = 6, specificTrap = 8, timeticks = 4000000000L, // > Int.Max
      vbs = Seq("1.3.6.1.4.1.1" -> Right(-12L), "1.3.6.1.4.1.2" -> Left("ok")))
    val d = Snmp.decodeTrap(t)
    assert(d.timeticks.contains(4000000000L))
    assert(d.agent_addr == "192.168.255.1")
    assert(d.varbinds("1.3.6.1.4.1.1") == "-12")
    assert(d.varbinds("1.3.6.1.4.1.2") == "ok")
  }

  test("plan invariants: canonicalUrl is a zero-exchange projection; url dedup has ONE exchange") {
    import spark.implicits._
    val df = Seq("https://WWW.Example.com:443/a/?b=2&utm_source=x#f",
      "http://u@site.org:80/p/").toDF("u")
    val proj = df.select(graft.functions.Text.canonicalUrl(col("u")).as("c"))
    val projPlan = proj.queryExecution.executedPlan.toString
    assert(!projPlan.contains("Exchange"),
      s"canonicalUrl must not shuffle:\n$projPlan")
    assert(!projPlan.contains("BatchEval") && !projPlan.contains("ScalaUDF"),
      s"canonicalUrl must stay UDF-free:\n$projPlan")
    assert(proj.as[String].collect().toSet ==
      Set("https://example.com/a?b=2", "http://site.org/p"))

    val dedup = df.select(graft.functions.Text.canonicalUrl(col("u")).as("c"))
      .groupBy("c").count()
    val n = dedup.queryExecution.executedPlan.toString
      .sliding("Exchange".length).count(_ == "Exchange")
    assert(n <= 2, s"url dedup wants one canonical-key exchange (+AQE read)") // partial agg -> one shuffle
  }

  test("snmptrap input: live udp datagrams decode v1 + v2c, garbage tags failure") {
    val port = 15975
    val tmp = java.nio.file.Files.createTempDirectory("graft_snmp_udp")
    val journal = tmp.resolve("snmp.journal")
    graft.sources.UdpSource.ensureListener(port, journal, base64Frames = true)
    try {
      val sock = new java.net.DatagramSocket()
      val pkts = Seq(
        Snmp.trapV1("public", "1.3.6.1.4.1.9", "10.1.2.3", 6, 4, 1234L,
          Seq("1.3.6.1.2.1.1.5.0" -> Left("router7"))),
        Snmp.trapV2c("private", 77L,
          Seq("1.3.6.1.6.3.1.1.4.1.0" -> Left("1.3.6.1.4.1.9.0.1"))),
        Array[Byte](9, 9, 9)) // garbage
      try pkts.foreach { b =>
        sock.send(new java.net.DatagramPacket(b, b.length,
          java.net.InetAddress.getLoopbackAddress, port))
      } finally sock.close()
      val deadline = System.currentTimeMillis() + 30000
      while ((!java.nio.file.Files.exists(journal) ||
          java.nio.file.Files.readAllLines(journal).size() < 3) &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      val cfg = graft.lscl.Lscl.parse(
        s"""input { snmptrap { port => $port journal => "$journal" } }""",
        Map.empty)
      val out = graft.lscl.LsclRun.source(spark, cfg.inputs)
        .select(col("snmp_version"), col("community"), col("enterprise"),
          col("agent_addr"), col("request_id"),
          array_join(col("tags"), ",").as("t"))
        .orderBy(coalesce(col("snmp_version"), lit("")))
        .collect()
      assert(out.length == 3)
      assert(out(0).isNullAt(0) && out(0).getString(5) == "_snmptrapparsefailure")
      assert(out(1).getString(0) == "1" && out(1).getString(1) == "public" &&
        out(1).getString(2) == "1.3.6.1.4.1.9" && out(1).getString(3) == "10.1.2.3")
      assert(out(2).getString(0) == "2c" && out(2).getLong(4) == 77L)
    } finally graft.sources.UdpSource.stopListener(port)
  }
}
