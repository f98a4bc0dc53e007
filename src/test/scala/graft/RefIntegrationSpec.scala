package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.lscl.LsclRun

/** `es_output_how_spec.yml`'s `default` pipeline run VERBATIM: the full
  * apache chain — grok -> date -> geoip -> useragent -> bare
  * `elasticsearch {}` — over the reference's own `how_sample.input`.
  * (mixed_codec fixture coverage lives in PluginSurfaceSpec.)
  */
class RefIntegrationSpec extends SparkSpec {

  private def withStdin[A](text: String)(body: => A): A = {
    val prev = System.in
    System.setIn(new java.io.ByteArrayInputStream(text.getBytes("UTF-8")))
    try body finally System.setIn(prev)
  }

  // qa/integration/fixtures/es_output_how_spec.yml `default`, VERBATIM:
  // the reference's canonical apache pipeline. Inputs are the reference's
  // own how_sample.input lines; the bare `elasticsearch {}` output lands in
  // the legacy default daily index `logstash-%{+yyyy.MM.dd}`.
  private val howConfig = """input {
      stdin { }
    }

    filter {
      grok {
        match => {
          "message" => "%{IPORHOST:clientip} %{USER:ident} %{USER:auth} \[%{HTTPDATE:timestamp}\] \"%{WORD:verb} %{DATA:request} HTTP/%{NUMBER:httpversion}\" %{NUMBER:response:int} (?:-|%{NUMBER:bytes:int}) %{QS:referrer} %{QS:agent}"
        }
      }

      date {
        match => [ "timestamp", "dd/MMM/YYYY:HH:mm:ss Z" ]
        locale => en
      }
      geoip {
        ecs_compatibility => disabled
        source => "clientip"
      }
      useragent {
        ecs_compatibility => disabled
        source => "agent"
        target => "useragent"
      }
    }

    output {
      elasticsearch {}
    }"""

  test("es_output_how default pipeline runs VERBATIM over how_sample.input") {
    val sample = Paths.get("/root/reference/qa/integration/fixtures/how_sample.input")
    assume(Files.exists(sample))
    val tmp = Files.createTempDirectory("graft_eshow")
    // the geoip filter without `database` uses the session default db (the
    // reference's bundled-GeoLite2 analogue) — a synthesized REAL-format
    // mmdb covering the sample's /8s
    graft.operators.Mmdb.writeFixture(s"$tmp/geo.mmdb", Seq(
      "74.0.0.0/8" -> Map("country" -> Map("iso_code" -> "us")),
      "66.0.0.0/8" -> Map("country" -> Map("iso_code" -> "us")),
      "46.0.0.0/8" -> Map("country" -> Map("iso_code" -> "fr"))))
    System.setProperty("graft.geoip.default_db", s"$tmp/geo.mmdb")
    try {
      val res = withStdin(Files.readString(sample)) {
        LsclRun.runConfig(spark, howConfig, s"$tmp/out", Map.empty)
      }
      assert(res.counts("_total") == 37L) // wc -l how_sample.input
      val sink = spark.read.parquet(res.sinkPaths.values.head)
      // every event carries the apache timestamp date (11/Sep/2014) ->
      // ONE daily partition, proving grok+date+default-index composed
      val idx = sink.select("_index").distinct().collect().map(_.getString(0)).toSeq
      assert(idx == Seq("logstash-2014.09.11"), idx.mkString("|"))
      val first = sink.filter(col("clientip") === "74.125.176.147").collect()(0)
      assert(first.getAs[String]("verb") == "GET")
      assert(first.getAs[Long]("response") == 200L)
      assert(first.getAs[Long]("bytes") == 29941L)
      assert(first.getAs[String]("geo_country_iso") == "us")
      val ff = sink.filter(col("message").contains("Firefox/6.0")).collect()(0)
      assert(ff.getAs[String]("useragent_name") == "Firefox")
      assert(ff.getAs[String]("useragent_version") == "6.0")
      // grok `:int` conversions are integral columns (long, the repo's
      // established mapping of the reference's arbitrary-precision Integer)
      assert(sink.schema("response").dataType.typeName == "long")
      assert(sink.schema("bytes").dataType.typeName == "long")
    } finally System.clearProperty("graft.geoip.default_db")
  }
}
