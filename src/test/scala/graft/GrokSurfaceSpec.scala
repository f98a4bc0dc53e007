package graft

import org.apache.spark.sql.functions._
import graft.operators.Parse
import graft.lscl.{Lscl, LsclRun}

/** The full grok config surface: composite named patterns
  * (%{COMBINEDAPACHELOG}), pattern_definitions, overwrite, tag_on_failure,
  * break_on_match — plus the reference benchmark-cli apache.cfg filter
  * section run VERBATIM through the LSCL frontend
  * (tools/benchmark-cli/src/main/resources/org/logstash/benchmark/cli/cases/apache.cfg).
  */
class GrokSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private val combined =
    """93.180.71.3 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326 "http://www.example.com/start.html" "Mozilla/4.08 [en] (Win98; I ;Nav)""""
  private val combinedDash =
    """10.0.0.1 - - [26/Apr/2017:12:20:02 +0000] "POST /submit HTTP/1.1" 404 - "-" "curl/8.1""""

  test("%{COMBINEDAPACHELOG} resolves as a composite with its inner named captures") {
    val df = Seq(combined, combinedDash, "not a log line").toDF("message")
    val out = Parse.grok(df, "message", "%{COMBINEDAPACHELOG}")
      .select("clientip", "verb", "request", "response", "bytes", "referrer", "agent", "tags")
      .collect()
    assert(out(0).getAs[String]("clientip") == "93.180.71.3")
    assert(out(0).getAs[String]("verb") == "GET")
    assert(out(0).getAs[String]("request") == "/apache_pb.gif")
    assert(out(0).getAs[String]("response") == "200")
    assert(out(0).getAs[String]("bytes") == "2326")
    assert(out(0).getAs[String]("referrer") == "\"http://www.example.com/start.html\"")
    assert(out(1).getAs[String]("verb") == "POST")
    assert(out(1).getAs[String]("bytes") == "") // (?:%{NUMBER:bytes}|-) miss -> ""
    assert(out(2).getAs[String]("clientip") == null)
    assert(out(2).getSeq[String](out(2).fieldIndex("tags")) == Seq("_grokparsefailure"))
  }

  test("pattern_definitions shadow the library and may be composite; overwrite + tag_on_failure") {
    val df = Seq(("sev=HIGH code=7", "old"), ("nope", "old")).toDF("message", "sev")
    val out = Parse.grokFull(df, "message",
      Seq("%{KVSEV}"),
      defs = Map("KVSEV" -> "sev=%{WORD:sev} code=%{INT:code:int}"),
      overwrite = Set("sev"),
      tagOnFailure = Seq("_fail_a", "_fail_b"))
      .select("sev", "code", "tags").collect()
    assert(out(0).getAs[String]("sev") == "HIGH") // overwritten
    assert(out(0).getAs[Long]("code") == 7L)
    assert(out(1).getAs[String]("sev") == "old") // no match: untouched
    assert(out(1).getSeq[String](2) == Seq("_fail_a", "_fail_b"))
    // WITHOUT overwrite: existing non-null value is preserved (the typed
    // analogue of the reference's append-not-replace)
    val keep = Parse.grokFull(df, "message",
      Seq("%{KVSEV}"), defs = Map("KVSEV" -> "sev=%{WORD:sev} code=%{INT:code:int}"))
      .select("sev").collect()
    assert(keep(0).getString(0) == "old")
  }

  test("break_on_match => false: all matching patterns contribute captures") {
    val df = Seq("user=kim status=9").toDF("message")
    val out = Parse.grokFull(df, "message",
      Seq("user=%{WORD:u}", "status=%{INT:st:int}"), breakOnMatch = false)
      .select("u", "st").collect()(0)
    assert(out.getString(0) == "kim" && out.getLong(1) == 9L)
    // with break_on_match true (default) the first pattern wins and the
    // second never applies
    val first = Parse.grokFull(df, "message",
      Seq("user=%{WORD:u}", "status=%{INT:st:int}"))
      .select("u", "st").collect()(0)
    assert(first.getString(0) == "kim" && first.isNullAt(1))
  }

  test("benchmark-cli apache.cfg filter section runs VERBATIM through the LSCL frontend") {
    // geoip in apache.cfg names no database (the reference bundles GeoLite2);
    // our analogue is the session default-db property + an mmdb fixture
    val db = java.nio.file.Files.createTempFile("graft_apache_geo", ".mmdb").toString
    graft.operators.Mmdb.writeFixture(db, Seq(
      "93.0.0.0/8" -> Map("country" -> Map("iso_code" -> "de")),
      "10.0.0.0/8" -> Map("country" -> Map("iso_code" -> "aa"))))
    System.setProperty("graft.geoip.default_db", db)
    try {
      // filter section byte-for-byte from cases/apache.cfg:5-24
      val cfg = Lscl.parse(
        """filter {
          |  grok {
          |    match => {
          |      "message" => '%{IPORHOST:clientip} %{USER:ident} %{USER:auth} \[%{HTTPDATE:timestamp}\] "%{WORD:verb} %{DATA:request} HTTP/%{NUMBER:httpversion}" %{NUMBER:response:int} (?:-|%{NUMBER:bytes:int}) %{QS:referrer} %{QS:agent}'
          |    }
          |  }
          |
          |  date {
          |    match => [ "timestamp", "dd/MMM/YYYY:HH:mm:ss Z" ]
          |    locale => en
          |  }
          |
          |  geoip {
          |    source => "clientip"
          |  }
          |
          |  useragent {
          |    source => "agent"
          |    target => "useragent"
          |  }
          |}""".stripMargin, Map.empty)
      val df = Seq(combined, combinedDash).toDF("message")
      val out = LsclRun.applyFilters(df, cfg.filters).collect()
      assert(out(0).getAs[String]("clientip") == "93.180.71.3")
      assert(out(0).getAs[Long]("response") == 200L)
      assert(out(0).getAs[Long]("bytes") == 2326L)
      assert(out(1).isNullAt(out(1).fieldIndex("bytes"))) // the `-` branch
      // date: parsed with the Joda->java.time translated format, offset honored
      val ts = out(0).getAs[java.sql.Timestamp]("@timestamp")
      assert(ts != null && ts.toInstant == java.time.Instant.parse("2000-10-10T20:55:36Z"))
      // geoip enrich through the default db
      assert(out(0).getAs[String]("geo_country_iso") == "de")
      assert(out(1).getAs[String]("geo_country_iso") == "aa")
      // useragent with target prefix
      assert(out(1).getAs[String]("useragent_name") == "curl")
    } finally System.clearProperty("graft.geoip.default_db")
  }
}
