package graft

import org.apache.spark.sql.functions._
import graft.operators.Codec
import graft.lscl.{Lscl, LsclRun}

/** CEF codec (ArcSight Common Event Format, logstash-codec-cef surface):
  * encode/decode round trips over the published escaping rules, syslog
  * prefixes, failure tagging, and the LSCL `codec => cef` file-input
  * lowering.
  */
class CefSpec extends SparkSpec {

  private def decode1(line: String) = {
    import spark.implicits._
    Codec.cefDecode(Seq(line).toDF("message"), "message").collect()(0)
  }

  test("decode: plain header + extension with spaced values") {
    val r = decode1("CEF:0|Vendor|Product|1.0|SIG-7|Thing happened|5|" +
      "src=10.1.2.3 msg=hello spaced world dst=10.9.9.9")
    assert(r.getAs[Int]("cef_version") == 0)
    assert(r.getAs[String]("cef_vendor") == "Vendor")
    assert(r.getAs[String]("cef_product") == "Product")
    assert(r.getAs[String]("cef_signature") == "SIG-7")
    assert(r.getAs[String]("cef_name") == "Thing happened")
    assert(r.getAs[String]("cef_severity") == "5")
    val ext = r.getAs[Map[String, String]]("cef_ext")
    assert(ext("src") == "10.1.2.3")
    assert(ext("msg") == "hello spaced world")
    assert(ext("dst") == "10.9.9.9")
    assert(r.getSeq[String](r.fieldIndex("tags")).isEmpty)
  }

  test("decode: header pipe/backslash escapes and extension equals escape") {
    val r = decode1("CEF:0|Ven\\|dor|Pro\\\\duct|1.0|sig|name|3|" +
      "msg=a\\=b and C:\\\\path k2=v2")
    assert(r.getAs[String]("cef_vendor") == "Ven|dor")
    assert(r.getAs[String]("cef_product") == "Pro\\duct")
    val ext = r.getAs[Map[String, String]]("cef_ext")
    assert(ext("msg") == "a=b and C:\\path")
    assert(ext("k2") == "v2")
  }

  test("decode: syslog prefix lands in cef_prefix; non-CEF line tags failure") {
    val r = decode1("<134>Feb  3 10:22:01 host CEF:0|V|P|1|s|n|2|k=v")
    assert(r.getAs[String]("cef_prefix") == "<134>Feb  3 10:22:01 host")
    assert(r.getAs[String]("cef_vendor") == "V")
    val bad = decode1("just a log line")
    assert(bad.getSeq[String](bad.fieldIndex("tags")) == Seq("_cefparsefailure"))
    assert(bad.getAs[String]("cef_vendor") == null)
  }

  test("decode: empty extension yields null map; newline escapes restore") {
    val r = decode1("CEF:0|V|P|1|s|n|2|")
    assert(r.getAs[Map[String, String]]("cef_ext") == null)
    val r2 = decode1("CEF:0|V|P|1|s|n|2|msg=line1\\nline2")
    assert(r2.getAs[Map[String, String]]("cef_ext")("msg") == "line1\nline2")
  }

  test("encode -> decode round trip preserves adversarial values") {
    import spark.implicits._
    val df = Seq(("ACME|Corp", "back\\slash", "k=v pairs here"))
      .toDF("vend", "dv", "msgv")
    val enc = df.select(Codec.cefEncode(col("vend"), lit("P"), col("dv"),
      lit("S"), lit("N"), lit("9"),
      Seq("msg" -> col("msgv"), "act" -> lit("block"))).as("message"))
    val line = enc.collect()(0).getString(0)
    assert(line.startsWith("CEF:0|ACME\\|Corp|P|back\\\\slash|S|N|9|msg=k\\=v pairs here act=block"))
    val r = Codec.cefDecode(enc, "message").collect()(0)
    assert(r.getAs[String]("cef_vendor") == "ACME|Corp")
    assert(r.getAs[String]("cef_device_version") == "back\\slash")
    val ext = r.getAs[Map[String, String]]("cef_ext")
    assert(ext("msg") == "k=v pairs here")
    assert(ext("act") == "block")
  }

  test("LSCL file input with codec => cef decodes lines from disk") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cef")
    java.nio.file.Files.writeString(tmp.resolve("cef.log"),
      "CEF:0|V1|P1|1|sig1|first|3|src=1.2.3.4\n" +
        "CEF:0|V2|P2|2|sig2|second|7|src=5.6.7.8\n")
    val cfg = Lscl.parse(
      s"""input { file { path => "$tmp/cef.log" codec => cef } }
         |filter { }
         |output { }""".stripMargin, Map.empty)
    val df = LsclRun.source(spark, cfg.inputs)
    val rows = df.orderBy("cef_signature").collect()
    assert(rows.map(_.getAs[String]("cef_vendor")).toSeq == Seq("V1", "V2"))
    assert(rows.map(_.getAs[Map[String, String]]("cef_ext")("src")).toSeq ==
      Seq("1.2.3.4", "5.6.7.8"))
  }
}
