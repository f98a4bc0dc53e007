package graft

import org.apache.spark.sql.functions._
import graft.operators.Parse
import graft.lscl.{Lscl, LsclRun}

/** Full dissect: multi-separator patterns with the complete key-modifier
  * surface (docs/static/transforming-data.asciidoc:249-290 + published
  * dissect plugin docs; the engine is one anchored lazy regex through the
  * RegexExtractStruct kernel).
  */
class DissectSpec extends SparkSpec {
  import spark.implicits._

  test("the reference doc's own example: append keys over mixed separators") {
    val df = Seq(
      "Apr 26 12:20:02 localhost systemd[1]: Starting system activity accounting tool..."
    ).toDF("message")
    val out = Parse.dissect(df, "message",
      "%{ts} %{+ts} %{+ts} %{src} %{prog}[%{pid}]: %{msg}").collect()(0)
    assert(out.getAs[String]("ts") == "Apr 26 12:20:02")
    assert(out.getAs[String]("src") == "localhost")
    assert(out.getAs[String]("prog") == "systemd")
    assert(out.getAs[String]("pid") == "1")
    assert(out.getAs[String]("msg") == "Starting system activity accounting tool...")
    assert(out.getSeq[String](out.fieldIndex("tags")).isEmpty)
  }

  test("skip keys, right-padding, and failure tagging") {
    val df = Seq(
      "alpha   beta gamma",  // padded run of spaces after first field
      "nodelimiterhere"      // delimiters absent -> failure
    ).toDF("line")
    val out = Parse.dissect(df, "line", "%{a->} %{} %{c}")
      .select(col("a"), col("c"), array_join(col("tags"), ",").as("t"))
      .collect()
    assert(out(0).getString(0) == "alpha")
    assert(out(0).getString(1) == "gamma")
    assert(out(0).getString(2) == "")
    assert(out(1).getString(0) == null && out(1).getString(1) == null)
    assert(out(1).getString(2) == "_dissectfailure")
  }

  test("append with /n ordering joins by the first append key's preceding delimiter") {
    val df = Seq("evt-log").toDF("f")
    val out = Parse.dissect(df, "f", "%{+key/2}-%{+key/1}").collect()(0)
    assert(out.getAs[String]("key") == "log-evt")
  }

  test("?/& indirection builds the dissect_kv map") {
    val df = Seq("env=prod region=eu").toDF("f")
    val out = Parse.dissect(df, "f", "%{?k1}=%{&k1} %{?k2}=%{&k2}").collect()(0)
    val kv = out.getAs[Map[String, String]]("dissect_kv")
    assert(kv == Map("env" -> "prod", "region" -> "eu"))
  }

  test("LSCL dissect lowering handles multi-separator mappings") {
    val df = Seq("2026-08-16 host01[77]: boom").toDF("message")
    val cfg = Lscl.parse(
      """filter {
        |  dissect { mapping => { "message" => "%{date} %{host}[%{pid}]: %{rest}" } }
        |}""".stripMargin, Map.empty)
    val out = LsclRun.applyFilters(df, cfg.filters).collect()(0)
    assert(out.getAs[String]("date") == "2026-08-16")
    assert(out.getAs[String]("host") == "host01")
    assert(out.getAs[String]("pid") == "77")
    assert(out.getAs[String]("rest") == "boom")
  }
}
