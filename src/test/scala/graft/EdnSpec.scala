package graft

import org.apache.spark.sql.functions._
import graft.operators.{Codec, Edn}
import graft.lscl.{Lscl, LsclRun}

/** EDN codec (edn / edn_lines, published edn-format spec): transcoder unit
  * surface, encode render, Spark round trip, and the LSCL file lowering.
  */
class EdnSpec extends SparkSpec {

  test("transcode: scalars, keywords, symbols, chars") {
    assert(Edn.toJson("42") == "42")
    assert(Edn.toJson("-7") == "-7")
    assert(Edn.toJson("1.5") == "1.5")
    assert(Edn.toJson("1.5e2") == "150.0")
    assert(Edn.toJson("nil") == "null")
    assert(Edn.toJson("true") == "true")
    assert(Edn.toJson("\"a\\\"b\\nc\"") == "\"a\\\"b\\nc\"")
    assert(Edn.toJson(":foo/bar") == "\"foo/bar\"")
    assert(Edn.toJson("my-symbol") == "\"my-symbol\"")
    assert(Edn.toJson("\\c") == "\"c\"")
    assert(Edn.toJson("\\newline") == "\"\\n\"")
  }

  test("transcode: collections, commas as whitespace, comments, discard, tags") {
    assert(Edn.toJson("[1, 2, 3]") == "[1,2,3]")
    assert(Edn.toJson("(1 2)") == "[1,2]")
    assert(Edn.toJson("#{1 2}") == "[1,2]")
    assert(Edn.toJson("{:a 1, \"b\" 2, 7 3}") == """{"a":1,"b":2,"7":3}""")
    assert(Edn.toJson("{:a [1 {:b nil}]}") == """{"a":[1,{"b":null}]}""")
    assert(Edn.toJson("{:a 1} ; trailing") == """{"a":1}""")
    assert(Edn.toJson("[#_ 99 1 2]") == "[1,2]")
    assert(Edn.toJson("#inst \"2024-01-01T00:00:00Z\"") ==
      "\"2024-01-01T00:00:00Z\"")
    intercept[IllegalArgumentException](Edn.toJson("{:a 1} junk"))
  }

  test("encode renders keyword-keyed EDN map; round trips through decode") {
    import spark.implicits._
    val df = Seq(("he\"llo", 42L, 1.25, true, Seq("a", "b c")))
      .toDF("s", "n", "x", "ok", "arr")
    val edn = df.select(Codec.ednEncode(df).as("line")).collect()(0).getString(0)
    assert(edn == "{:s \"he\\\"llo\" :n 42 :x 1.25 :ok true :arr [\"a\" \"b c\"]}")
    val back = Codec.ednLines(df.select(Codec.ednEncode(df).as("line")), "line",
      "s STRING, n BIGINT, x DOUBLE, ok BOOLEAN, arr ARRAY<STRING>").collect()(0)
    assert(back.getAs[String]("s") == "he\"llo")
    assert(back.getAs[Long]("n") == 42L)
    assert(back.getSeq[String](back.fieldIndex("arr")) == Seq("a", "b c"))
  }

  test("LSCL file input with codec => edn_lines decodes typed events") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_edn")
    java.nio.file.Files.writeString(tmp.resolve("ev.edn"),
      "{:m \"first\" :v 10}\n{:m \"second\" :v 20} ; c\n")
    val cfg = Lscl.parse(
      s"""input { file { path => "$tmp/ev.edn"
         |  codec => edn_lines { schema => "m STRING, v INT" } } }
         |filter { }
         |output { }""".stripMargin, Map.empty)
    val rows = LsclRun.source(spark, cfg.inputs).orderBy("v").collect()
    assert(rows.map(_.getAs[String]("m")).toSeq == Seq("first", "second"))
    assert(rows.map(_.getAs[Int]("v")).toSeq == Seq(10, 20))
  }
}
