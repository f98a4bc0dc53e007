package graft

import org.apache.spark.sql.functions._
import graft.operators.{Codec, Msgpack}
import graft.lscl.{Lscl, LsclRun}

/** msgpack codec (public msgpack.org spec) — golden byte fixtures computed
  * by hand from the format table, full int/str width family, consecutive
  * self-delimiting objects, Spark column round trip, the fluent forward
  * protocol's three modes, and the LSCL binary-file lowering.
  */
class MsgpackSpec extends SparkSpec {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("encode golden bytes: fixmap/fixstr/fixint/negfix/float64/bool/nil/array") {
    assert(hex(Msgpack.fromJson("""{"a":1}""")) == "81a16101")
    assert(hex(Msgpack.fromJson("\"hello\"")) == "a568656c6c6f")
    assert(hex(Msgpack.fromJson("""{"k":[1,-2,true,null,"x"]}""")) ==
      "81a16b9501fec3c0a178")
    assert(hex(Msgpack.fromJson("""{"f":1.5}""")) == "81a166cb3ff8000000000000")
    // int width ladder (smallest-representation packing)
    assert(hex(Msgpack.fromJson("127")) == "7f")
    assert(hex(Msgpack.fromJson("128")) == "cc80")
    assert(hex(Msgpack.fromJson("256")) == "cd0100")
    assert(hex(Msgpack.fromJson("65536")) == "ce00010000")
    assert(hex(Msgpack.fromJson("4294967296")) == "d30000000100000000")
    assert(hex(Msgpack.fromJson("-32")) == "e0")
    assert(hex(Msgpack.fromJson("-33")) == "d0df")
    assert(hex(Msgpack.fromJson("-129")) == "d1ff7f")
    assert(hex(Msgpack.fromJson("-32769")) == "d2ffff7fff")
    assert(hex(Msgpack.fromJson("-2147483649")) == "d3ffffffff7fffffff")
    // str8 once past the 31-byte fixstr cap
    val s40 = "x" * 40
    assert(hex(Msgpack.fromJson("\"" + s40 + "\"")) == "d928" + hex(s40.getBytes))
  }

  test("decode golden bytes: every int/uint width, float32, str widths, bin") {
    assert(Msgpack.toJson(unhex("81a16101")) == """{"a":1}""")
    assert(Msgpack.toJson(unhex("cc80")) == "128")
    assert(Msgpack.toJson(unhex("cd0100")) == "256")
    assert(Msgpack.toJson(unhex("ce80000000")) == "2147483648")
    assert(Msgpack.toJson(unhex("cfffffffffffffffff")) == "18446744073709551615")
    assert(Msgpack.toJson(unhex("d0df")) == "-33")
    assert(Msgpack.toJson(unhex("d1ff7f")) == "-129")
    assert(Msgpack.toJson(unhex("d2ffff7fff")) == "-32769")
    assert(Msgpack.toJson(unhex("d37fffffffffffffff")) == "9223372036854775807")
    assert(Msgpack.toJson(unhex("ca3fc00000")) == "1.5") // float32
    assert(Msgpack.toJson(unhex("d9283078" + "78" * 38)) == "\"0x" + "x" * 38 + "\"")
    // bin8 surfaces as base64 (JSON has no binary)
    assert(Msgpack.toJson(unhex("c403010203")) == "\"AQID\"")
    // ext rejected loudly
    intercept[IllegalArgumentException](Msgpack.toJson(unhex("d40001")))
  }

  test("consecutive objects are self-delimiting; non-string keys stringify") {
    assert(Msgpack.toJsonAll(unhex("01a16181a16102")) ==
      Seq("1", "\"a\"", """{"a":2}"""))
    // fixmap with int key 7 -> {"7": true}
    assert(Msgpack.toJson(unhex("8107c3")) == """{"7":true}""")
  }

  test("Spark round trip: encode column -> decode with schema") {
    import spark.implicits._
    val df = Seq(("alpha", 42L, 1.25, true), ("beta", -7L, 0.5, false))
      .toDF("name", "n", "x", "ok")
    val packed = df.select(Codec.msgpackEncode(Seq(
      "name" -> col("name"), "n" -> col("n"), "x" -> col("x"), "ok" -> col("ok"),
      "missing" -> lit(null).cast("string"))).as("payload"))
    val back = Codec.msgpackDecode(packed, "payload",
      "name STRING, n BIGINT, x DOUBLE, ok BOOLEAN, missing STRING")
      .orderBy("name").collect()
    assert(back.length == 2)
    assert(back(0).getAs[String]("name") == "alpha")
    assert(back(0).getAs[Long]("n") == 42L)
    assert(back(0).getAs[Double]("x") == 1.25)
    assert(back(0).getAs[Boolean]("ok"))
    assert(back(0).getAs[String]("missing") == null)
    assert(back(1).getAs[Long]("n") == -7L)
  }

  test("fluent: message, forward, and packed-forward modes") {
    import spark.implicits._
    // Message: [tag, time, record]
    val msg = Msgpack.fromJson("""["app.log",1700000000,{"k":"v1","n":1}]""")
    // Forward: [tag, [[t, r], [t, r]]]
    val fwd = Msgpack.fromJson(
      """["web.acc",[[1700000001,{"k":"v2","n":2}],[1700000002,{"k":"v3","n":3}]]]""")
    // PackedForward: [tag, bin(<packed [t, r]>*)] — hand-framed bin8
    val inner = Msgpack.fromJson("""[1700000003,{"k":"v4","n":4}]""") ++
      Msgpack.fromJson("""[1700000004,{"k":"v5","n":5}]""")
    val pfw = Array[Byte](0x92.toByte, 0xa6.toByte) ++ "pf.tag".getBytes ++
      Array[Byte](0xc4.toByte, inner.length.toByte) ++ inner
    val df = Seq(msg, fwd, pfw).toDF("payload")
    val out = Codec.fluentDecode(df, "payload", "k STRING, n INT")
      .orderBy("fl_epoch").collect()
    assert(out.map(_.getAs[String]("k")).toSeq == Seq("v1", "v2", "v3", "v4", "v5"))
    assert(out.map(_.getAs[String]("fl_tag")).toSeq ==
      Seq("app.log", "web.acc", "web.acc", "pf.tag", "pf.tag"))
    assert(out.map(_.getAs[Long]("fl_epoch")).toSeq ==
      (1700000000L to 1700000004L))
  }

  test("LSCL file input with codec => msgpack reads a binary event file") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mp")
    val bytes = Msgpack.fromJson("""{"m":"first","v":10}""") ++
      Msgpack.fromJson("""{"m":"second","v":20}""")
    java.nio.file.Files.write(tmp.resolve("events.msgpack"), bytes)
    val cfg = Lscl.parse(
      s"""input { file { path => "$tmp/events.msgpack"
         |  codec => msgpack { schema => "m STRING, v INT" } } }
         |filter { }
         |output { }""".stripMargin, Map.empty)
    val rows = LsclRun.source(spark, cfg.inputs).orderBy("v").collect()
    assert(rows.map(_.getAs[String]("m")).toSeq == Seq("first", "second"))
    assert(rows.map(_.getAs[Int]("v")).toSeq == Seq(10, 20))
  }
}
