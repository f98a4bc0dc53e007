package graft

import graft.operators.Protobuf

/** protobuf wire-format codec: scalar round-trip, unknown-field skipping
  * (all four wire types), multi-byte varints, floats.
  */
class ProtobufSpec extends SparkSpec {

  private val Ddl = "name STRING, count BIGINT, score DOUBLE, ratio FLOAT, ok BOOLEAN"
  private val Nums = Map("name" -> 1, "count" -> 2, "score" -> 3,
    "ratio" -> 4, "ok" -> 5)

  test("scalar round-trip incl. multi-byte varint and fixed32 float") {
    import spark.implicits._
    val msg = Protobuf.pack(Seq(
      1 -> "héllo wörld", 2 -> 300L, // 300 needs 2 varint bytes
      3 -> 2.5, 4 -> 0.25f, 5 -> true))
    val out = Protobuf.decode(Seq(msg).toDF("frame"), "frame", Ddl, Nums).collect()
    val r = out(0)
    assert(r.getAs[String]("name") == "héllo wörld")
    assert(r.getAs[Long]("count") == 300L)
    assert(r.getAs[Double]("score") == 2.5)
    assert(r.getAs[Float]("ratio") == 0.25f)
    assert(r.getAs[Boolean]("ok"))
  }

  test("unknown fields skip by wire type; missing declared fields are null") {
    import spark.implicits._
    val msg = Protobuf.pack(Seq(
      90 -> 1234567L,     // unknown varint
      91 -> 3.14,         // unknown fixed64
      92 -> 1.5f,         // unknown fixed32
      93 -> "skip me",    // unknown length-delimited
      1 -> "kept"))       // declared; count/score/ratio/ok absent
    val out = Protobuf.decode(Seq(msg).toDF("frame"), "frame", Ddl, Nums).collect()
    val r = out(0)
    assert(r.getAs[String]("name") == "kept")
    assert(r.isNullAt(r.fieldIndex("count")) && r.isNullAt(r.fieldIndex("score")))
    assert(r.isNullAt(r.fieldIndex("ratio")) && r.isNullAt(r.fieldIndex("ok")))
  }
}
