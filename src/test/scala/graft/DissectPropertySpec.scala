package graft

import org.apache.spark.sql.functions._
import graft.operators.Parse

/** Property test for the full dissect scanner: inputs CONSTRUCTED by
  * joining random field values with random multi-separator literals must
  * dissect back to exactly those values — including `->` padding (repeated
  * separators) and `%{}` skip keys. Values are alphanumeric and separators
  * are not, so leftmost-separator scanning (the reference algorithm) is the
  * unique correct parse.
  */
class DissectPropertySpec extends SparkSpec {

  private val seps = Vector(" ", ",", " | ", "[", "]", ": ", "\t")

  test("random multi-separator patterns round-trip their constructed inputs") {
    val rng = new scala.util.Random(42)
    import spark.implicits._
    for (round <- 1 to 25) {
      val k = 2 + rng.nextInt(5) // 2..6 keys
      val values = (0 until k).map(_ => {
        val len = 1 + rng.nextInt(8)
        (0 until len).map(_ => "abcdefghijklmnopqrstuvwxyz0123456789"(
          rng.nextInt(36))).mkString
      })
      val kinds = (0 until k).map { i =>
        rng.nextInt(10) match {
          case 0 if i > 0 && i < k - 1 => "skip" // %{} consumes, captures nothing
          case 1 => "pad" // %{name->}: repeated separator after
          case _ => "plain"
        }
      }
      val sepSeq = (0 until k - 1).map(_ => seps(rng.nextInt(seps.length)))
      val pattern = (0 until k).map { i =>
        val key = kinds(i) match {
          case "skip" => "%{}"
          case "pad" => s"%{f$i->}"
          case _ => s"%{f$i}"
        }
        key + (if (i < k - 1) sepSeq(i) else "")
      }.mkString
      val input = (0 until k).map { i =>
        val rep = if (kinds(i) == "pad" && i < k - 1) 1 + rng.nextInt(3) else 1
        values(i) + (if (i < k - 1) sepSeq(i) * rep else "")
      }.mkString

      val row = Parse.dissect(Seq(input).toDF("message"), "message", pattern)
        .collect()(0)
      for (i <- 0 until k if kinds(i) != "skip") {
        assert(row.getAs[String](s"f$i") == values(i),
          s"round=$round pattern=`$pattern` input=`$input` field=f$i")
      }
      assert(!row.getAs[scala.collection.Seq[String]]("tags").contains("_dissectfailure"),
        s"round=$round pattern=`$pattern` input=`$input` tagged failure")
    }
  }

  test("non-matching input tags _dissectfailure and nulls all fields") {
    import spark.implicits._
    val row = Parse.dissect(Seq("no-separators-here").toDF("message"),
      "message", "%{a}, %{b}, %{c}").collect()(0)
    assert(row.getAs[scala.collection.Seq[String]]("tags").contains("_dissectfailure"))
    assert(row.getAs[String]("a") == null && row.getAs[String]("c") == null)
  }
}
