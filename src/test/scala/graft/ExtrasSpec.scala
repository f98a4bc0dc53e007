package graft

import org.apache.spark.sql.functions._
import graft.operators.Extras

/** Edge cases for the ecosystem filter batch (bytes/range/extractnumbers/
  * tld/json_encode/metricize/age/cipher) beyond the lscl_extras* oracle
  * gates.
  */
class ExtrasSpec extends SparkSpec {

  private def one(expr: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(expr.as("v")).collect()(0).get(0)
  }

  test("bytes: binary vs metric conversion, separators, failure null") {
    assert(one(Extras.parseBytes(lit("2kb"), binary = true)) == 2048.0)
    assert(one(Extras.parseBytes(lit("2 KB"), binary = false)) == 2000.0)
    assert(one(Extras.parseBytes(lit("2KiB"), binary = false)) == 2000.0) // method wins over spelling
    assert(one(Extras.parseBytes(lit("1,024"), binary = true)) == 1024.0)
    assert(one(Extras.parseBytes(lit("2.5 MiB"), binary = true)) == 2.5 * 1024 * 1024)
    assert(one(Extras.parseBytes(lit("1gb"), binary = true)) == math.pow(1024, 3))
    assert(one(Extras.parseBytes(lit("7"), binary = true)) == 7.0)
    assert(one(Extras.parseBytes(lit("12 parsecs"), binary = true)) == null)
    assert(one(Extras.parseBytes(lit("big"), binary = true)) == null)
  }

  test("tld: bare domain, two-part suffix, deep subdomain, single label") {
    val got = one(Extras.tldParse(lit("a.b.example.co.uk"))).toString
    assert(got == "[co.uk,example,a.b,example.co.uk,a.b.example.co.uk]")
    assert(one(Extras.tldParse(lit("example.com"))).toString ==
      "[com,example,null,example.com,null]")
    assert(one(Extras.tldParse(lit("localhost"))).toString ==
      "[localhost,null,null,null,null]")
  }

  test("range: negate flips membership; drop removes rows") {
    import spark.implicits._
    val df = Seq(1.0, 5.0, 50.0).toDF("v")
    val rules = Seq(Extras.RangeRule("v", 0, 10, "tag:in"))
    val tags = Extras.rangeApply(df, rules, negate = true, lit(true))
      .select(coalesce(array_join(col("tags"), ","), lit("")).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(tags == Seq("", "", "in"))
    val kept = Extras.rangeApply(df, Seq(Extras.RangeRule("v", 0, 10, "drop")),
      negate = false, lit(true)).collect()
    assert(kept.map(_.getDouble(0)).toSeq == Seq(50.0))
  }

  test("metricize: drop_original_event keeps only split rows") {
    import spark.implicits._
    val df = Seq((1, 10.0, 20.0)).toDF("id", "m1", "m2")
    val out = Extras.metricize(df, Seq("m1", "m2"), dropOriginal = true, lit(true))
      .select("id", "metric", "value").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1, "m1", 10.0), (1, "m2", 20.0)))
  }

  test("cipher: deterministic ciphertext with config IV, round-trip exact") {
    import spark.implicits._
    val df = Seq("alpha", "alpha", "beta").toDF("pt")
    val iv = "00112233445566778899aabbccddeeff"
    val enc = df.withColumn("ct", Extras.cipherEncrypt(col("pt"), "k3y", iv))
    val cts = enc.select("ct").collect().map(_.getString(0)).toSeq
    assert(cts(0) == cts(1) && cts(0) != cts(2)) // same pt => same ct
    val rt = enc.withColumn("rt", Extras.cipherDecrypt(col("ct"), "k3y"))
      .select("rt").collect().map(_.getString(0)).toSeq
    assert(rt == Seq("alpha", "alpha", "beta"))
  }

  test("extractnumbers: bounded columns, overflow tokens dropped") {
    import spark.implicits._
    val df = Seq("x 1 2 3 4.5 6.25 -7").toDF("s")
    val row = Extras.extractNumbers(df, "s", maxInts = 2, maxFloats = 1).collect()(0)
    assert(row.getAs[Long]("int1") == 1L && row.getAs[Long]("int2") == 2L)
    assert(row.getAs[Double]("float1") == 4.5)
    assert(!row.schema.fieldNames.contains("int3") && !row.schema.fieldNames.contains("float2"))
  }

  test("json_encode: control characters escape to valid JSON; null stays null") {
    import spark.implicits._
    val df = Seq(Some("a\nb\t\"q\"\\"), None).toDF("s")
    val out = Extras.jsonEncode(df, "s", "j", lit(true))
      .select("j").collect().map(r => Option(r.getString(0))).toSeq
    assert(out(0).contains("\"a\\nb\\t\\\"q\\\"\\\\\""))
    assert(out(1).isEmpty)
  }

  test("extractnumbers under a gate preserves prior values on unmatched rows") {
    import spark.implicits._
    val df = Seq(("row1", "x 7", true), ("row2", "x 9", false)).toDF("id", "s", "g")
    val first = Extras.extractNumbers(df, "s", maxInts = 1, maxFloats = 1, gate = lit(true))
    // second pass gated: row2 unmatched must KEEP int1=9 from the first pass
    val second = Extras.extractNumbers(
      first.withColumn("s", lit("y 100")), "s", maxInts = 1, maxFloats = 1, gate = col("g"))
    val got = second.select("id", "int1").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("row1" -> 100L, "row2" -> 9L))
  }

  test("unsupported-plugin error lists the ecosystem batch") {
    val cfg = graft.lscl.Lscl.parse("""filter { nope { } }""", Map.empty)
    import spark.implicits._
    val e = intercept[UnsupportedOperationException] {
      graft.lscl.LsclRun.applyFilters(Seq(1).toDF("x"), cfg.filters)
    }
    assert(e.getMessage.contains("metricize") && e.getMessage.contains("cipher"))
  }
}
