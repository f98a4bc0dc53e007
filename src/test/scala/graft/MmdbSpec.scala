package graft

import graft.operators.Mmdb

/** mmdb binary-format reader/writer round-trip: tree traversal, data-section
  * type decode (maps, strings, uints, pointers), metadata marker scan, and
  * the leaf-range enumeration that feeds the broadcast geo range join.
  */
class MmdbSpec extends SparkSpec {

  private def ip(a: Int, b: Int, c: Int, d: Int): Long =
    ((a.toLong * 256 + b) * 256 + c) * 256 + d

  private def fixture(): String = {
    val p = java.nio.file.Files.createTempFile("mmdb_spec", ".mmdb").toString
    Mmdb.writeFixture(p, Seq(
      "10.0.0.0/11"    -> Map("country" -> Map("iso_code" -> "us"), "asn" -> 64512),
      "10.32.0.0/11"   -> Map("country" -> Map("iso_code" -> "eu"), "asn" -> 64513),
      "192.168.0.0/16" -> Map("country" -> Map("iso_code" -> "us"), "asn" -> 64512))) // dup value -> pointer
    p
  }

  test("metadata decodes: node_count/record_size/ip_version/type") {
    val r = Mmdb.read(fixture())
    assert(r.metadata.recordSize == 24)
    assert(r.metadata.ipVersion == 4)
    assert(r.metadata.databaseType == "graft-fixture")
    assert(r.metadata.nodeCount > 0)
  }

  test("lookup4 walks the tree; misses return None; pointers dedupe values") {
    val r = Mmdb.read(fixture())
    def iso(v: Any): String = v.asInstanceOf[Map[String, Any]]("country")
      .asInstanceOf[Map[String, Any]]("iso_code").toString
    assert(r.lookup4(ip(10, 0, 0, 1)).map(iso).contains("us"))
    assert(r.lookup4(ip(10, 31, 255, 255)).map(iso).contains("us"))
    assert(r.lookup4(ip(10, 32, 0, 0)).map(iso).contains("eu"))
    assert(r.lookup4(ip(10, 63, 255, 254)).map(iso).contains("eu"))
    assert(r.lookup4(ip(10, 64, 0, 0)).isEmpty)
    // the pointer-encoded duplicate value decodes identically
    val v192 = r.lookup4(ip(192, 168, 5, 5)).get
    assert(iso(v192) == "us")
    assert(v192.asInstanceOf[Map[String, Any]]("asn") == 64512L)
  }

  test("leafRanges4 enumerates exactly the written CIDR ranges") {
    val r = Mmdb.read(fixture())
    val ranges = r.leafRanges4().map { case (lo, hi, v) =>
      (lo, hi, v.asInstanceOf[Map[String, Any]]("asn")) }.toSet
    assert(ranges == Set(
      (ip(10, 0, 0, 0), ip(10, 31, 255, 255), 64512L),
      (ip(10, 32, 0, 0), ip(10, 63, 255, 255), 64513L),
      (ip(192, 168, 0, 0), ip(192, 168, 255, 255), 64512L)))
  }

  test("28-bit record size: same lookups and ranges as 24-bit") {
    val p = java.nio.file.Files.createTempFile("mmdb_28", ".mmdb").toString
    Mmdb.writeFixture(p, Seq(
      "10.0.0.0/11"  -> Map("country" -> Map("iso_code" -> "us")),
      "10.32.0.0/11" -> Map("country" -> Map("iso_code" -> "eu"))), recordSize = 28)
    val r = Mmdb.read(p)
    assert(r.metadata.recordSize == 28)
    def iso(v: Any): String = v.asInstanceOf[Map[String, Any]]("country")
      .asInstanceOf[Map[String, Any]]("iso_code").toString
    assert(r.lookup4(ip(10, 5, 5, 5)).map(iso).contains("us"))
    assert(r.lookup4(ip(10, 40, 0, 1)).map(iso).contains("eu"))
    assert(r.lookup4(ip(11, 0, 0, 0)).isEmpty)
    assert(r.leafRanges4().size == 2)
  }

  test("geoRangesFromMmdb feeds the broadcast range join") {
    import spark.implicits._
    val ranges = graft.operators.Enrich.geoRangesFromMmdb(spark, fixture(),
      Seq("country", "iso_code"), as = "iso")
    val df = Seq("10.2.3.4", "10.40.0.1", "8.8.8.8").toDF("ipstr")
    val got = graft.operators.Enrich.geoLookup(df, "ipstr", ranges)
      .select("ipstr", "iso").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("10.2.3.4" -> "us", "10.40.0.1" -> "eu", "8.8.8.8" -> null))
  }
}
