package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GELF codec (Graylog Extended Log Format 1.1, the public spec the
  * logstash-input-gelf / logstash-output-gelf plugins speak).
  *
  * Wire form (GELF-via-UDP): each datagram is one frame —
  *   - plain UTF-8 JSON (first byte `{`),
  *   - zlib-compressed JSON (first byte 0x78),
  *   - gzip-compressed JSON (magic 0x1f 0x8b), or
  *   - a CHUNK: magic 0x1e 0x0f, 8-byte message id, 1-byte sequence number,
  *     1-byte sequence count, then the chunk bytes. The reassembled body is
  *     itself one of the three whole-frame forms. At most 128 chunks per
  *     message per the spec.
  *
  * Decode is Spark-first: a narrow bytes→(id, seq, total, data) split UDF,
  * whole frames inflate directly, chunked frames reassemble via ONE
  * hash aggregation on the 8-byte message id (group size ≤ 128 chunks ×
  * datagram size — bounded by the transport, never corpus-sized), then the
  * typed work rides codegen'd `from_json` against the caller's schema like
  * every other schema'd codec here (no inference scan).
  *
  * Event semantics follow the reference gelf input's documented options:
  * `remap` (default true) surfaces `full_message`-else-`short_message` as
  * `message`; `strip_leading_underscore` (default true) renames the spec's
  * `_additional` fields to their bare names; a numeric `timestamp` (UNIX
  * seconds with fractional part) becomes `@timestamp` and the raw field is
  * removed. Incomplete chunk groups are dropped (the reference discards
  * them on its 5 s reaper; a batch read has no arrival clock).
  */
object Gelf {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** Split one frame: (chunk id hex | null, seq, total, payload bytes). */
  def splitFrame(b: Array[Byte]): (String, Int, Int, Array[Byte]) =
    if (b.length > 12 && b(0) == 0x1e.toByte && b(1) == 0x0f.toByte) {
      val id = b.slice(2, 10).map(x => f"${x & 0xff}%02x").mkString
      (id, b(10) & 0xff, b(11) & 0xff, b.drop(12))
    } else (null, 0, 1, b)

  /** Inflate one whole frame body: gzip (1f 8b) / zlib (78) / plain JSON. */
  def inflate(b: Array[Byte]): String = {
    if (b == null || b.isEmpty) return null
    val in: java.io.InputStream =
      if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b)
        new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
      else if ((b(0) & 0xff) == 0x78)
        new java.util.zip.InflaterInputStream(new java.io.ByteArrayInputStream(b))
      else return new String(b, Utf8)
    try new String(in.readAllBytes(), Utf8) finally in.close()
  }

  /** zlib-compress (the reference gelf output's default compression). */
  def deflate(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.DeflaterOutputStream(bos)
    out.write(s.getBytes(Utf8)); out.close()
    bos.toByteArray
  }

  /** Chunk one encoded frame body into `n` GELF chunks with message id
    * derived from `seed` (deterministic — tests and archives replay).
    */
  def chunk(body: Array[Byte], n: Int, seed: Long): Seq[Array[Byte]] = {
    require(n >= 1 && n <= 128, s"GELF allows 1..128 chunks, got $n")
    val id = java.nio.ByteBuffer.allocate(8).putLong(seed).array()
    val per = math.max(1, (body.length + n - 1) / n)
    val pieces = body.grouped(per).toSeq
    pieces.zipWithIndex.map { case (p, i) =>
      val bb = java.nio.ByteBuffer.allocate(12 + p.length)
      bb.put(0x1e.toByte).put(0x0f.toByte).put(id)
        .put(i.toByte).put(pieces.length.toByte).put(p)
      bb.array()
    }
  }

  private val splitU = udf((b: Array[Byte]) => splitFrame(b))
  private val inflateU = udf((b: Array[Byte]) => inflate(b))
  private val assembleU = udf((chunks: Seq[(Int, Array[Byte])]) => {
    // distinct seqs, first wins (a resent chunk is byte-identical anyway)
    val ordered = chunks.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.head._2)
    inflate(ordered.reduce(_ ++ _))
  })
  private val deflateU = udf((s: String) => if (s == null) null else deflate(s))

  /** Decode a binary frame column into GELF events against `schemaDdl`
    * (field names as they appear in the JSON — additional fields WITH the
    * leading underscore; `strip_leading_underscore` renames them after the
    * parse).
    */
  def decode(df: DataFrame, source: String, schemaDdl: String,
             remap: Boolean = true,
             stripLeadingUnderscore: Boolean = true): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
    val parts = df.select(splitU(col(source)).as("_g"))
    val whole = parts.filter(col("_g._1").isNull)
      .select(inflateU(col("_g._4")).as("_json"))
    val chunked = parts.filter(col("_g._1").isNotNull)
      .groupBy(col("_g._1"))
      .agg(collect_list(struct(col("_g._2").as("_1"), col("_g._4").as("_2"))).as("_chunks"),
        max(col("_g._3")).as("_total"))
      .filter(size(col("_chunks")) >= col("_total"))
      .select(assembleU(col("_chunks")).as("_json"))
    val parsed = whole.unionByName(chunked)
      .select(from_json(col("_json"), schema).as("_ev"))
      .select(col("_ev.*"))
    val remapped =
      if (remap && parsed.columns.contains("short_message")) {
        val full = if (parsed.columns.contains("full_message"))
          when(length(col("full_message")) > 0, col("full_message")) else lit(null)
        parsed.withColumn("message", coalesce(full, col("short_message")))
      } else parsed
    val timed =
      if (remapped.columns.contains("timestamp"))
        remapped.withColumn("@timestamp", timestamp_seconds(col("timestamp")))
          .drop("timestamp")
      else remapped
    if (stripLeadingUnderscore)
      timed.columns.filter(c => c.startsWith("_") && c != "@timestamp")
        .foldLeft(timed)((d, c) => d.withColumnRenamed(c, c.stripPrefix("_")))
    else timed
  }

  /** Encode: one GELF 1.1 frame body per event from the given columns
    * (version stamped, nulls dropped like the reference output), zlib'd
    * when `compress` (the reference gelf output's default).
    */
  def encode(cols: Seq[(String, Column)], compress: Boolean = true): Column = {
    val json = to_json(struct(
      (("version", lit("1.1")) +: cols).map { case (n, c) => c.as(n) }: _*))
    if (compress) deflateU(json) else json.cast("binary")
  }
}
