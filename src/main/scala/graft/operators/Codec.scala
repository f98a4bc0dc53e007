package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Codec stage — byte/line framing re-expressed over columns (SURVEY.md
  * §2.1: codecs line / json_lines / multiline). In the reference a codec
  * turns a byte stream into events before the queue; here the durable table
  * is already framed, so codecs are narrow transforms that re-frame a text
  * column (split / parse / reassemble).
  */
object Codec {

  /** line codec (reference plugins/codecs/Line.java:53-140 semantics): split
    * a blob on the delimiter, one event per line, trailing delimiter
    * stripped (split drops no inner empties; a trailing empty element is the
    * trailing-delimiter artifact and is filtered like the reference does).
    */
  def lines(df: DataFrame, source: String, target: String = "line",
            delimiter: String = "\n"): DataFrame = {
    val parts = split(col(source), java.util.regex.Pattern.quote(delimiter), -1)
    // strip the empty tail produced by a trailing delimiter, keep inner empties
    val trimmed = when(element_at(parts, -1) === "", slice(parts, lit(1), size(parts) - 1))
      .otherwise(parts)
    df.withColumn(target, explode(trimmed))
  }

  /** Charset-tolerant text decode for binary inputs (reference
    * plugins/codecs/Line.java:53-140: a CharsetDecoder with REPLACE on
    * malformed input and unmappable characters — a bad byte becomes U+FFFD,
    * never an exception). One decoder instance per PARTITION (the
    * reference's per-stream decoder), iterator-batched like a real codec.
    */
  def decodeLenient(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
                    bytesCol: String, target: String = "text",
                    charset: String = "UTF-8"): DataFrame = {
    import spark.implicits._
    val others = df.columns.filter(_ != bytesCol)
    val decoded = df.select(col(bytesCol).cast("binary"), struct(others.map(col): _*).as("_rest"))
      .as[(Array[Byte], org.apache.spark.sql.Row)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.BINARY,
          org.apache.spark.sql.Encoders.row(
            org.apache.spark.sql.types.StructType(df.schema.filter(_.name != bytesCol)))))
      .mapPartitions { rows =>
        val dec = java.nio.charset.Charset.forName(charset).newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
        rows.map { case (bytes, rest) =>
          val s =
            if (bytes == null) null
            else dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
          (s, rest)
        }
      }(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.row(
          org.apache.spark.sql.types.StructType(df.schema.filter(_.name != bytesCol)))))
      .toDF(target, "_rest")
    others.foldLeft(decoded)((d, c) => d.withColumn(c, col(s"_rest.$c"))).drop("_rest")
  }

  /** json_lines codec: one JSON document per line -> one parsed event per
    * line (line framing + json codec composed, like the reference).
    */
  def jsonLines(df: DataFrame, source: String, schemaDdl: String,
                target: String = "parsed", delimiter: String = "\n"): DataFrame =
    lines(df, source, "_jl_line", delimiter)
      .withColumn(target,
        from_json(col("_jl_line"), org.apache.spark.sql.types.DataType.fromDDL(schemaDdl)))
      .drop("_jl_line")

  /** multiline codec: reassemble continuation lines into their head line's
    * event (reference multiline codec `what => previous` mode: a line
    * matching the continuation predicate belongs to the previous event).
    *
    * One window pass assigns group ids (running count of head lines per
    * stream), one grouped aggregation reassembles — both shuffle on the
    * stream key, the natural partitioning; reassembly order inside a group
    * is pinned by `orderCol` via sorted structs, not collect order.
    *
    * Parallelism contract: reassembly is inherently sequential PER STREAM
    * (the reference's multiline codec is likewise single-threaded per
    * stream), so parallelism = number of distinct `streamCol` values. A
    * corpus that is one giant stream serializes onto one reducer — shard
    * the input into multiple streams (per file/source) before reassembly.
    */
  /** json codec's top-level-array fan-out (Event.fromJson, Event.java:302-340):
    * a message that is a JSON ARRAY becomes 1..n events, one per element; an
    * object stays one event. Dual-parse resolves the shape per row — `from_json`
    * with the array schema yields null on an object and vice versa — then one
    * explode fans out. Narrow and codegen'd: no shuffle, no driver round-trip.
    */
  def jsonFanout(df: DataFrame, source: String, schemaDdl: String,
                 target: String = "parsed"): DataFrame = {
    val elem = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
    val arr = from_json(col(source), org.apache.spark.sql.types.ArrayType(elem))
    val one = from_json(col(source), elem)
    df.withColumn(target,
      explode(when(arr.isNotNull, arr).otherwise(array(one))))
  }

  /** multiline codec from its CONFIG surface (reference options pattern/
    * negate/what): a line whose pattern match (xor `negate`) marks it a
    * multiline member is attached to the PREVIOUS event
    * (`what => "previous"`) or the NEXT event (`what => "next"`).
    * `previous` lowers directly onto [[multiline]]; `next` marks a head as
    * any line whose predecessor (in `orderCol` order per stream) was not a
    * matcher — one lag over the SAME window partitioning, so both modes
    * cost a single exchange on the stream key.
    */
  def multilineConfig(df: DataFrame, lineCol: String, orderCol: String,
                      streamCol: String, pattern: String, negate: Boolean,
                      what: String, maxLines: Int = Int.MaxValue,
                      maxBytes: Long = Long.MaxValue): DataFrame = {
    val mm = col(lineCol).rlike(pattern)
    val matched = if (negate) !mm else mm
    what match {
      case "previous" =>
        multiline(df, lineCol, orderCol, streamCol, matched, maxLines, maxBytes)
      case "next" =>
        val w = Window.partitionBy(col(streamCol)).orderBy(col(orderCol))
        val withPrev = df.withColumn("_ml_prev",
          coalesce(lag(matched, 1).over(w), lit(false)))
        multiline(withPrev, lineCol, orderCol, streamCol, col("_ml_prev"),
          maxLines, maxBytes)
      case other => throw new IllegalArgumentException(
        s"multiline codec: what => `$other` (expected previous|next)")
    }
  }

  /** `maxLines`/`maxBytes` bound the reassembly buffer (the reference
    * codec's max_lines=500 / max_bytes="10 MiB" defaults): a continuation
    * run exceeding a cap is FLUSHED as its own piece tagged `ml_capped`
    * (the reference's multiline_codec_max_lines_reached) and a fresh buffer
    * continues the group — pieces share the original `event_group`, the
    * final piece (which ended naturally) is untagged. Memory contract: no
    * collect_list group ever exceeds maxLines rows / ~maxBytes bytes (the
    * byte cap splits at cumulative-byte multiples — each piece is bounded
    * by maxBytes plus one line, the bounded-memory point of the cap; the
    * reference's strictly-greedy flush boundary may place a boundary line
    * one piece earlier).
    */
  def multiline(df: DataFrame, lineCol: String, orderCol: String,
                streamCol: String, isContinuation: Column,
                maxLines: Int = Int.MaxValue,
                maxBytes: Long = Long.MaxValue): DataFrame = {
    val w = Window.partitionBy(col(streamCol)).orderBy(col(orderCol))
    val grouped = df
      .withColumn("_head", when(isContinuation, lit(0)).otherwise(lit(1)))
      .withColumn("event_group", sum(col("_head")).over(w))
    val noCaps = maxLines == Int.MaxValue && maxBytes == Long.MaxValue
    val sub =
      if (noCaps) grouped.withColumn("_sub", lit(0L))
      else {
        // same (stream) partitioning as the group window; the sub-window
        // re-sorts within groups but adds no exchange
        val wg = Window.partitionBy(col(streamCol), col("event_group"))
          .orderBy(col(orderCol))
        val rn = row_number().over(wg)
        val cumExcl = coalesce(
          sum(length(col(lineCol)).cast("long") + 1)
            .over(wg.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L))
        grouped.withColumn("_sub",
          floor((rn - 1).cast("long") / maxLines) * 1000000L +
            floor(cumExcl / maxBytes))
      }
    val pieces = sub
      .groupBy(col(streamCol), col("event_group"), col("_sub"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col(orderCol).as("o"), col(lineCol).as("l")))),
            s => s.getField("l")),
          "\n").as("msg"),
        count(lit(1)).as("n_lines"))
    if (noCaps) pieces.drop("_sub")
    else {
      // every piece flushed BY a cap is tagged; only the group's final piece
      // ended naturally. Piece-cardinality window — tiny at any input size.
      val wp = Window.partitionBy(col(streamCol), col("event_group"))
      pieces
        .withColumn("ml_capped", col("_sub") =!= max(col("_sub")).over(wp))
        .drop("_sub")
    }
  }

  /** `es_bulk` codec (logstash-codec-es_bulk): decode the PUBLIC
    * Elasticsearch bulk wire format — alternating action-metadata lines
    * (`{"index":{"_index":i,"_id":x}}` / create / update / delete) and
    * source lines, where delete actions carry no source line. One event per
    * source line with its action metadata joined on (`action`,
    * `bulk_index`, `bulk_id`), plus one tombstone event per delete. Source
    * lines with no preceding action line tag `_es_bulk_orphan`.
    *
    * Pairing = one `lag` over the per-stream byte-offset order — the same
    * sequential-stream contract as the multiline codec (a single bulk
    * stream is inherently ordered; scale comes from many concurrent
    * streams, each a window partition). Action detection is STRICT: exactly
    * one top-level key, and that key an action verb — plus a one-step
    * positional correction (an action-shaped line directly after a
    * non-delete action line is that action's source doc). The reference
    * codec parses sequentially per connection and resolves arbitrarily
    * nested ambiguity; the residue here is a source doc whose ONLY
    * top-level key is an action verb appearing in an alternating run —
    * swap in a per-stream mapPartitions scan if a corpus ever hits it.
    */
  def esBulk(df: DataFrame, lineCol: String = "message",
             orderCol: String = "offset", streamCol: String = "_stream"): DataFrame = {
    import org.apache.spark.sql.types._
    val metaS = StructType(Seq(StructField("_index", StringType),
      StructField("_id", StringType)))
    val actions = Seq("index", "create", "update", "delete")
    val actS = StructType(actions.map(a => StructField(a, metaS)))
    val w = Window.partitionBy(col(streamCol)).orderBy(col(orderCol))
    val keys = json_object_keys(col(lineCol))
    val strictAction = coalesce(
      size(keys) === 1 && element_at(keys, 1).isin(actions: _*), lit(false))
    val parsed = df.withColumn("_act",
      when(strictAction, from_json(col(lineCol), actS)))
    val actName = actions.foldRight(lit(null).cast("string")) { (a, acc) =>
      when(col(s"_act.$a").isNotNull, lit(a)).otherwise(acc)
    }
    val meta = coalesce(actions.map(a => col(s"_act.$a")): _*)
    val staged = parsed
      .withColumn("_action", actName)
      .withColumn("_meta", meta)
      // an action line is consumed as metadata UNLESS the previous line was
      // a non-delete action (then this line is that action's source doc,
      // whatever it looks like — the positional rule above)
      .withColumn("_prev_action", lag(col("_action"), 1).over(w))
      .withColumn("_is_meta", col("_action").isNotNull &&
        (coalesce(lag(col("_action"), 1).over(w), lit("delete")) === "delete" ||
          lag(col("_action"), 1).over(w).isNull))
      .withColumn("_prev_meta", lag(col("_meta"), 1).over(w))
      .withColumn("_prev_is_meta", coalesce(lag(col("_is_meta"), 1).over(w), lit(false)))
    val hasMeta = col("_prev_is_meta") && col("_prev_action") =!= "delete"
    val docs = staged.filter(!col("_is_meta"))
      .select(
        when(hasMeta, col("_prev_action")).as("action"),
        when(hasMeta, col("_prev_meta").getField("_index")).as("bulk_index"),
        when(hasMeta, col("_prev_meta").getField("_id")).as("bulk_id"),
        col(lineCol).as("message"),
        when(!hasMeta, array(lit("_es_bulk_orphan")))
          .otherwise(array().cast("array<string>")).as("tags"))
    val deletes = staged.filter(col("_is_meta") && col("_action") === "delete")
      .select(lit("delete").as("action"),
        col("_meta").getField("_index").as("bulk_index"),
        col("_meta").getField("_id").as("bulk_id"),
        lit(null).cast("string").as("message"),
        array().cast("array<string>").as("tags"))
    docs.unionByName(deletes)
  }

  /** CEF codec — encode (logstash-codec-cef encode path): render one
    * ArcSight Common Event Format line per event,
    * `CEF:0|vendor|product|deviceVersion|signatureId|name|severity|k=v ...`.
    * Header values escape `\` then `|` (the published CEF escaping order);
    * extension values escape `\`, `=`, and literal newlines as `\n`/`\r`.
    * Pure codegen'd string concat — no UDF.
    */
  def cefEncode(vendor: Column, product: Column, deviceVersion: Column,
                signature: Column, name: Column, severity: Column,
                ext: Seq[(String, Column)]): Column = {
    def hdr(c: Column): Column =
      replace(replace(c.cast("string"), lit("\\"), lit("\\\\")), lit("|"), lit("\\|"))
    def extv(c: Column): Column =
      replace(replace(replace(replace(c.cast("string"),
        lit("\\"), lit("\\\\")),
        lit("="), lit("\\=")),
        lit("\n"), lit("\\n")),
        lit("\r"), lit("\\r"))
    val extStr = concat_ws(" ",
      ext.map { case (k, v) => concat(lit(k + "="), extv(v)) }: _*)
    concat(lit("CEF:0|"),
      concat_ws("|", hdr(vendor), hdr(product), hdr(deviceVersion),
        hdr(signature), hdr(name), hdr(severity)),
      lit("|"), extStr)
  }

  /** CEF codec — decode. The seven header fields split on UNESCAPED pipes;
    * the extension is `key=value` pairs where values may contain spaces (a
    * value runs until the next `key=` token — the published CEF extension
    * grammar). RE2-class engines (and DuckDB's oracle) have no lookbehind,
    * so escape handling is sentinel-substitution instead of regex: `\\` and
    * `\|`/`\=` swap to control characters, the split runs on bare
    * delimiters, and each piece restores its sentinels. Pair recovery from
    * the `=`-split is positional: segment j carries value_j plus the NEXT
    * pair's key as its trailing token — one `transform` over the segment
    * array peels both, no per-row parser loop.
    *
    * Output columns: `cef_version, cef_vendor, cef_product,
    * cef_device_version, cef_signature, cef_name, cef_severity,
    * cef_ext` (map) plus `_cefparsefailure` in `tags` when the line has no
    * `CEF:` marker. A syslog prefix before `CEF:` lands in `cef_prefix`.
    */
  def cefDecode(df: DataFrame, source: String): DataFrame = {
    val B = "\u0001" // escaped backslash sentinel
    val P = "\u0002" // escaped pipe sentinel
    val E = "\u0003" // escaped equals sentinel
    val pos = locate("CEF:", col(source))
    val ok = pos > 0
    // prefix = chars before the marker, rest = after "CEF:"
    val pre = when(pos > 1, trim(expr(s"substring($source, 1, locate('CEF:', $source) - 1)")))
    val rest = expr(s"substring($source, locate('CEF:', $source) + 4)")
    val masked = replace(replace(rest, lit("\\\\"), lit(B)), lit("\\|"), lit(P))
    val parts = split(masked, java.util.regex.Pattern.quote("|"), 8)
    def hdr(i: Int): Column =
      replace(replace(try_element_at(parts, lit(i)), lit(P), lit("|")), lit(B), lit("\\"))
    val extRaw = when(size(parts) >= 8, try_element_at(parts, lit(8)))
    val extMasked = replace(extRaw, lit("\\="), lit(E))
    val segs = split(extMasked, "=", -1)
    val n = size(segs)
    def unesc(c: Column): Column =
      replace(replace(replace(replace(c,
        lit(E), lit("=")),
        lit("\\n"), lit("\n")),
        lit("\\r"), lit("\r")),
        lit(B), lit("\\"))
    val entries = transform(sequence(lit(1), n - 1), j =>
      struct(
        regexp_extract(element_at(segs, j), "(\\S+)\\s*$", 1).as("key"),
        unesc(when(j < n - 1,
          regexp_replace(element_at(segs, j + 1), "\\s+\\S+$", ""))
          .otherwise(element_at(segs, j + 1))).as("value")))
    val extMap = when(ok && extRaw.isNotNull && trim(extRaw) =!= "" && n >= 2,
      map_from_entries(entries))
    df.withColumn("cef_prefix", when(ok, pre))
      .withColumn("cef_version", when(ok, hdr(1)).cast("int"))
      .withColumn("cef_vendor", when(ok, hdr(2)))
      .withColumn("cef_product", when(ok, hdr(3)))
      .withColumn("cef_device_version", when(ok, hdr(4)))
      .withColumn("cef_signature", when(ok, hdr(5)))
      .withColumn("cef_name", when(ok, hdr(6)))
      .withColumn("cef_severity", when(ok, hdr(7)))
      .withColumn("cef_ext", extMap)
      .withColumn("tags", when(ok, array().cast("array<string>"))
        .otherwise(array(lit("_cefparsefailure"))))
  }

  /** graphite codec — decode (logstash-codec-graphite decode path): each
    * line is `metric value timestamp`, split on whitespace runs; the decoded
    * event carries the metric name, its numeric value, and `@timestamp`
    * taken from the epoch field. Value/timestamp parse with Ruby's
    * `to_f`/`to_i` semantics (longest numeric PREFIX, 0 for garbage) so
    * lines like `cpu.load 1.5e2x 170abc` decode the way the reference does.
    * Lines without three fields tag `_graphiteparsefailure` (the reference
    * raises per-line; a columnar engine tags and carries on). The reference
    * sets the metric as a dynamic FIELD NAME (`event.set(name, value)`);
    * per-row schemas don't exist in a columnar engine, so the same
    * information lands as the (`metric`, `value`) pair plus a one-entry
    * `metrics` map for map-typed consumers. Pure codegen'd split/extract —
    * no UDF, streams as-is.
    */
  def graphiteDecode(df: DataFrame, source: String): DataFrame = {
    // Ruby String#to_f / #to_i: parse the longest leading numeric prefix
    // (after optional whitespace), 0 when there is none (regexp_extract
    // yields "" on no-match — nullif before the ANSI cast)
    def rubyToF(c: Column): Column = coalesce(
      nullif(regexp_extract(c, "^\\s*[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?", 0),
        lit("")).cast("double"), lit(0.0))
    def rubyToI(c: Column): Column = coalesce(
      nullif(regexp_extract(c, "^\\s*[+-]?\\d+", 0), lit("")).cast("long"), lit(0L))
    val toks = split(trim(col(source)), "\\s+")
    val ok = size(toks) === 3
    val metric = when(ok, try_element_at(toks, lit(1)))
    val value = when(ok, rubyToF(try_element_at(toks, lit(2))))
    val ts = when(ok, timestamp_seconds(rubyToI(try_element_at(toks, lit(3)))))
    df.withColumn("metric", metric)
      .withColumn("value", value)
      .withColumn("@timestamp", ts)
      .withColumn("metrics", when(ok, map(metric, value)))
      .withColumn("tags", when(ok, array().cast("array<string>"))
        .otherwise(array(lit("_graphiteparsefailure"))))
  }

  private val msgpackUnpackAll = udf((b: Array[Byte]) =>
    if (b == null) Seq.empty[String] else Msgpack.toJsonAll(b))
  private val msgpackPack = udf((s: String) =>
    if (s == null) null else Msgpack.fromJson(s))
  private val fluentUnpack = udf((b: Array[Byte]) =>
    if (b == null) Seq.empty[(String, Long, String)] else Msgpack.fluentEvents(b))

  /** msgpack codec (logstash-codec-msgpack): a binary payload holds one or
    * more CONSECUTIVE packed objects (self-delimiting — the wire form is one
    * pack per event, no outer framing); each unpacks to an event whose
    * fields follow the caller's schema. The binary seam is a narrow
    * bytes->JSON transcode ([[Msgpack.toJsonAll]]); the typed work stays on
    * codegen'd `from_json`, exactly like the schema'd json codec.
    */
  def msgpackDecode(df: DataFrame, source: String, schemaDdl: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
    val rest = df.columns.filter(_ != source).map(col).toSeq
    df.withColumn("_mp", explode(msgpackUnpackAll(col(source))))
      .select(rest :+ from_json(col("_mp"), schema).as("_ev"): _*)
      .select(rest :+ col("_ev.*"): _*)
  }

  /** msgpack codec — encode: pack the given columns as one msgpack map per
    * event (through `to_json` with nulls KEPT — the reference packs nil
    * values, not absent keys).
    */
  def msgpackEncode(cols: Seq[(String, Column)]): Column =
    msgpackPack(to_json(
      struct(cols.map { case (n, c) => c.as(n) }: _*),
      java.util.Map.of("ignoreNullFields", "false")))

  /** fluent codec (logstash-codec-fluent; Fluentd forward protocol, public
    * spec): each packed object is `[tag, time, record]` (Message mode),
    * `[tag, [[time, record], ...]]` (Forward mode), or `[tag, <packed
    * entries as bin>]` (PackedForward). Events carry `fl_tag`,
    * `fl_epoch`, and the record fields per the caller's schema.
    */
  def fluentDecode(df: DataFrame, source: String, schemaDdl: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
    val rest = df.columns.filter(_ != source).map(col).toSeq
    df.withColumn("_fl", explode(fluentUnpack(col(source))))
      .select(rest ++ Seq(col("_fl._1").as("fl_tag"), col("_fl._2").as("fl_epoch"),
        from_json(col("_fl._3"), schema).as("_ev")): _*)
      .select(rest ++ Seq(col("fl_tag"), col("fl_epoch")) :+ col("_ev.*"): _*)
  }

  private val avroUnpackAll = udf((b: Array[Byte], schemaJson: String) =>
    if (b == null) Seq.empty[String] else AvroCodec.toJsonAll(b, schemaJson))
  private val avroPack = udf((s: String, schemaJson: String) =>
    if (s == null) null else AvroCodec.fromJson(s, schemaJson))

  /** avro codec — decode consecutive raw binary datums against the given
    * avro schema; the Spark-side schema derives from the SAME avro schema
    * ([[AvroCodec.ddlFor]]), so there is one source of truth.
    */
  def avroDecode(df: DataFrame, source: String, avroSchemaJson: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      AvroCodec.ddlFor(avroSchemaJson))
    val rest = df.columns.filter(_ != source).map(col).toSeq
    df.withColumn("_av", explode(avroUnpackAll(col(source), lit(avroSchemaJson))))
      .select(rest :+ from_json(col("_av"), schema).as("_ev"): _*)
      .select(rest :+ col("_ev.*"): _*)
  }

  /** avro codec — encode the given columns as one binary datum per event
    * (schema field order; union-free schemas, see [[AvroCodec.fromJson]]).
    */
  def avroEncode(cols: Seq[(String, Column)], avroSchemaJson: String): Column =
    avroPack(to_json(
      struct(cols.map { case (n, c) => c.as(n) }: _*),
      java.util.Map.of("ignoreNullFields", "false")), lit(avroSchemaJson))

  private val ednToJson = udf((s: String) => if (s == null) null else Edn.toJson(s))

  /** edn / edn_lines codec — decode (logstash-codec-edn_lines): each line is
    * one EDN value; [[Edn.toJson]] transcodes at the ingest boundary and the
    * typed work stays on schema'd `from_json` (same contract as the json /
    * msgpack codecs — no inference scan).
    */
  def ednLines(df: DataFrame, source: String, schemaDdl: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
    val rest = df.columns.filter(_ != source).map(col).toSeq
    df.select(rest :+ from_json(ednToJson(col(source)), schema).as("_ev"): _*)
      .select(rest :+ col("_ev.*"): _*)
  }

  /** edn codec — encode: render the given columns as one EDN map per event,
    * `{:key value ...}` with keyword keys. Strings quote with \\ \" \n \t \r
    * escapes; numerics/booleans bare; NULL renders nil; timestamps as
    * `#inst "ISO8601"` tagged elements; string arrays as vectors. The whole
    * render folds into one codegen'd concat — no per-row formatter.
    */
  def ednEncode(df: DataFrame, cols: Seq[String] = Nil): Column = {
    import org.apache.spark.sql.types._
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    def esc(c: Column): Column =
      replace(replace(replace(replace(replace(c,
        lit("\\"), lit("\\\\")),
        lit("\""), lit("\\\"")),
        lit("\n"), lit("\\n")),
        lit("\r"), lit("\\r")),
        lit("\t"), lit("\\t"))
    def quoted(c: Column): Column = concat(lit("\""), esc(c), lit("\""))
    def render(n: String): Column = df.schema(n).dataType match {
      case StringType => quoted(col(n))
      case _: TimestampType | _: TimestampNTZType =>
        concat(lit("#inst \""), date_format(col(n), "yyyy-MM-dd'T'HH:mm:ss.SSS"),
          lit("Z\""))
      case ArrayType(StringType, _) =>
        concat(lit("["), array_join(transform(col(n), quoted _), " ", "nil"), lit("]"))
      case _ => col(n).cast("string")
    }
    val pairs = names.map(n =>
      concat(lit(":" + n + " "), coalesce(render(n), lit("nil"))))
    concat(lit("{"), concat_ws(" ", pairs: _*), lit("}"))
  }

  /** rubydebug codec (reference logstash-codec-rubydebug: the stdout
    * output's DEFAULT codec — awesome_print of the event hash): one pretty
    * `{\n  "key" => value,\n ... \n}` block per event, keys right-aligned so
    * every `=>` lines up (pad = 4 + longest-inspected-key − key). Value
    * rendering follows Ruby inspect: strings double-quoted with \\, \",
    * \n, \r, \t escaped; numerics/booleans bare; nil for NULL; timestamps
    * as unquoted ISO8601 with milliseconds and a Z (the LogStash::Timestamp
    * print form); string arrays as ["a", "b"].
    *
    * The schema is static, so key widths fold at PLAN time and the whole
    * render is one codegen'd concat — no per-row reflection like the
    * reference's Ruby formatter.
    */
  def rubydebug(df: DataFrame, cols: Seq[String] = Nil): Column = {
    import org.apache.spark.sql.types._
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val maxw = names.map(_.length + 2).max
    def rubyEscape(c: Column): Column =
      replace(replace(replace(replace(replace(c,
        lit("\\"), lit("\\\\")),
        lit("\""), lit("\\\"")),
        lit("\n"), lit("\\n")),
        lit("\r"), lit("\\r")),
        lit("\t"), lit("\\t"))
    def quoted(c: Column): Column = concat(lit("\""), rubyEscape(c), lit("\""))
    def render(n: String): Column = df.schema(n).dataType match {
      case StringType => quoted(col(n))
      case _: TimestampType | _: TimestampNTZType =>
        concat(date_format(col(n), "yyyy-MM-dd'T'HH:mm:ss.SSS"), lit("Z"))
      case ArrayType(StringType, _) =>
        concat(lit("["),
          array_join(transform(col(n), quoted _), ", ", "nil"), lit("]"))
      case _ => col(n).cast("string")
    }
    val lines = names.map { n =>
      val pad = " " * (4 + maxw - (n.length + 2))
      concat(lit(pad + "\"" + n + "\" => "), coalesce(render(n), lit("nil")))
    }
    concat(lit("{\n"), concat_ws(",\n", lines: _*), lit("\n}"))
  }
}
