package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Tok

/** Parse-stage operators: Logstash's filter plugins re-expressed as Catalyst
  * column expressions (SURVEY.md §2.2). All of these are narrow, codegen'd
  * transforms — no shuffle, no UDF — so they scale linearly with input splits.
  */
object Parse {

  // ------------------------------------------------------------------
  // dissect — positional splitting. Over token arrays the delimiter role is
  // played by a sentinel token id (Tok.DelimId); over strings by a literal
  // separator. Reference: dissect filter, docs/static/transforming-data
  // .asciidoc:249-290 (semantics only; implementation is pure Spark).
  // ------------------------------------------------------------------

  /** Dissect over the pre-tokenized sequence structure
    * `[hdr, sev_tok, src_tok, ..., DELIM, payload...]`:
    * extracts header fields by position and the payload length after the first
    * delimiter token. Rows without the delimiter are tagged `_dissectfailure`
    * (the reference's `_dissectfailure` tag contract).
    */
  def dissectTokens(df: DataFrame,
                    fields: Seq[(String, Int)] = Seq("hdr_tok" -> 1, "sev_tok" -> 2),
                    delimId: Int = Tok.DelimId): DataFrame = {
    val withFields = fields.foldLeft(df) { case (d, (name, pos)) =>
      d.withColumn(name, element_at(col("tokens"), pos))
    }
    withFields
      .withColumn("delim_pos", array_position(col("tokens"), delimId).cast("int"))
      .withColumn("payload_len",
        when(col("delim_pos") > 0, col("n_tok") - col("delim_pos")).otherwise(lit(0)))
      .withColumn("tags",
        when(col("delim_pos") === 0, array(lit("_dissectfailure")))
          .otherwise(array().cast("array<string>")))
  }

  /** Severity decode from the planted severity token (tokens[1] mod 3),
    * the token-array analogue of grok's %{LOGLEVEL:severity}.
    */
  def severity(tokens: Column): Column = {
    val m = element_at(tokens, 1) % 3
    when(m === 0, "INFO").when(m === 1, "WARN").otherwise("ERROR")
  }

  /** String-side dissect: `%{a} %{b} %{rest}`-style positional split.
    * Name forms follow the reference dissect key syntax: `_` (or empty) is a
    * skip key (`%{}`), a `+`-prefixed name is an append key (`%{+ts}` —
    * value joined onto the existing field with the separator).
    */
  def dissectString(df: DataFrame, source: String, sep: String, names: Seq[String]): DataFrame = {
    val parts = split(col(source), java.util.regex.Pattern.quote(sep))
    names.zipWithIndex.foldLeft(df) { case (d, (n, i)) =>
      val part = element_at(parts, i + 1)
      if (n == "_" || n.isEmpty) d
      else if (n.startsWith("+")) {
        val base = n.drop(1)
        d.withColumn(base,
          if (d.columns.contains(base)) concat_ws(sep, col(base), part) else part)
      }
      else d.withColumn(n, part)
    }
  }

  // ------------------------------------------------------------------
  // grok — named-pattern regex extraction with type coercion and
  // _grokparsefailure tagging. Pattern library is a small public subset of the
  // stock grok patterns; compilation expands %{NAME:field:type} into plain
  // Java-regex groups extracted per-field with regexp_extract (codegen'd).
  // ------------------------------------------------------------------

  val GrokPatterns: Map[String, String] = Map(
    "WORD" -> "\\w+",
    "NOTSPACE" -> "\\S+",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "INT" -> "[+-]?\\d+",
    "POSINT" -> "[1-9]\\d*",
    "NONNEGINT" -> "\\d+",
    "NUMBER" -> "[+-]?\\d+(?:\\.\\d+)?",
    "BASE10NUM" -> "[+-]?(?:\\d+(?:\\.\\d+)?|\\.\\d+)",
    "BASE16NUM" -> "(?:0[xX])?[0-9a-fA-F]+",
    "IP" -> "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}",
    "HOSTNAME" -> "[a-zA-Z0-9](?:[a-zA-Z0-9_-]*[a-zA-Z0-9])?(?:\\.[a-zA-Z0-9](?:[a-zA-Z0-9_-]*[a-zA-Z0-9])?)*",
    "IPORHOST" -> "(?:\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}|[a-zA-Z0-9][a-zA-Z0-9._-]*)",
    "USERNAME" -> "[a-zA-Z0-9._-]+",
    "USER" -> "[a-zA-Z0-9._-]+",
    "EMAILADDRESS" -> "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+",
    "UUID" -> "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "MAC" -> "(?:[0-9a-fA-F]{2}[:-]){5}[0-9a-fA-F]{2}",
    "QUOTEDSTRING" -> "\"[^\"]*\"|'[^']*'",
    "QS" -> "\"[^\"]*\"|'[^']*'", // stock alias for QUOTEDSTRING
    "URIPATH" -> "(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%_&-]*)+",
    "PROG" -> "[a-zA-Z0-9._/%-]+",
    "SYSLOGTIMESTAMP" -> "[A-Z][a-z]{2} +\\d{1,2} \\d{2}:\\d{2}:\\d{2}",
    "HTTPDATE" -> "\\d{2}/[A-Z][a-z]{2}/\\d{4}:\\d{2}:\\d{2}:\\d{2} [+-]\\d{4}",
    "LOGLEVEL" -> "INFO|WARN|ERROR|DEBUG|TRACE|FATAL",
    "TIMESTAMP_ISO8601" -> "\\d{4}-\\d{2}-\\d{2}[T ]\\d{2}:\\d{2}:\\d{2}(?:\\.\\d+)?")

  final case class GrokField(name: String, group: Int, typ: Option[String])
  final case class GrokSpec(regex: String, fields: Seq[GrokField])

  private val GrokRef = "%\\{(\\w+)(?::(\\w+))?(?::(int|float))?\\}".r

  /** Expand a grok pattern into (full regex, capture fields). Named refs
    * without a field name match but don't capture.
    *
    * Grok patterns ARE regexes in the reference (Grok.java compiles the
    * expanded pattern with joni) — text between %{...} refs passes through
    * RAW, so users can embed alternations/classes (e.g. the stock
    * `(?:-|%{NUMBER:bytes})` in COMBINEDAPACHELOG) and must escape literal
    * metacharacters (`\[`), exactly as in stock grok configs. Because our
    * kernel captures by GROUP INDEX, user-written capturing groups in the
    * raw segments are rewritten to non-capturing so field group numbers
    * stay stable.
    */
  def compileGrok(pattern: String): GrokSpec = {
    // `(` not followed by `?` and not escaped -> `(?:` (neutralize user
    // capture groups; named %{} refs provide the captures)
    def neutralize(seg: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < seg.length) {
        val c = seg.charAt(i)
        if (c == '\\' && i + 1 < seg.length) { sb.append(c).append(seg.charAt(i + 1)); i += 2 }
        else if (c == '(' && (i + 1 >= seg.length || seg.charAt(i + 1) != '?')) {
          sb.append("(?:"); i += 1
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
    val sb = new StringBuilder
    val fields = Seq.newBuilder[GrokField]
    var last = 0
    var group = 0
    for (m <- GrokRef.findAllMatchIn(pattern)) {
      sb.append(neutralize(pattern.substring(last, m.start)))
      val base = GrokPatterns.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"unknown grok pattern %{${m.group(1)}}"))
      Option(m.group(2)) match {
        case Some(fieldName) =>
          group += 1
          sb.append(s"($base)")
          fields += GrokField(fieldName, group, Option(m.group(3)))
        case None =>
          sb.append(s"(?:$base)")
      }
      last = m.end
    }
    sb.append(neutralize(pattern.substring(last)))
    GrokSpec(sb.toString, fields.result())
  }

  private def coerce(raw: Column, typ: Option[String]): Column = typ match {
    // a non-participating optional capture (e.g. `(?:-|%{INT:bytes:int})`)
    // surfaces as "" — the reference leaves the field UNSET, so coerce it
    // to null rather than failing the numeric cast
    case Some("int")   => nullif(raw, lit("")).cast("long")
    case Some("float") => nullif(raw, lit("")).cast("double")
    case _             => raw
  }

  /** Apply a grok match to a string column. One-pass: the whole pattern is
    * matched ONCE per row via the RegexExtractStruct kernel (plans/
    * RegexExprs.scala) and every capture read from the resulting struct —
    * vs rlike + one regexp_extract per capture (= k+1 full regex matches).
    * No match (or null input) => null fields + `_grokparsefailure` tag.
    */
  def grok(df: DataFrame, source: String, pattern: String): DataFrame = {
    val spec = compileGrok(pattern)
    if (spec.fields.isEmpty) {
      val matched = coalesce(col(source).rlike(spec.regex), lit(false))
      Mutate.addTagWhen(df, !matched, "_grokparsefailure")
    } else {
      val withG = df.withColumn("_grok_m",
        graft.plans.RegexExprs.extractStruct(col(source), spec.regex, spec.fields.size))
      val withFields = spec.fields.foldLeft(withG) { (d, f) =>
        d.withColumn(f.name, coerce(col("_grok_m").getField(s"g${f.group}"), f.typ))
      }
      Mutate.addTagWhen(withFields, col("_grok_m").isNull, "_grokparsefailure")
        .drop("_grok_m")
    }
  }

  /** The composed-built-ins grok (rlike + per-capture regexp_extract), kept
    * for cross-checking the one-pass kernel byte-for-byte.
    */
  def grokComposed(df: DataFrame, source: String, pattern: String): DataFrame = {
    val spec = compileGrok(pattern)
    val matched = coalesce(col(source).rlike(spec.regex), lit(false))
    val withFields = spec.fields.foldLeft(df) { case (d, f) =>
      d.withColumn(f.name,
        when(matched, coerce(regexp_extract(col(source), spec.regex, f.group), f.typ)))
    }
    Mutate.addTagWhen(withFields, !matched, "_grokparsefailure")
  }

  /** Multi-pattern grok (reference `match => { field => [p1, p2, ...] }`
    * with default `break_on_match => true`): patterns tried in order, the
    * FIRST match wins and only its captures are applied; `_grokparsefailure`
    * only when none match. One regex pass per pattern (not per capture);
    * the winner logic is a boolean cascade over the match structs.
    */
  def grokMulti(df: DataFrame, source: String, patterns: Seq[String]): DataFrame = {
    val specs = patterns.map(compileGrok)
    val withGs = specs.zipWithIndex.foldLeft(df) { case (d, (s, i)) =>
      d.withColumn(s"_gm_$i",
        graft.plans.RegexExprs.extractStruct(col(source), s.regex, s.fields.size))
    }
    val matches = specs.indices.map(i => col(s"_gm_$i").isNotNull)
    val anyMatch = matches.reduce(_ || _)
    // isWinner(i) = pattern i matches and no earlier pattern does
    val isWinner = matches.zipWithIndex.map { case (m, i) =>
      matches.take(i).foldLeft(m)((acc, prev) => acc && !prev)
    }
    val fieldNames = specs.flatMap(_.fields.map(_.name)).distinct
    val withFields = fieldNames.foldLeft(withGs) { (d, fname) =>
      val cases = specs.zipWithIndex.flatMap { case (s, i) =>
        s.fields.find(_.name == fname).map { f =>
          when(isWinner(i), coerce(col(s"_gm_$i").getField(s"g${f.group}"), f.typ))
        }
      }
      d.withColumn(fname, coalesce(cases: _*))
    }
    Mutate.addTagWhen(withFields, !anyMatch, "_grokparsefailure")
      .drop(specs.indices.map(i => s"_gm_$i"): _*)
  }

  /** useragent filter (lite): browser family + version from a UA string —
    * the reference's useragent enrichment without the external regexes.yaml
    * DB (a fixed family list covers the benchmark-case semantics,
    * tools/benchmark-cli cases/apache.cfg:17-24). No match => empty string,
    * matching regexp_extract's contract on both engines.
    */
  def useragent(df: DataFrame, source: String, prefix: String = "ua"): DataFrame =
    df.withColumn(s"${prefix}_name",
        regexp_extract(col(source), "(Chrome|Firefox|Safari|Edge|curl|bot)", 1))
      .withColumn(s"${prefix}_version",
        regexp_extract(col(source), "(?:Chrome|Firefox|Safari|Edge|curl|bot)/([0-9][0-9.]*)", 1))

  /** One entry of a uap-core-style `regexes.yaml` user-agent database
    * (public format: `user_agent_parsers:` list of `regex` +
    * optional `family_replacement` / `v1_replacement`).
    */
  final case class UaParser(regex: String,
                            familyReplacement: Option[String] = None,
                            v1Replacement: Option[String] = None)

  /** Load the `user_agent_parsers` section of a regexes.yaml-format file
    * (minimal reader for the public format: a top-level key, `- key: value`
    * list items, single/double-quoted values). Declaration order preserved —
    * the UA database is first-match-wins.
    */
  def uaParsersFromYaml(path: String): Seq[UaParser] = {
    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
        t.substring(1, t.length - 1)
      else t
    }
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try {
      val out = Seq.newBuilder[UaParser]
      var inSection = false
      var cur: Option[UaParser] = None
      for (raw <- src.getLines(); if raw.trim.nonEmpty && !raw.trim.startsWith("#")) {
        val line = raw.replaceAll("\\s+$", "")
        if (!line.startsWith(" ") && !line.startsWith("-")) {
          cur.foreach(out += _); cur = None
          inSection = line.trim == "user_agent_parsers:"
        } else if (inSection) {
          val t = line.trim
          val (isNew, body) = if (t.startsWith("- ")) (true, t.substring(2)) else (false, t)
          if (isNew) { cur.foreach(out += _); cur = Some(UaParser("")) }
          val i = body.indexOf(':')
          if (i > 0 && cur.isDefined) {
            val (k, v) = (body.substring(0, i).trim, unquote(body.substring(i + 1)))
            cur = cur.map { p =>
              k match {
                case "regex" => p.copy(regex = v)
                case "family_replacement" => p.copy(familyReplacement = Some(v))
                case "v1_replacement" => p.copy(v1Replacement = Some(v))
                case _ => p
              }
            }
          }
        }
      }
      cur.foreach(out += _)
      out.result().filter(_.regex.nonEmpty)
    } finally src.close()
  }

  /** useragent filter over a parser database: FIRST matching parser wins
    * (the uap contract); family = family_replacement or capture group 1,
    * major version = v1_replacement or capture group 2. No match => empty
    * strings (regexp_extract's miss contract, same as [[useragent]]).
    */
  def useragentWith(df: DataFrame, source: String, parsers: Seq[UaParser],
                    prefix: String = "ua"): DataFrame = {
    val src = col(source)
    def firstMatch(render: UaParser => Column): Column =
      parsers.foldRight(lit(""): Column) { (p, acc) =>
        when(src.rlike(p.regex), render(p)).otherwise(acc)
      }
    df.withColumn(s"${prefix}_family", firstMatch(p =>
        p.familyReplacement.map(lit(_): Column)
          .getOrElse(regexp_extract(src, p.regex, 1))))
      .withColumn(s"${prefix}_major", firstMatch(p =>
        p.v1Replacement.map(lit(_): Column)
          .getOrElse(regexp_extract(src, p.regex,
            if (p.familyReplacement.isDefined) 1 else 2))))
  }

  // ------------------------------------------------------------------
  // kv / json / csv / date
  // ------------------------------------------------------------------

  /** kv filter: `k=v` pairs -> MapType column. */
  def kv(df: DataFrame, source: String, target: String,
         pairSep: String = " ", kvSep: String = "="): DataFrame =
    df.withColumn(target, str_to_map(col(source), lit(pairSep), lit(kvSep)))

  /** json filter: parse a JSON string field into a struct target. */
  def json(df: DataFrame, source: String, target: String, schemaDdl: String): DataFrame =
    df.withColumn(target,
      from_json(col(source), org.apache.spark.sql.types.DataType.fromDDL(schemaDdl)))

  /** csv filter: positional parse with column names. */
  def csv(df: DataFrame, source: String, names: Seq[String], sep: String = ","): DataFrame =
    dissectString(df, source, sep, names)

  /** date filter: try formats in order, first success wins; failure =>
    * `_dateparsefailure` tag (reference date-filter contract).
    */
  def date(df: DataFrame, source: String, target: String, formats: Seq[String]): DataFrame = {
    val parsed = coalesce(formats.map(f => try_to_timestamp(col(source), lit(f))): _*)
    val out = df.withColumn(target, parsed)
    Mutate.addTagWhen(out, parsed.isNull && col(source).isNotNull, "_dateparsefailure")
  }
}
