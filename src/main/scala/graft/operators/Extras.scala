package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StringType, StructType}

/** Ecosystem filter plugins beyond the default bundle — bytes, range,
  * extractnumbers, tld, json_encode, metricize, age, cipher (reference:
  * the logstash-filter-* gems, public plugin docs; the default bundle is
  * enumerated in `logstash-plugins` metadata referenced from
  * `rakelib/plugins-metadata.json`). All are narrow column expressions or
  * bounded fan-outs — codegen'd, shuffle-free, scale-invariant.
  */
object Extras {

  private val bytesPat = "^\\s*(-?\\d+(?:\\.\\d+)?)\\s*([KkMmGgTtPpEe]?)(?:[iI]?[bB])?\\s*$"

  /** bytes filter: parse a human-readable size ("2.5 MiB", "1kb", "123") to
    * a numeric byte count. `binary` multiplies by 1024 per unit step
    * (`conversion_method => "binary"`, the default), metric by 1000; the
    * reference treats "KB" and "KiB" identically under either method.
    * Non-matching strings yield null (callers tag `_bytesparsefailure`).
    * Digit group separators (",") are stripped first.
    */
  def parseBytes(src: Column, binary: Boolean = true): Column = {
    val s = regexp_replace(src, ",", "")
    val num = regexp_extract(s, bytesPat, 1)
    val unit = lower(regexp_extract(s, bytesPat, 2))
    val step = when(unit === "", 0)
      .when(unit === "k", 1).when(unit === "m", 2).when(unit === "g", 3)
      .when(unit === "t", 4).when(unit === "p", 5).otherwise(6)
    val base = if (binary) 1024.0 else 1000.0
    when(num =!= "", num.cast("double") * pow(lit(base), step.cast("double")))
  }

  /** Compact public-suffix subset for two-label TLDs. The reference plugin
    * carries the full publicsuffix.org list; this is the high-traffic
    * subset (full-list parity would be a broadcast lookup of the published
    * file — same plan shape, longer literal).
    */
  val twoPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "co.za", "org.za", "co.in", "net.in", "org.in", "ac.in",
    "com.br", "net.br", "org.br", "com.cn", "net.cn", "org.cn",
    "com.mx", "com.sg", "com.tr", "com.tw", "co.kr", "or.kr")

  /** tld filter: decompose a hostname into
    * struct(tld, sld, trd, domain, subdomain) — e.g. "www.example.co.uk" ->
    * ("co.uk", "example", "www", "example.co.uk", "www.example.co.uk").
    * Labels past the registrable domain collapse into `trd` joined by "."
    * (the reference keeps the full transit domain there too).
    */
  def tldParse(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", try_element_at(labels, lit(-2)), try_element_at(labels, lit(-1)))
    val tldLen = when(n >= 3 && lastTwo.isin(twoPartSuffixes: _*), 2).otherwise(1)
    val tld = when(tldLen === 2, lastTwo).otherwise(try_element_at(labels, lit(-1)))
    val sld = when(n > tldLen,
      when(tldLen === 2, try_element_at(labels, lit(-3)))
        .otherwise(try_element_at(labels, lit(-2))))
    val trdArr = when(n > tldLen + 1, slice(labels, lit(1), (n - tldLen - 1).cast("int")))
    val trd = when(trdArr.isNotNull, array_join(trdArr, "."))
    val domain = when(sld.isNotNull, concat_ws(".", sld, tld))
    val subdomain = when(trd.isNotNull, concat_ws(".", trd, domain))
    struct(tld.as("tld"), sld.as("sld"), trd.as("trd"),
      domain.as("domain"), subdomain.as("subdomain"))
  }

  /** extractnumbers filter: pull every numeric token out of a string field
    * into `int1..intN` (long) and `float1..floatN` (double) columns,
    * 1-indexed in order of appearance. The reference creates exactly as
    * many fields as it finds (schemaless events); a columnar schema is
    * fixed-width, so the bound is explicit (`max_ints`/`max_floats`) and
    * overflow tokens are dropped — documented divergence.
    */
  def extractNumbers(df: DataFrame, source: String,
                     maxInts: Int = 4, maxFloats: Int = 4,
                     gate: Column = lit(true)): DataFrame = {
    val toks = regexp_extract_all(col(source), lit("-?\\d+(?:\\.\\d+)?"), lit(0))
    val withArr = df
      .withColumn("_xn_i", filter(toks, t => !t.contains(".")))
      .withColumn("_xn_f", filter(toks, t => t.contains(".")))
    // gate-unmatched rows keep any PRE-EXISTING intN/floatN values (two
    // conditional extractnumbers over different sources must not null each
    // other's results — the same snapshot contract as every gated filter)
    def gated(d: DataFrame, name: String, v: Column): DataFrame = {
      val cur = if (d.columns.contains(name)) col(name) else lit(null)
      d.withColumn(name, when(gate, v).otherwise(cur))
    }
    val withInts = (1 to maxInts).foldLeft(withArr)((d, i) =>
      gated(d, s"int$i", try_element_at(col("_xn_i"), lit(i)).cast("long")))
    val withFloats = (1 to maxFloats).foldLeft(withInts)((d, i) =>
      gated(d, s"float$i", try_element_at(col("_xn_f"), lit(i)).cast("double")))
    withFloats.drop("_xn_i", "_xn_f")
  }

  /** One range rule: `field` between lo and hi (string fields compare by
    * LENGTH, the reference's string semantics) triggers `action` —
    * `drop`, `tag:<t>`, or `field:<name>:<value>`. `negate` flips the
    * membership test.
    */
  final case class RangeRule(field: String, lo: Double, hi: Double, action: String)

  /** range filter: apply every rule, gated on `m`. Tag/field actions are
    * projections; any `drop` rule filters. Null fields never match
    * (reference: missing field is skipped).
    */
  def rangeApply(df: DataFrame, rules: Seq[RangeRule], negate: Boolean,
                 m: Column): DataFrame =
    rules.foldLeft(df) { (d, r) =>
      val v = d.schema(r.field).dataType match {
        case StringType => length(col(r.field)).cast("double")
        case _ => col(r.field).cast("double")
      }
      val in = v.between(r.lo, r.hi)
      val hit = coalesce(if (negate) !in else in, lit(false)) && m
      r.action match {
        case "drop" => d.filter(!hit)
        case t if t.startsWith("tag:") => Mutate.addTagWhen(d, hit, t.drop(4))
        case f if f.startsWith("field:") =>
          val parts = f.split(":", 3)
          require(parts.length == 3, s"range: bad field action `$f`")
          val cur = if (d.columns.contains(parts(1))) col(parts(1)).cast("string")
                    else lit(null).cast("string")
          d.withColumn(parts(1), when(hit, lit(parts(2))).otherwise(cur))
        case other => throw new IllegalArgumentException(s"range: unknown action `$other`")
      }
    }

  /** json_encode filter: serialize a field to its JSON text. Structs, maps
    * and arrays use the native encoder; strings escape to a JSON string
    * literal; other scalars render via cast. */
  def jsonEncode(df: DataFrame, source: String, target: String,
                 m: Column): DataFrame = {
    val enc: Column = df.schema(source).dataType match {
      case _: StructType | _: MapType | _: ArrayType => to_json(col(source))
      case StringType =>
        // full RFC 8259 escaping (control chars included) by the ENGINE's
        // JSON writer: wrap in a map, serialize, peel the envelope — hand
        // escaping backslash+quote alone emits invalid JSON for \n/\t etc.
        when(col(source).isNotNull,
          regexp_extract(to_json(map(lit("v"), col(source))), "^\\{\"v\":(.*)\\}$", 1))
      case _ => col(source).cast("string")
    }
    val cur = if (df.columns.contains(target) && target != source) col(target)
              else if (target == source) col(source) else lit(null)
    df.withColumn(target, when(m, enc).otherwise(cur))
  }

  /** metricize filter: an event carrying several metric fields fans out to
    * one event per PRESENT metric with `metric`/`value` set and the metric
    * source fields nulled; the original event passes through unchanged
    * unless `drop_original_event`. Bounded fan-out (≤ metrics.size + 1). */
  def metricize(df: DataFrame, metrics: Seq[String], dropOriginal: Boolean,
                m: Column): DataFrame = {
    val names: Seq[Column] = metrics.map(lit(_).cast("string"))
    val orig = lit(null).cast("string")
    val matchedArr = if (dropOriginal) array(names: _*) else array(orig +: names: _*)
    val d1 = df.withColumn("_mz_name", explode(when(m, matchedArr).otherwise(array(orig))))
    val valueOf = metrics.foldLeft(lit(null).cast("double"))((acc, mn) =>
      when(col("_mz_name") === mn, col(mn).cast("double")).otherwise(acc))
    val priorValue = if (df.columns.contains("value")) col("value").cast("double")
                     else lit(null).cast("double")
    val d2 = d1
      .filter(col("_mz_name").isNull || valueOf.isNotNull)
      .withColumn("metric", col("_mz_name"))
      // split rows carry the metric's value; the original keeps its own
      // `value` field untouched (reference leaves the source event as-is)
      .withColumn("value", when(col("_mz_name").isNotNull, valueOf).otherwise(priorValue))
    metrics.foldLeft(d2)((d, mn) =>
      d.withColumn(mn, when(col("_mz_name").isNotNull, lit(null)).otherwise(col(mn))))
      .drop("_mz_name")
  }

  /** age filter: seconds between the event timestamp and `now` (double).
    * The reference reads the wall clock; `nowIso` pins it for deterministic
    * replay — pass None for the live clock. */
  def age(ts: Column, nowIso: Option[String]): Column = {
    val now = nowIso.map(s => to_timestamp(lit(s))).getOrElse(current_timestamp())
    (unix_micros(now) - unix_micros(ts)).cast("double") / 1e6
  }

  private def aesKey(key: String): Array[Byte] = {
    val b = key.getBytes("UTF-8")
    val len = if (b.length <= 16) 16 else if (b.length <= 24) 24 else 32
    java.util.Arrays.copyOf(b, len)
  }

  /** cipher filter (encrypt): AES-CBC/PKCS with a config IV (hex, 16
    * bytes) — deterministic output, base64-encoded like the reference's
    * `base64 => true` default. Spark prepends the IV to the ciphertext;
    * decrypt reads it back from the prefix. */
  def cipherEncrypt(src: Column, key: String, ivHex: String): Column =
    base64(aes_encrypt(src.cast("binary"), lit(aesKey(key)), lit("CBC"),
      lit("PKCS"), to_binary(lit(ivHex), lit("hex"))))

  /** cipher filter (decrypt): inverse of [[cipherEncrypt]]. */
  def cipherDecrypt(src: Column, key: String): Column =
    aes_decrypt(unbase64(src), lit(aesKey(key)), lit("CBC"), lit("PKCS"))
      .cast("string")

  /** i18n filter: strip diacritics (the reference's `transliterate`).
    * Plan-time literal character maps -> one codegen'd `translate` call —
    * the common Latin-1/Latin-Extended accent set; extend the map for
    * wider coverage.
    */
  // generated: every Latin-1 + Latin Extended-A letter whose NFD
  // decomposition starts with an ASCII base letter, plus ß -> s
  private val accented = "ÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝàáâãäåçèéêëìíîïñòóôõöùúûüýÿĀāĂăĄąĆćĈĉĊċČčĎďĒēĔĕĖėĘęĚěĜĝĞğĠġĢģĤĥĨĩĪīĬĭĮįİĴĵĶķĹĺĻļĽľŃńŅņŇňŌōŎŏŐőŔŕŖŗŘřŚśŜŝŞşŠšŢţŤťŨũŪūŬŭŮůŰűŲųŴŵŶŷŸŹźŻżŽžß"
  private val plain    = "AAAAAACEEEEIIIINOOOOOUUUUYaaaaaaceeeeiiiinooooouuuuyyAaAaAaCcCcCcCcDdEeEeEeEeEeGgGgGgGgHhIiIiIiIiIJjKkLlLlLlNnNnNnOoOoOoRrRrRrSsSsSsSsTtTtUuUuUuUuUuUuWwYyYZzZzZzs"

  /** Transliterate accented characters to their ASCII base form. */
  def transliterate(src: Column): Column = {
    require(accented.length == plain.length, "accent map length mismatch")
    translate(src, accented, plain)
  }
}
