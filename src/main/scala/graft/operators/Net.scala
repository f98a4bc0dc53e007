package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small network/syslog transforms (SURVEY.md §2.2 tail: syslog_pri, cidr)
  * as pure column expressions — narrow, codegen'd, shuffle-free.
  */
object Net {

  /** syslog_pri filter: decompose an RFC 3164 PRI value into facility and
    * severity (pri = facility * 8 + severity).
    */
  def syslogSeverity(pri: Column): Column = (pri % 8).cast("int")
  def syslogFacility(pri: Column): Column = (pri / 8).cast("int")

  /** Dotted-quad IPv4 -> unsigned 32-bit value (as long). */
  def ipToLong(ip: Column): Column = {
    val o = split(ip, "\\.")
    (element_at(o, 1).cast("long") * 16777216L +
      element_at(o, 2).cast("long") * 65536L +
      element_at(o, 3).cast("long") * 256L +
      element_at(o, 4).cast("long"))
  }

  /** cidr filter: true when `ip` falls inside the literal `block`
    * ("a.b.c.d/n"). The block is parsed at plan time (it's config, like the
    * reference's `network` option), so the runtime cost is one compare.
    */
  def cidrContains(ip: Column, block: String): Column = {
    val Array(net, bits) = block.split("/")
    val prefix = bits.toInt
    require(prefix >= 0 && prefix <= 32, s"bad prefix in $block")
    val netLong = net.split("\\.").map(_.toLong).reduce(_ * 256 + _)
    if (prefix == 0) lit(true)
    else shiftright(ipToLong(ip), 32 - prefix) === lit(netLong >> (32 - prefix))
  }

  // ---- syslog OUTPUT rendering (RFC 3164 / RFC 5424 line assembly) ----

  /** RFC 3164 facility label -> code (facility * 8 + severity = PRI). The
    * table is the public RFC 3164 §4.1.1 list; `system` is accepted as the
    * common alias for `daemon` (the reference's label set spells it that
    * way: logstash-output-syslog docs, FACILITY_LABELS).
    */
  val FacilityCodes: Map[String, Int] = Map(
    "kernel" -> 0, "user-level" -> 1, "mail" -> 2, "daemon" -> 3,
    "system" -> 3, "security/authorization" -> 4, "syslogd" -> 5,
    "line printer" -> 6, "network news" -> 7, "uucp" -> 8, "clock" -> 9,
    "ftp" -> 11, "ntp" -> 12, "log audit" -> 13, "log alert" -> 14) ++
    (0 to 7).map(i => s"local$i" -> (16 + i)).toMap

  /** RFC 3164 severity label -> code. */
  val SeverityCodes: Map[String, Int] = Map(
    "emergency" -> 0, "alert" -> 1, "critical" -> 2, "error" -> 3,
    "warning" -> 4, "notice" -> 5, "informational" -> 6, "debug" -> 7)

  private def codeOf(rendered: Column, table: Map[String, Int], what: String): Column = {
    val pairs = table.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    val m = map(pairs: _*)
    // numeric strings pass through (the reference accepts raw codes); labels
    // resolve case-insensitively; anything else is a render-time error row
    val resolved = coalesce(try_element_at(m, lower(rendered)),
      rendered.try_cast("int"))
    when(resolved.isNotNull, resolved)
      .otherwise(raise_error(concat(lit(s"syslog output: unknown $what "), rendered)))
  }

  def facilityCode(rendered: Column): Column = codeOf(rendered, FacilityCodes, "facility")
  def severityCode(rendered: Column): Column = codeOf(rendered, SeverityCodes, "severity")

  /** RFC 3164 §4.1.2 timestamp: `Mmm dd hh:mm:ss` with a SPACE-padded
    * day-of-month ("Aug  7", not "Aug 07").
    */
  def rfc3164Timestamp(ts: Column): Column =
    concat(date_format(ts, "MMM"), lit(" "),
      lpad(date_format(ts, "d"), 2, " "), lit(" "),
      date_format(ts, "HH:mm:ss"))

  /** Assemble one syslog line per event. `rfc` is `rfc3164` (default) or
    * `rfc5424`; all parts are pre-rendered columns so the caller sprintf's
    * them against the event (config semantics live in the LSCL lowering).
    */
  def syslogLine(rfc: String, pri: Column, ts: Column, sourcehost: Column,
                 appname: Column, procid: Column, msgid: Column,
                 message: Column): Column = rfc match {
    case "rfc3164" =>
      concat(lit("<"), pri.cast("string"), lit(">"), rfc3164Timestamp(ts),
        lit(" "), sourcehost, lit(" "), appname, lit("["), procid,
        lit("]: "), message)
    case "rfc5424" =>
      concat(lit("<"), pri.cast("string"), lit(">1 "),
        date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"), lit(" "),
        sourcehost, lit(" "), appname, lit(" "), procid, lit(" "), msgid,
        lit(" - "), message)
    case other => throw new IllegalArgumentException(
      s"syslog output: rfc must be rfc3164|rfc5424, got $other")
  }
}
