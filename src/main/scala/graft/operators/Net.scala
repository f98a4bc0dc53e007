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
}
