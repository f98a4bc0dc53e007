package graft.model

/** The one JSON string-escape helper (RFC 8259 §7): quote, backslash, the
  * named control escapes, and `\u00XX` for the rest of C0. Hand-rolled
  * escaping that misses control characters is NOT valid JSON — producers
  * route through here (YamlExprs' per-row renderer keeps an in-place
  * StringBuilder mirror of these rules for its hot path).
  */
object Json {
  def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def quote(s: String): String = "\"" + escape(s) + "\""
}
