package graft.operators

import java.io.StringWriter

import com.fasterxml.jackson.core.{JsonFactory, JsonGenerator}

/** EDN (extensible data notation, the published edn-format spec) to JSON
  * transcoder backing the `edn`/`edn_lines` codecs. Like the msgpack codec,
  * the parse seam is text->text at the ingest boundary; the typed work stays
  * on Spark's codegen'd `from_json`.
  *
  * Surface: nil/true/false, integers, floats, strings (with \" \\ \n \t \r
  * escapes), keywords (`:a/b` -> JSON string without the colon, matching the
  * Ruby EDN gem's Symbol#to_s event keys), symbols (their literal text),
  * characters (`\c`, `\newline`, `\space`, `\tab` -> 1-char strings),
  * vectors/lists/sets (all -> JSON arrays; sets lose EDN's uniqueness
  * constraint, which JSON cannot express), maps (keys stringify), commas as
  * whitespace, `;` line comments, `#_` discard, and tagged elements
  * (`#inst "..."` -> the underlying value; the tag itself has no JSON
  * carrier, documented divergence).
  */
object Edn {

  private val factory = new JsonFactory

  def toJson(edn: String): String = {
    val p = new P(edn)
    val w = new StringWriter(); val g = factory.createGenerator(w)
    p.ws()
    p.value(g)
    g.close()
    p.ws()
    require(p.eof, s"edn: trailing content at ${p.pos}: '${p.rest.take(20)}'")
    w.toString
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def rest: String = s.substring(pos)
    private def ch: Char = s.charAt(pos)

    def ws(): Unit = {
      while (!eof && (ch.isWhitespace || ch == ',' || ch == ';' ||
          (ch == '#' && pos + 1 < s.length && s.charAt(pos + 1) == '_'))) {
        if (ch == ';') { while (!eof && ch != '\n') pos += 1 }
        else if (ch == '#') { // #_ discard: skip the next value entirely
          pos += 2; ws()
          val sink = factory.createGenerator(new StringWriter); value(sink); sink.close()
        }
        else pos += 1
      }
    }

    def value(g: JsonGenerator): Unit = {
      require(!eof, "edn: unexpected end of input")
      ch match {
        case '{' =>
          pos += 1; g.writeStartObject(); ws()
          while (ch != '}') {
            g.writeFieldName(keyString()); ws(); value(g); ws()
          }
          pos += 1; g.writeEndObject()
        case '[' | '(' =>
          val close = if (ch == '[') ']' else ')'
          pos += 1; g.writeStartArray(); ws()
          while (ch != close) { value(g); ws() }
          pos += 1; g.writeEndArray()
        case '#' if s.startsWith("#{", pos) =>
          pos += 2; g.writeStartArray(); ws()
          while (ch != '}') { value(g); ws() }
          pos += 1; g.writeEndArray()
        case '#' => // tagged element: skip the tag symbol, emit the value
          pos += 1; token(); ws(); value(g)
        case '"' => g.writeString(string())
        case '\\' => g.writeString(charLit())
        case ':' => pos += 1; g.writeString(token())
        case c if c == '-' && pos + 1 < s.length && s.charAt(pos + 1).isDigit =>
          number(g)
        case c if c.isDigit => number(g)
        case _ =>
          val t = token()
          t match {
            case "nil" => g.writeNull()
            case "true" => g.writeBoolean(true)
            case "false" => g.writeBoolean(false)
            case sym => g.writeString(sym) // bare symbol -> its text
          }
      }
    }

    /** A map key in any EDN form, rendered to its JSON field-name string. */
    private def keyString(): String = {
      val w = new StringWriter(); val g = factory.createGenerator(w)
      value(g); g.close()
      val j = w.toString
      if (j.startsWith("\"")) com.fasterxml.jackson.databind.json.JsonMapper
        .builder().build().readTree(j).asText()
      else j
    }

    private def token(): String = {
      val b = new java.lang.StringBuilder
      while (!eof && !ch.isWhitespace && !",]})({[;\"".contains(ch)) {
        b.append(ch); pos += 1
      }
      b.toString
    }

    private def string(): String = {
      pos += 1 // opening quote
      val b = new java.lang.StringBuilder
      while (ch != '"') {
        if (ch == '\\') {
          pos += 1
          b.append(ch match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case '\\' => '\\'; case '"' => '"'
            case c => c
          })
        } else b.append(ch)
        pos += 1
      }
      pos += 1 // closing quote
      b.toString
    }

    private def charLit(): String = {
      pos += 1
      val t = token()
      t match {
        case "newline" => "\n"; case "space" => " "; case "tab" => "\t"
        case "return" => "\r"
        case one => one.take(1)
      }
    }

    private def number(g: JsonGenerator): Unit = {
      val start = pos
      if (ch == '-' || ch == '+') pos += 1
      while (!eof && (ch.isDigit || ch == '.' || ch == 'e' || ch == 'E' ||
          ((ch == '-' || ch == '+') && "eE".contains(s.charAt(pos - 1))))) pos += 1
      var t = s.substring(start, pos)
      // EDN arbitrary-precision suffixes N (int) and M (decimal)
      if (!eof && (ch == 'N' || ch == 'M')) pos += 1
      if (t.contains('.') || t.toLowerCase.contains('e'))
        g.writeNumber(java.lang.Double.parseDouble(t))
      else g.writeNumber(java.lang.Long.parseLong(t))
    }
  }
}
