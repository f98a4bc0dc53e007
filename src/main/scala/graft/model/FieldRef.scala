package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Logstash field references (`foo`, `[foo]`, `[a][b]`, `[@metadata][x]`)
  * mapped onto the Spark column model (SURVEY.md §1.1/§1.2).
  *
  * The tokenizer mirrors the reference's strict mode
  * (FieldReference.java:269-359): bare name OR a sequence of bracketed
  * segments; anything mixing the two (`[a]b`, `a[b]`), empty segments, or
  * stray brackets is ambiguous and throws — same contract as
  * `IllegalSyntaxException` (FieldReference.java:354). `@metadata`-rooted
  * refs resolve to the `_meta_`-prefixed columns that routing drops before
  * sinks (Route.MetaPrefix), reproducing "metadata never reaches sinks"
  * (Event.java:57-68).
  */
object FieldRef {

  final case class Ref(path: Seq[String], meta: Boolean)

  /** `config.field_reference.escape_style` (FieldReference.java:52-70 +
    * util/EscapeHandler.java): per-segment escape/unescape so field NAMES may
    * contain literal brackets. `percent` uses URI-style `%5B`/`%5D` pairs
    * (a bare `%` not followed by two hex digits stays literal); `ampersand`
    * uses HTML-entity-style `&#91;`/`&#93;` decimal code points.
    */
  sealed trait EscapeStyle {
    def unescape(s: String): String
    def escape(s: String): String
  }
  object EscapeStyle {
    case object None extends EscapeStyle {
      def unescape(s: String): String = s
      def escape(s: String): String = s
    }
    case object Percent extends EscapeStyle {
      private val Encoded = java.util.regex.Pattern.compile("%[0-9A-F]{2}")
      private val BareLiteral = java.util.regex.Pattern.compile("%(?![0-9A-F]{2})")
      private val NeedsEscape = java.util.regex.Pattern.compile("%(?=[0-9A-F]{2})")
      def unescape(s: String): String = {
        if (!s.contains("%") || !Encoded.matcher(s).find()) return s
        // protect bare percent-literals before the URI decoder sees them
        val pre = BareLiteral.matcher(s).replaceAll("%25")
        java.net.URLDecoder.decode(pre, java.nio.charset.StandardCharsets.UTF_8)
      }
      def escape(s: String): String =
        NeedsEscape.matcher(s).replaceAll("%25").replace("[", "%5B").replace("]", "%5D")
    }
    case object Ampersand extends EscapeStyle {
      private val Encoded = java.util.regex.Pattern.compile("&#([0-9]{2,});")
      def unescape(s: String): String = {
        if (!s.contains("&")) return s
        val m = Encoded.matcher(s)
        val sb = new java.lang.StringBuilder
        var last = 0
        while (m.find()) {
          sb.append(s, last, m.start())
          sb.append(Character.toChars(m.group(1).toInt))
          last = m.end()
        }
        sb.append(s.substring(last)).toString
      }
      def escape(s: String): String =
        Encoded.matcher(s).replaceAll("&#38;#$1;").replace("[", "&#91;").replace("]", "&#93;")
    }
    def of(name: String): EscapeStyle = name match {
      case "none" => None
      case "percent" => Percent
      case "ampersand" => Ampersand
      case other => throw new IllegalArgumentException(s"Invalid escape style: `$other`")
    }
  }

  /** Session escape style (the reference's global setEscapeStyle). */
  @volatile private var escapeStyle: EscapeStyle = EscapeStyle.None
  def setEscapeStyle(style: EscapeStyle): Unit = escapeStyle = style
  def setEscapeStyle(name: String): Unit = setEscapeStyle(EscapeStyle.of(name))

  def parse(s: String): Ref = {
    val un = escapeStyle.unescape _
    if (s == null || s.isEmpty) fail(s)
    if (!s.contains('[') && !s.contains(']')) {
      if (s == "@metadata") Ref(Nil, meta = true) else Ref(Seq(un(s)), meta = false)
    } else {
      if (!s.startsWith("[") || !s.endsWith("]")) fail(s)
      val segs = Seq.newBuilder[String]
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) != '[') fail(s) // text between segments => ambiguous
        val close = s.indexOf(']', i + 1)
        if (close < 0) fail(s)
        val seg = s.substring(i + 1, close)
        if (seg.isEmpty || seg.contains('[')) fail(s)
        segs += un(seg)
        i = close + 1
      }
      val path = segs.result()
      if (path.head == "@metadata") Ref(path.tail, meta = true)
      else Ref(path, meta = false)
    }
  }

  private def fail(s: String): Nothing =
    throw new IllegalArgumentException(s"Invalid FieldReference: `$s`")

  /** Resolve a parsed ref to a Column: metadata refs -> `_meta_a_b` flat
    * columns; data refs -> nested struct access `col(a).getField(b)...`.
    */
  def column(ref: Ref): Column = {
    if (ref.meta) {
      require(ref.path.nonEmpty, "bare [@metadata] is not addressable")
      col("_meta_" + ref.path.mkString("_"))
    } else ref.path.tail.foldLeft(col(ref.path.head))(_.getField(_))
  }

  def column(s: String): Column = column(parse(s))

  // ------------------------------------------------------------------
  // Nested field WRITE semantics (Accessors.java:63-120):
  //  - `set` auto-creates missing intermediate containers
  //    (findCreateTarget, Accessors.java:102-120; the reference creates
  //    maps — here structs, the typed equivalent);
  //  - list elements are addressed by integer string keys, negative
  //    indices count from the end (listIndex), and setting past the end
  //    pads with nulls (appendAtIndex, Accessors.java:79-89);
  //  - setting through a NULL struct value creates a fresh container for
  //    that row (the per-event map creation the reference does).
  // ------------------------------------------------------------------

  private val IndexSeg = "(-?\\d+)".r

  /** Set `refStr` (e.g. `[a][b]`, `[lst][0]`, `[lst][-1]`, `[@metadata][x]`)
    * to `value` over the frame, creating intermediate structs as needed.
    */
  def set(df: DataFrame, refStr: String, value: Column): DataFrame = {
    val ref = parse(refStr)
    if (ref.meta) {
      require(ref.path.nonEmpty, "bare [@metadata] is not writable")
      df.withColumn("_meta_" + ref.path.mkString("_"), value)
    } else {
      val head = ref.path.head
      if (ref.path.tail.isEmpty) df.withColumn(head, value)
      else if (!df.columns.contains(head))
        df.withColumn(head, createNested(ref.path.tail, value))
      else df.withColumn(head,
        setIn(col(head), df.schema(head).dataType, ref.path.tail, value))
    }
  }

  /** Missing intermediate path -> fresh nested structs (findCreateTarget). */
  private def createNested(path: Seq[String], value: Column): Column =
    path.foldRight(value)((seg, v) => struct(v.as(seg)))

  private def setIn(parent: Column, t: DataType, path: Seq[String], value: Column): Column = {
    val seg = path.head
    (t, seg) match {
      case (at: ArrayType, IndexSeg(_)) =>
        val raw = seg.toInt
        val n = size(coalesce(parent, array().cast(at)))
        val idx: Column = if (raw < 0) n + raw else lit(raw)
        val newChild = path.tail match {
          case Seq() => value
          case rest => setIn(get(parent, idx), at.elementType, rest, value)
        }
        // grow-by-nulls append when idx >= size (appendAtIndex); replace
        // in place otherwise; an out-of-range negative index is a no-op
        // (the reference throws out of the setter — no write happens)
        val newLen = greatest(n, idx + 1)
        val rebuilt = transform(sequence(lit(0), newLen - 1), j =>
          when(j === idx, newChild.cast(at.elementType)).otherwise(get(parent, j)))
        when(idx < 0, parent).otherwise(rebuilt)

      case (st: StructType, _) =>
        val existing = st.fields.find(_.name == seg)
        val newChild: Column = path.tail match {
          case Seq() => value
          case rest => existing match {
            case Some(f) => setIn(parent.getField(seg), f.dataType, rest, value)
            case None => createNested(rest, value)
          }
        }
        // null struct value -> fresh struct for that row (auto-create)
        val freshFields: Seq[Column] =
          st.fields.toSeq.map(f =>
            (if (f.name == seg) newChild else lit(null).cast(f.dataType)).as(f.name)) ++
            (if (existing.isEmpty) Seq(newChild.as(seg)) else Nil)
        when(parent.isNull, struct(freshFields: _*))
          .otherwise(parent.withField(seg, newChild))

      case (mt: MapType, _) =>
        val newChild: Column = path.tail match {
          case Seq() => value
          case rest => setIn(try_element_at(parent, lit(seg)), mt.valueType, rest, value)
        }
        val base = coalesce(parent, map().cast(mt))
        map_concat(
          map_filter(base, (k, _) => k =!= lit(seg)),
          map(lit(seg).cast(mt.keyType), newChild.cast(mt.valueType)))

      case _ =>
        // non-container intermediate: the reference replaces it with a fresh
        // map (setChild over the created ConvertedMap) — here a fresh struct
        createNested(path, value)
    }
  }
}
