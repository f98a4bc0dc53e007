package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

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

  def parse(s: String): Ref = {
    if (s == null || s.isEmpty) fail(s)
    if (!s.contains('[') && !s.contains(']')) {
      if (s == "@metadata") Ref(Nil, meta = true) else Ref(Seq(s), meta = false)
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
        segs += seg
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
}
