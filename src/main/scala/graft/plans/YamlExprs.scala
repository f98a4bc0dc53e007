package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** YAML -> JSON transcode kernel for the `yaml` filter
  * (logstash-filter-yaml: YAML.load(source) -> event fields, parse failure
  * tags `_yamlparsefailure`).
  *
  * Why a transcode seam instead of a YAML row parser: the engine already has
  * the one-pass schema'd expansion path for JSON (`from_json` with explicit
  * DDL — the 100 TB path, no inference double-scan). Re-expressing YAML as a
  * canonical JSON string at a single codegen'd expression keeps the whole
  * downstream plan identical to the json filter: same typed expansion, same
  * reserved-field hygiene, same conditional gating. The transcoder itself is
  * SnakeYAML's SafeConstructor (no arbitrary object instantiation — the
  * library is already on the Spark classpath) with a hand-rolled JSON
  * renderer, so a malicious document can only ever yield data.
  */
object YamlOps {
  // Yaml instances are not thread-safe; one per executor thread
  private val yamls = new ThreadLocal[org.yaml.snakeyaml.Yaml] {
    override def initialValue(): org.yaml.snakeyaml.Yaml = {
      val opts = new org.yaml.snakeyaml.LoaderOptions()
      new org.yaml.snakeyaml.Yaml(
        new org.yaml.snakeyaml.constructor.SafeConstructor(opts))
    }
  }

  private def escapeTo(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      (c: @annotation.switch) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case other =>
          if (other < 0x20) sb.append(f"\\u${other.toInt}%04x")
          else sb.append(other)
      }
      i += 1
    }
    sb.append('"')
  }

  private def renderTo(sb: java.lang.StringBuilder, v: Any): Unit = v match {
    case null => sb.append("null")
    case m: java.util.Map[_, _] =>
      sb.append('{')
      val it = m.entrySet().iterator()
      var first = true
      while (it.hasNext) {
        val e = it.next()
        if (!first) sb.append(',')
        first = false
        escapeTo(sb, String.valueOf(e.getKey))
        sb.append(':')
        renderTo(sb, e.getValue)
      }
      sb.append('}')
    case l: java.util.List[_] =>
      sb.append('[')
      val it = l.iterator()
      var first = true
      while (it.hasNext) {
        if (!first) sb.append(',')
        first = false
        renderTo(sb, it.next())
      }
      sb.append(']')
    case b: java.lang.Boolean => sb.append(b.booleanValue())
    case n: java.lang.Number => sb.append(n.toString)
    case d: java.util.Date => escapeTo(sb, // SafeConstructor yields Date for timestamps
      java.time.Instant.ofEpochMilli(d.getTime).toString)
    case bytes: Array[Byte] => // !!binary
      escapeTo(sb, java.util.Base64.getEncoder.encodeToString(bytes))
    case other => escapeTo(sb, other.toString)
  }

  /** Canonical JSON of the parsed YAML document; null = parse failure (the
    * `_yamlparsefailure` signal).
    */
  def transcode(input: UTF8String): UTF8String =
    try {
      val parsed = yamls.get().load[AnyRef](input.toString)
      val sb = new java.lang.StringBuilder(input.numBytes() + 16)
      renderTo(sb, parsed)
      UTF8String.fromString(sb.toString)
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
}

/** JSON rendering of the YAML document in `child`; null when the document
  * does not parse.
  */
case class YamlToJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "yaml_to_json"

  override protected def nullSafeEval(input: Any): Any =
    YamlOps.transcode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.plans.YamlOps.transcode($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object YamlExprs {
  def yamlToJson(input: Column): Column =
    Bridge.column(YamlToJson(Bridge.expression(input)))
}
