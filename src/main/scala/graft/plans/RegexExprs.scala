package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass multi-group regex extraction kernel.
  *
  * Why custom (SURVEY.md §7.2 escalation rule): a grok pattern with k named
  * captures composed from built-ins runs `rlike` + k×`regexp_extract` = k+1
  * FULL regex matches per row. At 100 TB the apache benchmark case
  * (7 captures) pays 8 regex passes per line; this expression matches ONCE
  * and emits all groups as a struct. Group-null semantics mirror
  * `regexp_extract` (non-participating group -> empty string), so the
  * composed and one-pass paths are byte-identical.
  */
object RegexOps {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  private def pattern(re: String): java.util.regex.Pattern = {
    val p = cache.get(re)
    if (p != null) p
    else cache.computeIfAbsent(re, r => java.util.regex.Pattern.compile(r))
  }

  /** find() once; null when no match, else a row of n group strings. */
  def extract(input: UTF8String, re: String, n: Int): InternalRow = {
    val m = pattern(re).matcher(input.toString)
    if (!m.find()) null
    else {
      val arr = new Array[Any](n)
      var i = 0
      while (i < n) {
        val g = m.group(i + 1)
        // regexp_extract maps a non-participating group to "" — keep parity
        arr(i) = if (g == null) UTF8String.EMPTY_UTF8 else UTF8String.fromString(g)
        i += 1
      }
      new GenericInternalRow(arr)
    }
  }
}

/** struct(g1..gN string) of the first regex match of `child`; null when the
  * pattern does not match (the _grokparsefailure signal).
  */
case class RegexExtractStruct(child: Expression, regex: String, numGroups: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    StructType((1 to numGroups).map(i => StructField(s"g$i", StringType)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "regex_extract_struct"

  override protected def nullSafeEval(input: Any): Any =
    RegexOps.extract(input.asInstanceOf[UTF8String], regex, numGroups)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val reRef = ctx.addReferenceObj("grokRegex", regex, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.plans.RegexOps.extract($c, $reRef, $numGroups);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexExprs {
  def extractStruct(input: Column, regex: String, numGroups: Int): Column =
    Bridge.column(RegexExtractStruct(Bridge.expression(input), regex, numGroups))
}
