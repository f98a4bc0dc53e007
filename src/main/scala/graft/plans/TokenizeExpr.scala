package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass vocabulary tokenizer kernel: split-on-space + hash lookup +
  * primitive int[] output, no intermediate UTF8String array-of-arrays and no
  * per-word linear scan of the vocab literal.
  *
  * Why custom (SURVEY.md §7.2 escalation rule — "promote to one custom
  * codegen Expression only if profiling demands"): the composed built-ins
  * (split -> transform -> array_position) allocate a boxed lambda variable
  * per word and scan the 31-element vocab array per word with collation-
  * aware comparisons; at 1.8M rows/s x ~60 words/row that allocation rate
  * made the parse stage memory-bound and capped 8->32-thread scaling.
  */
object VocabKernel {
  // built once per executor JVM from the canonical vocabulary
  private val lookup: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    graft.model.Tok.Vocab.zipWithIndex.foreach { case (w, i) =>
      m.put(UTF8String.fromString(w), Integer.valueOf(i + 1))
    }
    m
  }
  private val SPACE = UTF8String.fromString(" ")

  def tokenize(text: UTF8String): ArrayData = {
    val words = text.split(SPACE, -1)
    val out = new Array[Int](words.length)
    var i = 0
    while (i < words.length) {
      val id = lookup.get(words(i))
      out(i) = if (id == null) 0 else id.intValue()
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** tokens = vocab ids of the space-separated words of `child` (0 = unknown),
  * byte-identical to transform(split(text,' '), w -> array_position(vocab,w)).
  */
case class VocabTokenize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vocab_tokenize"

  override protected def nullSafeEval(input: Any): Any =
    VocabKernel.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VocabKernel.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenizeExpr {
  def vocabTokenize(text: Column): Column =
    Bridge.column(VocabTokenize(Bridge.expression(text)))
}
