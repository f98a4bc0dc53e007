package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-sketch membership over a long hash column, the probe side of
  * incremental dedup ([[graft.functions.Dedup.incrementalNew]]): the sketch
  * of corpus-history content hashes rides as a BROADCAST (one fetch per
  * executor, never per task), and the probe stays inside whole-stage codegen
  * — no UDF seam, no row boxing. A `false` is a PROOF of absence (bloom
  * filters have no false negatives); `true` means "might be present", to be
  * confirmed exactly downstream.
  */
case class BloomMightContainLong(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain_long"

  override protected def nullSafeEval(h: Any): Any =
    bloom.value.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Broadcast.value memoizes after the first executor-side fetch, so the
    // per-row cost is one virtual call + the bloom's k bit probes
    val ref = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    defineCodeGen(ctx, ev, h =>
      s"((org.apache.spark.util.sketch.BloomFilter)$ref.value()).mightContainLong($h)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
