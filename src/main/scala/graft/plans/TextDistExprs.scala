package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Static text-distance kernels callable from generated code. */
object TextKernels {

  /** Banded Levenshtein: the exact distance when it is <= `bound`, else -1
    * (the contract of Spark's 3-arg `levenshtein`). Two reusable int rows,
    * O(min(n,m) · bound) cells, ASCII fast path straight over UTF8 bytes —
    * no per-cell decoding. Non-ASCII inputs decode ONCE to code points
    * (matching Spark/DuckDB code-point distance semantics) and run the same
    * band.
    */
  def levBand(aS: UTF8String, bS: UTF8String, bound: Int): Int = {
    val ab = aS.getBytes
    val bb = bS.getBytes
    if (isAscii(ab) && isAscii(bb)) levBandImpl(ab.length, bb.length,
      (i, j) => ab(i) == bb(j), bound)
    else {
      val ac = aS.toString.codePoints().toArray
      val bc = bS.toString.codePoints().toArray
      levBandImpl(ac.length, bc.length, (i, j) => ac(i) == bc(j), bound)
    }
  }

  private def isAscii(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) { if (b(i) < 0) return false; i += 1 }
    true
  }

  /** Threshold-limited DP (the commons-lang LevenshteinDistance band): only
    * cells within `bound` of the diagonal are computed; a row whose minimum
    * exceeds the bound abandons early. `inf` = bound + 1 marks off-band
    * cells — any path through them already exceeds the bound.
    */
  private def levBandImpl(nIn: Int, mIn: Int, eq: (Int, Int) => Boolean,
                          bound: Int): Int = {
    // orient so the DP rows span the SHORTER string
    val swap = nIn > mIn
    val n = if (swap) mIn else nIn
    val m = if (swap) nIn else mIn
    @inline def same(i: Int, j: Int): Boolean = if (swap) eq(j, i) else eq(i, j)
    if (m - n > bound) return -1
    if (n == 0) return if (m <= bound) m else -1
    val inf = bound + 1
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 0
    while (i <= n) { prev(i) = if (i <= bound) i else inf; i += 1 }
    var j = 1
    while (j <= m) {
      val lo = math.max(1, j - bound)
      val hi = math.min(n, j + bound)
      cur(0) = if (j <= bound) j else inf
      if (lo > 1) cur(lo - 1) = inf
      var rowMin = inf
      i = lo
      while (i <= hi) {
        val cost = if (same(i - 1, j - 1)) 0 else 1
        var v = prev(i - 1) + cost
        val del = cur(i - 1) + 1
        if (del < v) v = del
        val ins = prev(i) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf // clamp: keeps +1 arithmetic overflow-free
        cur(i) = v
        if (v < rowMin) rowMin = v
        i += 1
      }
      if (rowMin > bound) return -1
      if (hi < n) cur(hi + 1) = inf // stale cells beyond the band are off-path
      val t = prev; prev = cur; cur = t
      j += 1
    }
    if (prev(n) <= bound) prev(n) else -1
  }
}

/** `levenshtein(a, b, bound)` as a specialized codegen'd kernel (SURVEY.md
  * §7.2 promotion rule: the built-in walks the FULL O(n·m) table with
  * per-cell UTF8 handling — measured ~14 ms/pair at 300 chars in the
  * dedup_edit verify stage; the band computes O(n·bound) cells over raw
  * bytes). Same contract as the built-in 3-arg form: exact distance when
  * <= `bound`, -1 otherwise. `bound` is a PER-ROW expression, so callers
  * can band each pair by its own lengths — a corpus-max bound would let
  * one long outlier document degrade every other pair back to the full
  * table.
  */
case class LevenshteinBand(first: Expression, second: Expression,
                           third: Expression) extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "levenshtein_band"

  override protected def nullSafeEval(a: Any, b: Any, k: Any): Any =
    TextKernels.levBand(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, k) => s"graft.plans.TextKernels.levBand($a, $b, $k)")

  override protected def withNewChildrenInternal(newFirst: Expression,
                                                 newSecond: Expression,
                                                 newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TextDist {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.lit
  import org.apache.spark.sql.graft.Bridge

  /** Column wrapper for [[LevenshteinBand]]; `bound` evaluates per row
    * (int). A negative bound returns -1 for every pair.
    */
  def levenshteinBand(a: Column, b: Column, bound: Column): Column =
    Bridge.column(LevenshteinBand(Bridge.expression(a), Bridge.expression(b),
      Bridge.expression(bound)))

  def levenshteinBand(a: Column, b: Column, bound: Int): Column =
    levenshteinBand(a, b, lit(bound))
}
