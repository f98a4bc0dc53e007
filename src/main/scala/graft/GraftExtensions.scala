package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Cast, Expression, ExpressionInfo, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}

import graft.plans.{LongSetIntersectCount, RegexExtractStruct, VocabTokenize, YamlToJson}

/** Replaces `size(array_intersect(a, b))` over non-null long arrays with the
  * specialized [[LongSetIntersectCount]] kernel (open-addressing long table,
  * no result-array allocation — SURVEY §7.2: the built-in composition
  * measured ~1ms/row in dedup verify loops). Guards:
  *  - element type must be non-null bigint (the kernel skips null elements,
  *    array_intersect matches them — containsNull arrays are left alone);
  *  - legacySizeOfNull must be off (legacy size(null) = -1, the kernel's
  *    null-intolerant cast yields NULL — only the modern semantics match).
  * Distinctness matches by construction: array_intersect dedups its result,
  * the kernel counts each matched value once.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {
  private def nonNullLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, false) => true
    case _ => false
  }
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayIntersect(a, b), legacy)
        if !legacy && nonNullLongArray(a) && nonNullLongArray(b) =>
      Cast(LongSetIntersectCount(a, b), IntegerType)
  }
}

/** The idiomatic third-party registration path: every graft custom Catalyst
  * expression as a SQL function, plus the kernel-substitution optimizer rule
  * — `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) makes the engine's
  * kernels available to plain `spark.sql(...)` users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
          "", "", "", "", "", "", "built-in"),
        builder))
    }
    ext.injectOptimizerRule(_ => IntersectCountRewrite)
    // SQL catalog over snapshot tables: the pre-CBO rule grafts each
    // graft-catalog relation's NATIVE plan (vectorized parquet + MOR
    // anti-joins) into the query, dir-pruned via manifest stats/Blooms,
    // with global count/min/max answered from the manifest alone.
    // Pre-CBO is load-bearing: predicates are fully pushed by then, and
    // the relation must not survive to V2ScanRelationPushDown.
    ext.injectPreCBORule(spark => new graft.sources.SnapshotSqlRule(spark))
    // SQL DML (UPDATE / DELETE-any-predicate / MERGE INTO) on snapshot
    // tables: resolved DML nodes become runnable commands driving the
    // native CoW/MOR machinery (post-hoc: after resolution, before the
    // planner's SupportsRowLevelOperations requirement would reject them).
    ext.injectPostHocResolutionRule(spark => new graft.sources.SnapshotDmlRule(spark))
  }
}

object GraftExtensions {

  private def arity(name: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      require(args.length == n, s"$name expects $n argument(s), got ${args.length}")
      b(args)
    }

  /** (name, usage, builder) for every SQL-exposed expression. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_tokenize",
      "graft_tokenize(text) - vocab ids of the space-separated words (0 = unknown)",
      arity("graft_tokenize", 1)(a => VocabTokenize(a.head))),
    ("graft_yaml_to_json",
      "graft_yaml_to_json(yaml) - YAML document transcoded to a JSON string",
      arity("graft_yaml_to_json", 1)(a => YamlToJson(a.head))),
    ("long_set_intersect_count",
      "long_set_intersect_count(a, b) - |set(a) ∩ set(b)| for bigint arrays",
      arity("long_set_intersect_count", 2)(a => LongSetIntersectCount(a(0), a(1)))),
    ("graft_grok",
      "graft_grok(text, pattern) - struct(g1..gN) of the first match of a " +
        "FOLDABLE regex; NULL when the pattern does not match",
      arity("graft_grok", 2) { a =>
        require(a(1).foldable && a(1).dataType == StringType,
          "graft_grok: the pattern must be a string literal (the regex " +
            "compiles once per plan, not per row)")
        val re = String.valueOf(a(1).eval(null))
        val n = java.util.regex.Pattern.compile(re).matcher("").groupCount()
        require(n > 0, "graft_grok: the pattern must contain capture groups")
        RegexExtractStruct(a(0), re, n)
      }))

  /** Runtime registration into an EXISTING session (sessions built without
    * `spark.sql.extensions`): temp functions + the rewrite rule via
    * `experimental.extraOptimizations`. Prefer [[registerFunctions]] on
    * shared sessions — the optimizer rule is session-global.
    */
  def register(spark: SparkSession): Unit = {
    registerFunctions(spark)
    if (!spark.experimental.extraOptimizations.contains(IntersectCountRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ IntersectCountRewrite
  }

  /** Function-only runtime registration (idempotent, additive — safe on a
    * shared session).
    */
  def registerFunctions(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
