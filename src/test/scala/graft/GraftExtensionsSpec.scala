package graft

import org.apache.spark.sql.functions._

/** [[GraftExtensions]]: SQL-function registration + the
  * size(array_intersect)->LongSetIntersectCount optimizer rewrite.
  */
class GraftExtensionsSpec extends SparkSpec {

  private def registered = { GraftExtensions.register(spark); spark }

  test("registered SQL functions match their Column-API equivalents") {
    val s = registered
    import s.implicits._
    // graft_grok == RegexExtractStruct
    val grok = s.sql(
      """SELECT graft_grok('alice 42', '(\\w+) (\\d+)') AS m""").collect()(0).getStruct(0)
    assert(grok.getString(0) == "alice" && grok.getString(1) == "42")
    assert(s.sql("SELECT graft_grok('nomatch', '(\\\\d+)') AS m").collect()(0).isNullAt(0))
    // long_set_intersect_count
    val n = s.sql("SELECT long_set_intersect_count(array(1L,2L,3L), array(2L,3L,9L)) AS n")
      .collect()(0).getLong(0)
    assert(n == 2L)
    // graft_yaml_to_json round-trips through from_json
    val y = s.sql("SELECT get_json_object(graft_yaml_to_json('a: 1\nb: x'), '$.b') AS b")
      .collect()(0).getString(0)
    assert(y == "x")
    // graft_tokenize yields one id per whitespace word
    val t = s.sql("SELECT size(graft_tokenize('the quick fox')) AS n").collect()(0).getInt(0)
    assert(t == 3)
  }

  test("graft_grok rejects non-literal and group-free patterns; arity is checked") {
    val s = registered
    val e1 = intercept[Exception](
      s.sql("SELECT graft_grok('x', c) FROM VALUES ('(a)') t(c)").collect())
    assert(e1.getMessage.contains("literal"))
    val e2 = intercept[Exception](s.sql("SELECT graft_grok('x', 'nogroups')").collect())
    assert(e2.getMessage.contains("capture groups"))
    val e3 = intercept[Exception](s.sql("SELECT graft_tokenize('a', 'b')").collect())
    assert(e3.getMessage.contains("1 argument"))
  }

  test("IntersectCountRewrite substitutes the kernel only for non-null long arrays") {
    val s = registered
    import s.implicits._
    // range (not a local Seq) so ConvertToLocalRelation can't fold the plan away
    val df = s.range(2)
      .select(array($"id", $"id" + 1, lit(7L)).as("a"),
        array($"id" + 1, lit(7L), lit(9L)).as("b"))
    val rewritten = df.select(size(array_intersect($"a", $"b")).as("n"))
    assert(rewritten.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("long_set_intersect_count"))
    assert(rewritten.collect().map(_.getInt(0)).toSeq == Seq(2, 2))

    // nullable-element arrays keep the built-in (array_intersect matches nulls,
    // the kernel skips them — semantics differ, so the rule must not fire)
    val nullable = df.select(
      size(array_intersect(
        transform($"a", x => when(x > lit(1L), x)),
        transform($"b", x => when(x > lit(1L), x)))).as("n"))
    assert(!nullable.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("long_set_intersect_count"))
    // id=0: [null,null,7] ∩ [null,7,9] — the built-in MATCHES nulls → 2; the
    // kernel would skip them → 1. Getting 2 proves the built-in executed.
    assert(nullable.collect().map(_.getInt(0)).toSeq == Seq(2, 2))
  }

  test("register is idempotent (no duplicate optimizer rules)") {
    val s = registered
    GraftExtensions.register(s)
    assert(s.experimental.extraOptimizations.count(_ == IntersectCountRewrite) == 1)
  }
}
