package graft

import org.apache.spark.sql.functions._
import graft.operators.EsQuery

/** The elasticsearch input's query-DSL lowering: clause coverage, wildcard
  * translation, loud failures, and the partition-pruning/pushdown contract
  * (the entire reason the DSL is lowered to predicates instead of being
  * evaluated post-scan).
  */
class EsQuerySpec extends SparkSpec {

  private def rows = {
    import spark.implicits._
    Seq(
      (1L, "click", 5.0, "alpha"),
      (2L, "view", 0.5, "beta"),
      (3L, "click", 99.0, null),
      (4L, "error", 5.0, "alphabet"),
      (5L, "buy", 7.5, "gamma")
    ).toDF("id", "etype", "value", "word")
  }

  private def ids(q: String): Seq[Long] =
    rows.filter(EsQuery.predicate(q)).select("id").collect().map(_.getLong(0)).toSeq.sorted

  test("term, terms, match, long form, match_all") {
    assert(ids("""{"term":{"etype":"click"}}""") == Seq(1L, 3L))
    assert(ids("""{"query":{"term":{"etype":{"value":"click"}}}}""") == Seq(1L, 3L))
    assert(ids("""{"match":{"etype":{"query":"view"}}}""") == Seq(2L))
    assert(ids("""{"terms":{"etype":["view","buy"]}}""") == Seq(2L, 5L))
    assert(ids("""{"match_all":{}}""") == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("range, exists, prefix, wildcard") {
    assert(ids("""{"range":{"value":{"gte":5.0,"lt":99.0}}}""") == Seq(1L, 4L, 5L))
    assert(ids("""{"exists":{"field":"word"}}""") == Seq(1L, 2L, 4L, 5L))
    assert(ids("""{"prefix":{"word":"alpha"}}""") == Seq(1L, 4L))
    assert(ids("""{"wildcard":{"word":"?lph*"}}""") == Seq(1L, 4L))
    assert(ids("""{"wildcard":{"word":"*a"}}""") == Seq(1L, 2L, 5L))
  }

  test("bool nesting: must/filter/should/must_not") {
    assert(ids(
      """{"bool":{"must":[{"term":{"etype":"click"}}],
        |"must_not":[{"range":{"value":{"gt":50}}}]}}""".stripMargin) == Seq(1L))
    // bool of only should = OR
    assert(ids(
      """{"bool":{"should":[{"term":{"etype":"view"}},{"term":{"etype":"buy"}}]}}""")
      == Seq(2L, 5L))
    // nested bool inside must
    assert(ids(
      """{"bool":{"filter":{"bool":{"should":[{"prefix":{"word":"al"}},
        |{"term":{"etype":"buy"}}]}},"must_not":{"term":{"id":4}}}}""".stripMargin)
      == Seq(1L, 5L))
  }

  test("wildcard regex escapes regex metacharacters") {
    assert(EsQuery.wildcardRegex("a.b*") == "^a\\.b.*$")
    assert(EsQuery.wildcardRegex("x+y?") == "^x\\+y.$")
    assert("logs-2024.01.12".matches(EsQuery.wildcardRegex("logs-2024.01.?2")))
    assert(!"logs-2024X01.12".matches(EsQuery.wildcardRegex("logs-2024.01.?2")))
  }

  test("unsupported clauses fail loudly") {
    intercept[IllegalArgumentException](EsQuery.predicate("""{"fuzzy":{"w":"x"}}"""))
    intercept[IllegalArgumentException](
      EsQuery.predicate("""{"bool":{"minimum_should_match":2,"should":[]}}"""))
    intercept[IllegalArgumentException](EsQuery.predicate("""[1,2]"""))
    intercept[IllegalArgumentException](EsQuery.predicate("""{"range":{"v":{}}}"""))
  }

  test("query predicates reach the parquet scan; index wildcard prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_esq").toString
    rows.withColumn("_index",
        concat(lit("logs-"), when(col("id") <= 2, "a").otherwise("b")))
      .write.partitionBy("_index").parquet(s"$dir/idx")
    val cfg = graft.lscl.Lscl.parse(
      s"""input { elasticsearch {
         |  index_path => "$dir/idx"
         |  index => "logs-a"
         |  query => '{"query":{"range":{"value":{"gte":0.6}}}}'
         |} }""".stripMargin, Map.empty)
    val df = graft.lscl.LsclRun.source(spark, cfg.inputs)
    assert(df.select("id").collect().map(_.getLong(0)).toSeq.sorted == Seq(1L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(value,0.6)"), s"no pushdown in:\n$plan")
    // the _index wildcard must land in PartitionFilters (pruned at planning,
    // not filtered post-scan)
    assert(plan.contains("PartitionFilters") && plan.contains("RLIKE(_index"),
      s"index wildcard not a partition filter in:\n$plan")
  }
}
