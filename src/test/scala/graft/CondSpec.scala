package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.conditions._

/** Table-driven conditional-semantics spec, mirroring the reference's
  * EventConditionTest (logstash-core/src/test/java/org/logstash/config/ir/
  * EventConditionTest.java): every operator class from SURVEY.md §2.6,
  * asserting the compiled Catalyst predicate agrees with the row oracle on
  * every fixture row — including the tricky cases (null => false branch,
  * substring `in`, stringified list `in`, truthiness of "false"/"").
  */
class CondSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("s", StringType),       // string field, sometimes null
    StructField("n", IntegerType),      // numeric
    StructField("b", StringType),       // "true"/"false"/""/null truthiness probe
    StructField("xs", ArrayType(StringType))))

  private val rowsData: Seq[(String, Integer, String, Seq[String])] = Seq(
    ("ERROR", 10, "true", Seq("a", "b")),
    ("WARN", 65, "false", Seq("b")),
    ("INFO", 64, "", Seq.empty[String]),
    (null, null, null, null),
    ("err", 0, "0", Seq("a", "x")),
    ("RRO", 100, "yes", Seq("false")))

  private lazy val df = spark.createDataFrame(
    spark.sparkContext.parallelize(rowsData.map { case (s, n, b, xs) => Row(s, n, b, xs) }),
    schema)

  private def oracleRows: Seq[Map[String, Any]] = rowsData.map { case (s, n, b, xs) =>
    Map[String, Any]("s" -> s, "n" -> n, "b" -> b, "xs" -> xs)
  }

  private val conds: Seq[(String, Cond)] = Seq(
    "eq" -> Eq("s", "ERROR"),
    "eq-missing-vs-null" -> Eq("s", "nope"),
    "neq-null-is-true" -> Neq("s", "ERROR"), // null s => != is TRUE in reference
    "gt" -> Gt("n", 64),
    "gte" -> Gte("n", 64),
    "lt" -> Lt("n", 10),
    "lte" -> Lte("n", 0),
    "regex" -> RegexMatch("s", "ERR"),
    "regex-nonstring-false" -> RegexMatch("n", "1"),
    "noregex" -> RegexNoMatch("s", "^E"),
    "in-list-stringified" -> InList("n", Seq("10", "65")),
    "in-list-str" -> InList("s", Seq("ERROR", "INFO")),
    "in-const-substring" -> InConstStr("s", "XERRORY"), // field contained in const
    "const-in-field-str" -> ConstInField("RRO", "s"),   // const substring of field
    "const-in-field-list" -> ConstInField("a", "xs", fieldIsList = true),
    "truthy" -> Truthy("b"),                            // "false"/""/null => false
    "and" -> And(Eq("s", "WARN"), Gt("n", 64)),
    "or" -> Or(Eq("s", "INFO"), Lt("n", 5)),
    "nand" -> Nand(Truthy("b"), Gt("n", 5)),
    "xor" -> Xor(Eq("s", "ERROR"), Gt("n", 60)),
    "not" -> Not(Eq("s", "ERROR")),
    "nested" -> And(Or(Eq("s", "ERROR"), Eq("s", "WARN")), Not(Truthy("b"))))

  for ((name, c) <- conds) test(s"compiled predicate == row oracle [$name]") {
    val got = df.withColumn("_p", Cond.predicateFor(df, c))
      .collect().map(_.getBoolean(4)).toSeq
    // use list-typed xs for the list-in case in the oracle
    val want = oracleRows.map(r => RowOracle.eval(c, r))
    assert(got == want, s"cond=$c got=$got want=$want")
  }

  test("routing predicate is two-valued (never null)") {
    val c = And(Eq("tier_missing_sim", "x"), Gt("n", 1))
    // a condition over a null-heavy column must still partition all rows
    val p = Cond.predicate(Eq("s", "ERROR"))
    val parts = df.withColumn("_p", p).groupBy("_p").count().collect()
    assert(parts.map(_.getLong(1)).sum == rowsData.size)
  }
}
