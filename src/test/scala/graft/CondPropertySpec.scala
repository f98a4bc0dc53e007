package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.conditions._

/** Property-based routing equivalence: for randomly generated condition trees
  * and randomly generated rows, the compiled Catalyst predicate and the row
  * oracle agree (SURVEY.md §5: "routing partition property"). Generators are
  * driven directly (deterministic seeds) — no scalatestplus bridge needed.
  */
class CondPropertySpec extends SparkSpec {

  private val fieldS = Gen.oneOf("s1", "s2")
  private val fieldN = Gen.oneOf("n1", "n2")

  private def leaf: Gen[Cond] = Gen.oneOf(
    for (f <- fieldS; v <- Gen.oneOf("A", "B", "", "false")) yield Eq(f, v),
    for (f <- fieldN; v <- Gen.choose(-5, 5)) yield Eq(f, v),
    for (f <- fieldN; v <- Gen.choose(-5, 5)) yield Gt(f, v),
    for (f <- fieldN; v <- Gen.choose(-5, 5)) yield Lte(f, v),
    for (f <- fieldS; v <- Gen.oneOf("A", "B")) yield Neq(f, v),
    for (f <- fieldS) yield Truthy(f),
    for (f <- fieldS) yield RegexMatch(f, "[AB]"),
    for (f <- fieldS; vs <- Gen.listOfN(2, Gen.oneOf("A", "B", "1"))) yield InList(f, vs),
    for (f <- fieldS) yield InConstStr(f, "XABY"),
    for (f <- fieldS) yield ConstInField("A", f),
    for (l <- fieldS; r <- fieldS) yield InField(l, r),
    for (l <- fieldS; r <- fieldS) yield EqFields(l, r),
    for (l <- fieldN; r <- fieldN) yield EqFields(l, r),
    for (l <- fieldN; r <- fieldN; op <- Gen.oneOf(">", ">=", "<", "<="))
      yield OrderFields(op, l, r),
    for (l <- fieldS; r <- fieldS; op <- Gen.oneOf(">", ">=", "<", "<="))
      yield OrderFields(op, l, r))

  private def tree(depth: Int): Gen[Cond] =
    if (depth == 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> (for (a <- tree(depth - 1); b <- tree(depth - 1)) yield And(a, b)),
      2 -> (for (a <- tree(depth - 1); b <- tree(depth - 1)) yield Or(a, b)),
      1 -> (for (a <- tree(depth - 1); b <- tree(depth - 1)) yield Xor(a, b)),
      1 -> (for (a <- tree(depth - 1); b <- tree(depth - 1)) yield Nand(a, b)),
      1 -> tree(depth - 1).map(Not(_)))

  private val rowGen: Gen[(String, String, Integer, Integer)] = for {
    s1 <- Gen.oneOf[String]("A", "B", "AB", "", "false", null)
    s2 <- Gen.oneOf[String]("A", "XAY", null)
    n1 <- Gen.oneOf[Integer](Int.box(-3), Int.box(0), Int.box(4), null)
    n2 <- Gen.oneOf[Integer](Int.box(2), null)
  } yield (s1, s2, n1, n2)

  private val schema = StructType(Seq(
    StructField("s1", StringType), StructField("s2", StringType),
    StructField("n1", IntegerType), StructField("n2", IntegerType)))

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("compiled predicate agrees with row oracle on random trees x random rows") {
    // all rows from the row domain (cartesian of the small value sets), plus
    // 30 random condition trees — every (tree, row) pair cross-checked.
    val rows: Seq[(String, String, Integer, Integer)] =
      (0 until 72).map(i => sample(rowGen, 1000 + i)).distinct
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (a, b, x, y) => Row(a, b, x, y) }, 4),
      schema).cache()
    for (seed <- 0 until 30) {
      val c = sample(tree(3), seed)
      // both compile paths: untyped (NoSchema) and typed (predicateFor —
      // the path every gate uses) must agree with the row oracle
      val got = df
        .withColumn("_p", Cond.predicate(c))
        .withColumn("_pt", Cond.predicateFor(df, c))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.get(2), r.get(3)) ->
          (r.getBoolean(4), r.getBoolean(5))).toMap
      rows.foreach { case t @ (a, b, x, y) =>
        val want = RowOracle.eval(c, Map("s1" -> a, "s2" -> b, "n1" -> x, "n2" -> y))
        assert(got(t) == ((want, want)), s"seed=$seed cond=$c row=$t")
      }
    }
    df.unpersist()
  }
}
