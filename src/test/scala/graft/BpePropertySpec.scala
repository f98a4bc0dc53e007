package graft

import org.apache.spark.sql.functions._
import graft.functions.Text

/** Pins the whole-merge-table BPE kernel (r6, plans/BpeExpr.scala) to the
  * former per-rule projection chain — the exactness oracle the verdict
  * asked for: kernel == chain at m >= 256, including the HOF form's corner
  * semantics (a==b runs, overlapping candidates, short/empty arrays), and
  * the plan stays ONE projection node regardless of the merge count.
  */
class BpePropertySpec extends SparkSpec {

  private def run(rows: Seq[Seq[Int]], merges: Seq[(Int, Int)], base: Int) = {
    import spark.implicits._
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "toks")
    val kernel = Text.bpeApply(df, "toks", "enc", merges, base)
      .orderBy("id").select("enc").collect().map(_.getSeq[Int](0)).toSeq
    val chain = Text.bpeApplyChained(df, "toks", "enc", merges, base)
      .orderBy("id").select("enc").collect().map(_.getSeq[Int](0)).toSeq
    (kernel, chain)
  }

  test("kernel == chained oracle on adversarial corner shapes") {
    val merges = Seq((1, 2), (3, 3), (100, 1), (100, 100))
    val rows = Seq(
      Seq.empty[Int], Seq(1), Seq(2), Seq(1, 2), Seq(2, 1),
      Seq(1, 2, 1, 2), Seq(1, 1, 2, 2), Seq(3, 3, 3), Seq(3, 3, 3, 3),
      Seq(1, 2, 3, 3), Seq(1, 3, 2), Seq(2, 2, 2), Seq(1, 2, 2))
    val (k, c) = run(rows, merges, 100)
    assert(k == c, s"kernel diverged from chain:\n$k\n$c")
  }

  test("kernel == chained oracle on random corpora, cascading merged ids") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map(_ => Seq.fill(rnd.nextInt(40))(rnd.nextInt(6) + 1))
    // later rules reference earlier NEW ids (cascades), like real BPE tables
    val merges = Seq((1, 2), (50, 3), (51, 51), (4, 5), (53, 1), (2, 50))
    val (k, c) = run(rows, merges, 50)
    assert(k == c, s"kernel diverged from chain:\n$k\n$c")
  }

  test("kernel == chain at m >= 256 and the plan stays one projection") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 100).map(_ => Seq.fill(20 + rnd.nextInt(20))(rnd.nextInt(8) + 1))
    // 300 rules over a small alphabet + the ids they mint (base 1000)
    val merges = (0 until 300).map { k =>
      def tok() = if (k > 0 && rnd.nextInt(3) == 0) 1000 + rnd.nextInt(k) else rnd.nextInt(8) + 1
      (tok(), tok())
    }
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "toks")
    val kernelDf = Text.bpeApply(df, "toks", "enc", merges, 1000)
    val kernel = kernelDf.orderBy("id").select("enc").collect().map(_.getSeq[Int](0)).toSeq
    val chain = Text.bpeApplyChained(df, "toks", "enc", merges, 1000)
      .orderBy("id").select("enc").collect().map(_.getSeq[Int](0)).toSeq
    assert(kernel == chain, "kernel diverged from 300-rule chain")
    // plan shape: one bpe_apply_all projection, no exchange, regardless of
    // m — over a range source (a local relation constant-folds the whole
    // projection into LocalTableScan, hiding the node)
    val ranged = spark.range(0, 100).select(col("id"),
      sequence(lit(1), (col("id") % 30 + 2).cast("int")).as("toks"))
    val ep = Text.bpeApply(ranged, "toks", "enc", merges, 1000)
      .queryExecution.executedPlan.toString
    assert("bpe_apply_all".r.findAllIn(ep).size == 1,
      "encode must be ONE kernel node regardless of merge count:\n" + ep.take(500))
    assert(!ep.contains("Exchange"), "bpeApply grew an exchange:\n" + ep.take(300))
  }

  test("null array elements: blocked adjacency + dropped at rule 1, null rows stay null") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq[Integer](1, null, 2)),
      (1L, Seq[Integer](1, 2, null)),
      (2L, Seq[Integer](null)),
      (3L, null)
    ).toDF("id", "toks")
    val kernel = Text.bpeApply(df, "toks", "enc", Seq((1, 2)), 50)
      .orderBy("id").select("enc").collect().map(r => Option(r.get(0))).toSeq
    val chain = Text.bpeApplyChained(df, "toks", "enc", Seq((1, 2)), 50)
      .orderBy("id").select("enc").collect().map(r => Option(r.get(0))).toSeq
    assert(kernel == chain, s"null-element semantics diverged:\n$kernel\n$chain")
  }
}
