package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Text}

/** math + punct filter lowerings, SemDeDup clustering semantics, and the
  * hashed-n-gram classifier — the edges the DuckDB gates don't pin.
  */
class QualityOpsSpec extends SparkSpec {

  test("math: power + chained targets + div-by-zero null + conditional gating") {
    import spark.implicits._
    val df = Seq((1L, 4.0, 2L), (2L, 9.0, 0L), (3L, 16.0, 4L))
      .toDF("id", "v", "d")
    val cfg = graft.lscl.Lscl.parse(
      """filter {
        |  math { calculate => [
        |    ["power", "[v]", 0.5, "[root]"],
        |    ["add", "[root]", 1, "[rootp1]"],
        |    ["divide", "[v]", "[d]", "[q]"]
        |  ] }
        |  if [id] == 3 {
        |    math { calculate => [["sub", "[v]", "[d]", "[gated]"]] }
        |  }
        |}""".stripMargin, Map.empty)
    val out = graft.lscl.LsclRun.applyFilters(df, cfg.filters)
      .orderBy("id").collect()
    assert(out.map(_.getAs[Double]("root")).toSeq == Seq(2.0, 3.0, 4.0))
    assert(out.map(_.getAs[Double]("rootp1")).toSeq == Seq(3.0, 4.0, 5.0))
    assert(out(0).getAs[Double]("q") == 2.0)
    assert(out(1).isNullAt(out(1).fieldIndex("q"))) // div by zero
    assert(out(0).isNullAt(out(0).fieldIndex("gated")))
    assert(out(2).getAs[Double]("gated") == 12.0)
  }

  test("punct: defaults to message->punct; strips alnum+space, keeps structure") {
    import spark.implicits._
    val df = Seq("""2024-01-01T00:00:00 [web] GET /a/b?x=1 (200)""").toDF("message")
    val cfg = graft.lscl.Lscl.parse("""filter { punct { } }""", Map.empty)
    val out = graft.lscl.LsclRun.applyFilters(df, cfg.filters).collect()
    assert(out(0).getAs[String]("punct") == "--::[]//?=()")
  }

  test("semDedup: within-cluster near-identical vectors collapse lowest-id-wins") {
    import spark.implicits._
    // axis-aligned centroid seeds; dup sets along (4,3,0) / (3,4,0) — far
    // enough from the seeds (cos 0.8) that only true dups pair at 0.99
    def v(x: Float, y: Float, z: Float) = Seq(x, y, z)
    val df = Seq(
      (1L, v(1f, 0f, 0f)), (2L, v(0f, 1f, 0f)), // centroid seeds
      (10L, v(4f, 3f, 0f)), (11L, v(8f, 6f, 0f)), (12L, v(2f, 1.5f, 0f)),
      (20L, v(3f, 4f, 0f)), (21L, v(9f, 12f, 0f)),
      (30L, v(0f, 0f, 5f))).toDF("vec_id", "embedding")
    val cents = graft.functions.Similarity.ivfCentroids(df, "embedding", "vec_id", 2)
    val out = Dedup.semDedup(df, "embedding", "vec_id", cents, minSim = 0.99)
      .orderBy("vec_id").collect()
    val keep = out.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(keep(10L) && !keep(11L) && !keep(12L)) // lowest id in the dup set wins
    assert(keep(20L) && !keep(21L))
    assert(keep(30L)) // unique in its cluster
    assert(keep(1L) && keep(2L))
    // cluster assignment is the IVF quantizer: same-direction docs co-cluster
    val lists = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lists(10L) == lists(11L) && lists(11L) == lists(12L))
    assert(lists(20L) == lists(21L))
  }

  test("hashedClassify: deterministic, zero-shuffle plan, keep = score>0") {
    import spark.implicits._
    val df = Seq((1L, "aa bb cc"), (2L, "aa bb cc"), (3L, "zz")).toDF("id", "text")
    val out = Text.hashedClassify(df, "text").orderBy("id").collect()
    assert(out(0).getAs[Long]("score") == out(1).getAs[Long]("score"))
    assert(out(0).getAs[Int]("n_tok") == 3 && out(2).getAs[Int]("n_tok") == 1)
    assert(out.forall(r => r.getAs[Boolean]("keep") == (r.getAs[Long]("score") > 0)))
    // scale shape: no Exchange in the plan — pure projection
    val plan = Text.hashedClassify(df, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"classifier inference must not shuffle:\n$plan")
  }

  test("bpeApply: overlap suppression, rule chaining, short arrays, packSequences boundary") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // rule 0: (5,7)->100, rule 1: (7,9)->101 — rank order means rule 1 only
    // sees 7s that survived rule 0
    val df = Seq(
      (1L, Seq(5, 7, 7, 9)),   // (5,7) at 0 -> 100; leftover (7,9) -> 101
      (2L, Seq(5, 7, 5, 7)),   // two non-overlapping (5,7)
      (3L, Seq(7, 9, 5)),      // only rule 1 fires
      (4L, Seq(5)),            // singleton: untouched
      (5L, Seq.empty[Int]))    // empty: untouched
      .toDF("id", "toks")
    val enc = graft.functions.Text.bpeApply(df, "toks", "enc",
        Seq((5, 7), (7, 9)), newIdBase = 100)
      .select(col("id"), col("enc")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc(1L) == Seq(100, 101), enc(1L))
    assert(enc(2L) == Seq(100, 100), enc(2L))
    assert(enc(3L) == Seq(101, 5), enc(3L))
    assert(enc(4L) == Seq(5))
    assert(enc(5L) == Seq.empty[Int])

    // packSequences: a doc spanning the pack boundary contributes slices to
    // BOTH packs, ordered by in-pack position
    val docs = Seq((1L, Seq(1, 2, 3), 3), (2L, Seq(4, 5, 6, 7), 4), (3L, Seq(8), 1))
      .toDF("doc_id", "tokens", "n_tok")
    val packs = graft.functions.Text.packSequences(docs, "doc_id", "tokens", "n_tok",
        seqLen = 4)
      .orderBy("pack_id").collect()
      .map(r => (r.getLong(0), r.getAs[Seq[Int]]("pack_tokens"), r.getAs[Int]("n_pieces")))
    assert(packs.toSeq == Seq(
      (0L, Seq(1, 2, 3, 4), 2),  // doc 2 split across packs 0 and 1
      (1L, Seq(5, 6, 7, 8), 2)), packs.mkString("|"))
  }
}
