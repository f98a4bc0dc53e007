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

  test("ngramCharStats: interval-UNION dup coverage, top-gram all-occurrence chars") {
    import spark.implicits._
    // "x y z x y z w": dup 2-grams "x y","y z" at positions {0,1},{3,4} ->
    // with dupN=2 covered indices {0,1,2,3,4,5} minus... compute: dup grams
    // (x y)@0,3 and (y z)@1,4 cover indices 0,1 / 3,4 / 1,2 / 4,5 = {0..5};
    // index 6 (w) uncovered. chars: 6 covered of 7 -> 6/7. Overlap between
    // the two dup grams at index 1 and 4 counts ONCE (union semantics).
    val df = Seq((1L, "x y z x y z w")).toDF("id", "t")
    val r = graft.functions.Text.ngramCharStats(df, "id", "t", topN = 2, dupN = 2)
      .head()
    assert(r.getAs[Long]("total_chars") == 7L)
    // top 2-gram: "x y" and "y z" both n=2; tie -> lexicographically
    // smallest = "x y"; chars = 2 occurrences * 2 chars = 4/7
    assert(r.getAs[String]("top_gram") == "x y")
    assert(r.getAs[Double]("top_frac") == math.floor(4.0 / 7 * 1e6 + 0.5) / 1e6)
    assert(r.getAs[Double]("dup_frac") == math.floor(6.0 / 7 * 1e6 + 0.5) / 1e6)
    assert(!r.getAs[Boolean]("keep_rep"))

    // no repetition: dup 0; all grams n=1 so top = lexicographically first
    val clean = Seq((2L, "aa bb cc dd ee ff gg hh ii jj kk ll")).toDF("id", "t")
    val c = graft.functions.Text.ngramCharStats(clean, "id", "t", topN = 2, dupN = 2)
      .head()
    assert(c.getAs[Double]("dup_frac") == 0.0 && c.getAs[Boolean]("keep_rep"))
    assert(c.getAs[String]("top_gram") == "aa bb")
    // 1 occurrence * 4 chars of 24 total
    assert(c.getAs[Double]("top_frac") == math.floor(4.0 / 24 * 1e6 + 0.5) / 1e6)
  }

  test("bpeTrain: recount lets later rounds merge earlier merged ids") {
    import spark.implicits._
    // 4x [5,7,9] + 1x [5,7]: round 0 merges (5,7)->100 (count 5); the
    // recount then sees (100,9) four times — a pair that did not exist in
    // the original corpus and that static top-m ranking can never pick
    val df = (Seq.fill(4)(Seq(5, 7, 9)) :+ Seq(5, 7)).toDF("toks")
    val merges = graft.functions.Text.bpeTrain(df, "toks", rounds = 2, newIdBase = 100)
    assert(merges == Seq((0, 5, 7, 5L), (1, 100, 9, 4L)), merges)
    // dries up once no distinct adjacent pair remains
    val one = Seq(Seq(1, 2)).toDF("toks")
    assert(graft.functions.Text.bpeTrain(one, "toks", rounds = 5, newIdBase = 100)
      == Seq((0, 1, 2, 1L)))
  }

  test("c4 rules: terminal punct, lorem/brace/javascript boilerplate, min words") {
    import spark.implicits._
    val df = Seq(
      (1L, "good solid sentence with exactly fifteen total words here one two three four five six."),
      (2L, "no terminal punctuation here but otherwise fine words words words words words words words"),
      (3L, "short page that mentions lorem ipsum dolor sit amet in passing text words words words."),
      (4L, "a page of css rules like body { margin } that c4 drops words words words words."),
      (5L, "please enable javascript to view this page words words words words words words words."),
      (6L, "too few words here.")).toDF("id", "t")
    val out = df.select(col("id"), Text.c4Keep(col("t")).as("k"),
        Text.c4EndsPunct(col("t")).as("p"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(out(1L) == ((true, true)))
    assert(out(2L) == ((false, false))) // no terminal punctuation
    assert(!out(3L)._1 && out(3L)._2)   // lorem ipsum
    assert(!out(4L)._1)                 // curly brace
    assert(!out(5L)._1)                 // the word javascript
    assert(!out(6L)._1)                 // under min word count
  }

  test("gopher components: symbol ratio, alpha fraction, stop hits") {
    import spark.implicits._
    val df = Seq("the data value has ### and ... inside okay").toDF("t")
    val r = df.select(
      Text.gopherSymbolRatio(col("t")).as("sr"),
      Text.gopherAlphaFrac(col("t")).as("af"),
      Text.gopherStopHits(col("t")).as("sh")).head()
    assert(r.getDouble(0) == 4.0 / 9.0, r.getDouble(0)) // 3 hashes + 1 ellipsis
    assert(r.getDouble(1) == 7.0 / 9.0, r.getDouble(1)) // ### and ... non-alpha
    assert(r.getInt(2) == 3) // the, data, value; no bare 'a'
  }

  test("lineDedup: corpus-frequent lines drop from every doc; all-boiler doc empties") {
    import spark.implicits._
    val boiler = "subscribe now"
    val df = Seq(
      (1L, Seq(boiler, "unique one", "tail a")),
      (2L, Seq(boiler, "unique two")),
      (3L, Seq("unique three", boiler)),
      (4L, Seq(boiler))).toDF("doc_id", "lines")
    val out = Text.lineDedup(df, "doc_id", "lines", maxDocs = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
          r.getAs[String]("kept_text")))).toMap
    assert(out(1L) == ((3L, 2L, "unique one / tail a"))) // order preserved
    assert(out(2L) == ((2L, 1L, "unique two")))
    assert(out(3L) == ((2L, 1L, "unique three")))
    assert(out(4L) == ((1L, 0L, ""))) // every line was boilerplate
  }

  test("dsirScores: target-like raw docs score above off-target ones") {
    import spark.implicits._
    val df = Seq(
      (1L, "tgt", "common common common common common common common"),
      (2L, "tgt", "common common common common"),
      (10L, "raw", "common common common"),
      (11L, "raw", "junk junk junk")).toDF("doc_id", "src", "text")
    val out = Text.dsirScores(df, "doc_id", "text", col("src") === "tgt")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_tok"), r.getAs[Long]("dsir_score"),
          r.getAs[Boolean]("keep")))).toMap
    assert(out.keySet == Set(10L, 11L)) // only raw docs are scored
    assert(out(10L)._1 == 3L && out(11L)._1 == 3L)
    // common: ct=11, cr=3 -> bitlen(12)-bitlen(4)=4-3=1 per token;
    // junk: ct=0, cr=3 -> bitlen(1)-bitlen(4)=1-3=-2 per token
    assert(out(10L)._2 > out(11L)._2)
    assert(out(10L)._3 && !out(11L)._3)
  }

  test("dsirSelect: two-corpus weights rank target-like docs first, k bounds") {
    import spark.implicits._
    val target = Seq((100L, "alpha alpha beta"), (101L, "alpha beta beta"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha"),   // target-like
      (2L, "zap zap zap"),        // off-target
      (3L, "alpha zap beta"),     // mixed
      (4L, "beta alpha beta"))    // target-like
      .toDF("doc_id", "text")
    val w = Text.dsirWeights(raw, target, "text", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("dsir_w")).toMap
    assert(w.keySet == Set(1L, 2L, 3L, 4L)) // every raw doc scored
    assert(w(1L) > w(2L) && w(4L) > w(2L) && w(3L) > w(2L))
    val top = Text.dsirSelect(raw, target, "doc_id", "text", k = 2, buckets = 64)
      .select("doc_id").as[Long].collect().toSet
    assert(top.size == 2 && !top.contains(2L)) // k bounds, worst doc out
  }

  test("protoPrune: keeps the hardest half of each cluster, exact quota") {
    import spark.implicits._
    def v(x: Float, y: Float) = Seq(x, y)
    val df = Seq(
      (1L, v(1f, 0f)), (2L, v(0f, 1f)), // centroid seeds
      (10L, v(10f, 1f)),  // most prototypical in cluster 1 -> pruned
      (11L, v(2f, 1f)),
      (12L, v(1f, 1f)),   // least prototypical (ties to cluster 1, lowest cid)
      (20L, v(0.1f, 5f))) // singleton cluster: ceil(1/2)=1 -> kept
      .toDF("vec_id", "embedding")
    val cents = graft.functions.Similarity.ivfCentroids(df, "embedding", "vec_id", 2)
    val out = graft.functions.Similarity
      .protoPrune(df.filter(col("vec_id") >= 10), "embedding", "vec_id", cents)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("list_id"), r.getAs[Boolean]("keep")))).toMap
    assert(out(12L) == ((1L, true)))  // tie-broken to cluster 1, hardest
    assert(out(11L) == ((1L, true)))  // second hardest; quota ceil(3/2)=2
    assert(out(10L) == ((1L, false))) // most prototypical -> pruned
    assert(out(20L) == ((2L, true)))
  }
}
