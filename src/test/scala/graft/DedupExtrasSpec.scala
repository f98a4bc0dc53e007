package graft

import org.apache.spark.sql.functions._
import graft.functions.Dedup

/** Edit-distance near-dup confirm and bloom-gated incremental dedup. */
class DedupExtrasSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String, Seq[Long])]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "tokens")
  }

  test("editPairs confirms banded candidates by Levenshtein similarity") {
    // docs 1/2: identical token shingles (guaranteed band collision) and
    // near-identical text -> confirmed. doc 3: same shingles but unrelated
    // text -> candidate REJECTED by the confirm. docs 4/5: identical text
    // but disjoint shingles -> never a candidate (LSH recall bound).
    val toks = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val d = docsDf(Seq(
      (1L, "the quick brown fox jumps over the dog", toks),
      (2L, "the quick brown fox jumps over the hog", toks),
      (3L, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss", toks),
      (4L, "identical text no shared shingles here", Seq(10L, 11L, 12L, 13L)),
      (5L, "identical text no shared shingles here", Seq(20L, 21L, 22L, 23L))))
    val got = Dedup.editPairs(d, "text", "tokens", "doc_id", simThreshold = 0.8)
      .select("id_a", "id_b", "lev").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2L, 1)))
  }

  test("LevenshteinBand == builtin levenshtein-with-threshold on random strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabets = Seq("ab", "abcde", "abcdefghij", "aéb☃c") // incl. non-ASCII
    val cases = for (i <- 0 until 400) yield {
      val al = alphabets(i % alphabets.size)
      def str(n: Int) = Seq.fill(n)(al(rnd.nextInt(al.length))).mkString
      (str(rnd.nextInt(30)), str(rnd.nextInt(30)), rnd.nextInt(12))
    }
    val df = cases.toDF("a", "b", "bound")
    // builtin 3-arg levenshtein needs a literal bound -> check per distinct bound
    val bad = (0 until 12).flatMap { k =>
      df.filter(col("bound") === k)
        .select(col("a"), col("b"),
          graft.plans.TextDist.levenshteinBand(col("a"), col("b"), k).as("got"),
          levenshtein(col("a"), col("b"), k).as("want"))
        .filter(col("got") =!= col("want")).collect()
    }
    assert(bad.isEmpty, bad.take(5).mkString("; "))
  }

  test("editPairs edit_sim quantization matches the floor(x*1e6+0.5)/1e6 rule") {
    val toks = Seq(1L, 2L, 3L, 4L)
    val d = docsDf(Seq(
      (1L, "abcdefghij", toks),   // len 10
      (2L, "abcdefghiX", toks)))  // lev 1 -> sim 0.9
    val row = Dedup.editPairs(d, "text", "tokens", "doc_id", simThreshold = 0.5)
      .select("edit_sim").collect()
    assert(row.map(_.getDouble(0)).toSeq == Seq(0.9))
  }

  test("incrementalNew equals the exact anti-join, with forced bloom false positives") {
    import spark.implicits._
    val history = (0 until 200).map(i => (i.toLong, s"hist text $i")).toDF("doc_id", "text")
    // incoming: half duplicate history texts, half genuinely new
    val incoming = (0 until 100).map { i =>
      if (i % 2 == 0) (1000L + i, s"hist text ${i * 2}") else (1000L + i, s"new text $i")
    }.toDF("doc_id", "text")
    // expectedItems=8 on a 200-row history -> saturated sketch, fpp near 1:
    // nearly every incoming row takes the confirm path; result must be exact
    val got = Dedup.incrementalNew(history, incoming, "text",
      expectedItems = 8, fpp = 0.5)
    val want = incoming.join(history.select("text"), Seq("text"), "left_anti")
    assert(got.count() == 50)
    assert(got.select("doc_id").except(want.select("doc_id")).isEmpty)
    assert(want.select("doc_id").except(got.select("doc_id")).isEmpty)
  }

  test("incrementalNew plan: codegen'd bloom probe, broadcast-only joins") {
    // range-backed frames (a Seq.toDF LocalRelation would let the optimizer
    // evaluate the bloom probe driver-side and fold the filter away)
    val history = spark.range(500)
      .select(col("id").as("doc_id"), concat(lit("h "), col("id")).as("text"))
    val incoming = spark.range(100)
      .select(col("id").as("doc_id"), concat(lit("h "), col("id") * 3).as("text"))
    val plan = Dedup.incrementalNew(history, incoming, "text", expectedItems = 512)
      .queryExecution.executedPlan.toString
    // the probe is a native expression inside codegen, not a UDF seam
    assert(plan.contains("bloom_might_contain_long"), plan)
    // history is never shuffled: both joins build a broadcast side
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
