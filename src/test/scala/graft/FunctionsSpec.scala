package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Similarity, Text}
import graft.model.Tok

/** Specs for the training-data operators: dedup, similarity, text analysis. */
class FunctionsSpec extends SparkSpec {

  private lazy val raw = Tok.rawSequences(
    spark.read.parquet(s"$sfDir/documents.parquet"))
    .withColumn("doc_id", col("doc_id").cast("long")).cache()

  test("minhash LSH candidates are a subset of exact jaccard pairs (no false positives)") {
    val exact = Dedup.jaccardPairs(raw, "tokens", "doc_id", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashCandidates(raw, "tokens", "doc_id", 3, 8, 2, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH emitted non-pairs: ${lsh -- exact}")
    // and with 8 bands of 2 rows at threshold .5 recall should be high here
    assert(lsh.nonEmpty && lsh.size >= exact.size / 2,
      s"suspiciously low recall: ${lsh.size}/${exact.size}")
  }

  test("exact dedup marks only identical texts as dups") {
    import spark.implicits._
    val df = Seq((1L, "x y z"), (2L, "x y z"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exact(df, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_dup")).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("simhash is deterministic and near-identical docs share buckets") {
    val h = raw.select(Text.simhash16(col("tokens")).as("h"))
    val h2 = raw.select(Text.simhash16(col("tokens")).as("h"))
    assert(h.collect().map(_.getInt(0)).toSeq == h2.collect().map(_.getInt(0)).toSeq)
    val range = h.agg(min("h"), max("h")).collect()(0)
    assert(range.getInt(0) >= 0 && range.getInt(1) <= 65535)
  }

  test("rolling fingerprint: order-sensitive, matches scala fold") {
    import spark.implicits._
    val toks = Seq(3, 1, 4, 1, 5)
    val want = toks.foldLeft(0L)((h, t) => (h * Text.FpBase + t) % Text.FpMod)
    val got = Seq(Tuple1(toks)).toDF("tokens")
      .select(Text.rollingFingerprint(col("tokens"))).collect()(0).getLong(0)
    assert(got == want)
    val rev = Seq(Tuple1(toks.reverse)).toDF("tokens")
      .select(Text.rollingFingerprint(col("tokens"))).collect()(0).getLong(0)
    assert(rev != got)
  }

  test("cosine: self-similarity 1, topK ordering correct") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = embs.filter(col("vec_id") === 7).select("embedding")
      .collect()(0).getSeq[Float](0).toSeq
    val self = embs.filter(col("vec_id") === 7)
      .select(Similarity.cosine(col("embedding"), typedLit(q))).collect()(0).getDouble(0)
    assert(math.abs(self - 1.0) < 1e-9)
    val top = Similarity.topK(embs, "embedding", "vec_id", q, 5).collect()
    assert(top.head.getLong(0) == 7L) // the query vector itself ranks first
    val sims = top.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("ANN bucket search returns exact top-k restricted to the query bucket") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = embs.filter(col("vec_id") === 3).select("embedding")
      .collect()(0).getSeq[Float](0).toSeq
    val ann = Similarity.annTopK(embs, "embedding", "vec_id", q, 10).collect()
    assert(ann.nonEmpty && ann.head.getLong(0) == 3L)
    // every returned id is in the query's sign bucket
    val qb = (0 until 8).map(i => if (q(i) > 0f) 1 << i else 0).sum
    val ids = ann.map(_.getLong(0)).toSet
    val buckets = embs.filter(col("vec_id").isin(ids.toSeq: _*))
      .select(Similarity.signBucket(col("embedding"), 8)).collect().map(_.getInt(0)).toSet
    assert(buckets == Set(qb))
  }

  test("langid picks first max marker language; und when none") {
    import spark.implicits._
    val df = Seq(
      "the cat sat of the mat", // en
      "le chat et la mer",      // fr
      "zzz qqq www").toDF("text") // und
    val got = df.select(Text.langId(col("text"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "fr", "und"))
  }

  test("quality score components bounded and deterministic") {
    val q = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(Text.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).collect()(0)
    assert(q.getDouble(0) >= 0.0 && q.getDouble(1) <= 1.0)
  }
}
