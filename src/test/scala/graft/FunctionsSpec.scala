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

  test("IVF: assignment total, probe subset of brute-force, index partition-pruned") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = Similarity.ivfCentroids(embs, "embedding", "vec_id", 8)
    assert(cents.map(_._1) == (1L to 8L))
    // every vector lands in exactly one list
    val assigned = Similarity.ivfAssign(embs, "embedding", cents)
    assert(assigned.filter(col("list_id").isNull).count() == 0)
    assert(assigned.count() == embs.count())
    // ivf results: each returned row's exact sim appears in brute-force order
    val q = embs.filter(col("vec_id") === 0).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val db = embs.filter(col("vec_id") > 8)
    val ivf = Similarity.ivfTopK(db, "embedding", "vec_id", cents, q, 10, nprobe = 2).collect()
    val brute = Similarity.topK(db, "embedding", "vec_id", q.toSeq, 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ivf.length == 10)
    ivf.foreach(r => assert(brute(r.getLong(0)) == r.getDouble(2))) // same exact sims
    // probing ALL lists == brute force exactly (IVF is exact at nprobe=C)
    val full = Similarity.ivfTopK(db, "embedding", "vec_id", cents, q, 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSeq
    val bruteIds = Similarity.topK(db, "embedding", "vec_id", q.toSeq, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(full == bruteIds)
    // partitioned index: probe filter prunes partitions at the scan
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.ivfBuild(embs, "embedding", cents, idx)
    val reader = spark.read.parquet(idx).filter(col("list_id") === cents.head._1)
    val scan = reader.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(list_id"), scan.take(500))
  }

  test("PQ: codes in range, encode is zero-shuffle, ADC exact on codebook vectors") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cbs = Similarity.pqCodebooks(embs, "embedding", "vec_id", m = 4, k = 8)
    assert(cbs.length == 4 && cbs(0).length == 8 && cbs(0)(0).length == 16)
    val enc = Similarity.pqEncode(embs.filter(col("vec_id") > 8), "embedding", cbs)
    // every code is a valid codebook index
    val rng = enc.agg(min("code_0"), max("code_0"), min("code_3"), max("code_3")).collect()(0)
    assert(rng.getInt(0) >= 0 && rng.getInt(1) <= 7 && rng.getInt(3) <= 7)
    // encode + ADC scoring is pure projection — zero exchanges
    val q = embs.filter(col("vec_id") === 0).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val dt = Similarity.pqAdcTable(q, cbs)
    val scored = enc.select(col("vec_id"), Similarity.pqAdcDistance(dt).as("d"))
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "PQ encode/ADC grew an exchange:\n" + plan.take(400))
    // a CODEBOOK vector (vec_id 1..8) encodes to its own entry in every
    // subspace with per-subspace residual 0: encode it and check codes
    val self = Similarity.pqEncode(embs.filter(col("vec_id") === 3), "embedding", cbs)
      .select("code_0", "code_1", "code_2", "code_3").collect()(0)
    assert((0 until 4).forall(j => self.getInt(j) == 2), self.toString)
    // pqTopK agrees with a driver-side recomputation of ADC order
    val top = Similarity.pqTopK(enc, "vec_id", dt, 5).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val all = enc.select(col("vec_id"), col("codes")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Int](1).zipWithIndex.map { case (c, j) => dt(j)(c) }.reduceLeft(_ + _)))
      .sortBy { case (id, d) => (d, id) }.take(5).toSeq
    assert(top.toSeq == all, s"topK=$top vs driver=$all")
  }

  test("PQ refine: shortlist=N recovers the exact brute-force top-k; shortlist plan broadcasts") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cbs = Similarity.pqCodebooks(embs, "embedding", "vec_id", m = 4, k = 8)
    val q = embs.filter(col("vec_id") === 0).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val dt = Similarity.pqAdcTable(q, cbs)
    val base = embs.filter(col("vec_id") > 8)
    val enc = Similarity.pqEncode(base, "embedding", cbs)
    val n = base.count().toInt
    // with the shortlist covering the whole base, the exact re-rank IS the
    // brute-force answer — quantization loss fully recovered
    val refined = Similarity.pqTopKRefined(enc, base, "embedding", "vec_id",
      dt, q.toSeq, k = 10, shortlist = n).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = Similarity.topK(base, "embedding", "vec_id", q.toSeq, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(refined.toSeq == brute.toSeq)
    // the raw-vector read is a broadcast join on the shortlist ids
    val small = Similarity.pqTopKRefined(enc, base, "embedding", "vec_id",
      dt, q.toSeq, k = 10, shortlist = 50)
    assert(small.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("shuffleOrder: a permutation, seed-stable, different seeds differ") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val s3a = Text.shuffleOrder(docs, "doc_id", 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // positions are exactly 1..n (a permutation), and re-running is identical
    assert(s3a.values.toSeq.sorted == (1L to n).toSeq)
    val s3b = Text.shuffleOrder(docs, "doc_id", 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s3a == s3b)
    // a different epoch seed produces a genuinely different order
    val s4 = Text.shuffleOrder(docs, "doc_id", 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s3a != s4)
    val moved = s3a.count { case (id, pos) => s4(id) != pos }
    assert(moved > n / 2, s"epoch reshuffle barely moved anything: $moved/$n")
  }

  test("PQ Lloyd training keeps codebook shape and improves/holds distortion") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val init = Similarity.pqCodebooks(embs, "embedding", "vec_id", m = 4, k = 8)
    val trained = Similarity.pqTrain(embs, "embedding", init, iters = 2)
    assert(trained.length == 4 && trained.forall(_.length == 8) &&
      trained.forall(_.forall(_.length == 16)))
    // driver-side distortion: mean over rows of sum_j min_c L2²(sub_j, cb(j)(c))
    val rows = embs.select("embedding").collect().map(_.getSeq[Float](0).toArray)
    def distortion(cbs: Array[Array[Array[Float]]]): Double = {
      def l2(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d.toDouble * d; i += 1 }
        s
      }
      rows.map { v =>
        (0 until 4).map { j =>
          val subv = v.slice(j * 16, (j + 1) * 16)
          cbs(j).map(cv => l2(subv, cv)).min
        }.sum
      }.sum / rows.length
    }
    val d0 = distortion(init); val d1 = distortion(trained)
    assert(d1 <= d0 * 1.0001, s"training worsened distortion: $d0 -> $d1")
  }

  test("banded sign-LSH pairs: no false positives vs brute force, bounded buckets") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val banded = Similarity.bandedPairs(embs, "embedding", "vec_id",
      bands = 5, bitsPerBand = 12, minSim = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(banded.nonEmpty)
    // every emitted pair's sim is the exact cosine and passes the threshold
    banded.foreach { case (a, b, s) => assert(s >= 0.3 && a < b) }
    // every emitted pair collides in at least one 12-bit band
    val vecs = embs.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def bandKey(v: Seq[Float], band: Int): Int =
      (0 until 12).map(i => if (v(band * 12 + i) > 0f) 1 << i else 0).sum
    banded.foreach { case (a, b, _) =>
      assert((0 until 5).exists(k => bandKey(vecs(a), k) == bandKey(vecs(b), k)))
    }
  }

  test("banded LSH finds ALL planted near-duplicates (exact + one-band-broken)") {
    import spark.implicits._
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = embs.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val planted = base.flatMap { case (id, v) =>
      val flipped = v.clone(); flipped(0) = -flipped(0) // breaks band 0 only
      Seq((id, v.toSeq), (id + 10000L, v.toSeq), (id + 20000L, flipped.toSeq))
    }
    val df = planted.toSeq.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val found = graft.functions.Similarity.bandedPairs(df, "embedding", "vec_id",
        bands = 5, bitsPerBand = 12, minSim = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    base.foreach { case (id, _) =>
      assert(found.contains((id, id + 10000L)), s"exact dup of $id missed")
      assert(found.contains((id, id + 20000L)), s"one-flip dup of $id missed")
    }
  }

  test("cross-corpus decontamination: pairs match brute-force cross jaccard") {
    val raw = Tok.rawSequences(spark.read.parquet(s"$sfDir/documents.parquet"))
      .withColumn("doc_id", col("doc_id").cast("long"))
    val train = raw.filter(col("doc_id") % 2 === 1)
    val eval0 = raw.filter(col("doc_id") % 2 === 0)
    val got = Dedup.crossJaccard(train, eval0, "tokens", "doc_id", 3, 0.5)
      .select("train_id", "eval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: all near-dup pairs (from jaccardPairs) with opposite parity
    val all = Dedup.jaccardPairs(raw, "tokens", "doc_id", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = all.collect {
      case (a, b) if a % 2 == 1 && b % 2 == 0 => (a, b)
      case (a, b) if a % 2 == 0 && b % 2 == 1 => (b, a)
    }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("IVF indexed query: same rows as assign-on-the-fly, partition-pruned scan") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = Similarity.ivfCentroids(embs, "embedding", "vec_id", 8)
    val q = embs.filter(col("vec_id") === 0).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val db = embs.filter(col("vec_id") > 8)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivf_q").toString
    Similarity.ivfBuild(db, "embedding", cents, idx)
    val reader = spark.read.parquet(idx)
    val viaIndex = Similarity.ivfTopKIndexed(reader, "embedding", "vec_id", cents, q, 10, nprobe = 2)
    val fly = Similarity.ivfTopK(db, "embedding", "vec_id", cents, q, 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaIndex.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq == fly)
    // the probe filter must reach the scan as a PartitionFilter
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [list_id"), plan.take(800))
  }

  test("range search: brute == filtered topK tail; indexed variant partition-pruned, recall = probed lists") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = embs.filter(col("vec_id") === 0).select("embedding")
      .collect()(0).getSeq[Float](0).toSeq
    val db = embs.filter(col("vec_id") > 8)
    // brute radius == every row of the full scored set above the threshold
    // (threshold -2 accepts everything — same scoring path, so no ulp
    // divergence between the two sides)
    val got = Similarity.rangeSearch(db, "embedding", "vec_id", q, 0.15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val all = Similarity.rangeSearch(db, "embedding", "vec_id", q, -2.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got == all.filter(_._2 >= 0.15))
    assert(got.nonEmpty)
    // indexed variant: rows = brute radius RESTRICTED to the probed lists
    // (the FAISS recall bound), probe filter reaches the scan as a
    // PartitionFilter
    val cents = Similarity.ivfCentroids(embs, "embedding", "vec_id", 8)
    val idx = java.nio.file.Files.createTempDirectory("graft_ivfr_q").toString
    Similarity.ivfBuild(db, "embedding", cents, idx)
    val viaIndex = Similarity.ivfRangeIndexed(spark.read.parquet(idx),
      "embedding", "vec_id", cents, q.toArray, minSim = 0.15, nprobe = 2)
    val probed = Similarity.ivfAssign(db, "embedding", cents)
      .filter(col("list_id").isin(
        Similarity.probeLists(cents, q.toArray, 2): _*))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val gotIdx = viaIndex.collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(gotIdx == got.filter { case (id, _) => probed.contains(id) })
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [list_id"), plan.take(800))
  }

  test("IVF Lloyd training keeps centroid count and improves/holds distortion") {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val init = Similarity.ivfCentroids(embs, "embedding", "vec_id", 4)
    val trained = Similarity.ivfTrain(embs, "embedding", init, iters = 2)
    assert(trained.map(_._1) == init.map(_._1))
    assert(trained.forall(_._2.length == 64))
    // mean best-cosine (higher = tighter lists) should not degrade
    def meanBest(cs: Seq[(Long, Array[Float])]): Double = {
      val scored = cs.map { case (_, cv) =>
        Similarity.cosine(col("embedding"), typedLit(cv.toSeq)) }
      embs.select(greatest(scored: _*).as("best")).agg(avg("best")).collect()(0).getDouble(0)
    }
    assert(meanBest(trained) >= meanBest(init) - 1e-9)
  }
}
