package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>).
  *
  * Baseline: brute-force cosine top-k — one narrow map + TakeOrdered (Spark
  * plans orderBy+limit as per-partition top-k merged on the driver, so no
  * full sort/shuffle at any scale). Scale path: sign-LSH bucketing — search
  * only the query's bucket (and optionally neighboring buckets), turning a
  * full scan into a partition-pruned one when the table is written
  * partitioned by bucket.
  */
object Similarity {

  /** dot(a, b) over float arrays, accumulated in double (deterministic
    * left-to-right fold — reproducible across runs and engines).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** cosine vs a CONSTANT vector with its norm folded driver-side once —
    * identical double arithmetic (same left-to-right fold, same op order) so
    * results are bit-equal to [[cosine]], but the per-row cost drops from
    * 3 dot products to 1. Used by every query/centroid scoring path.
    */
  def cosineToConst(a: Column, q: Seq[Float]): Column = {
    var nq = 0.0
    q.foreach(x => nq += x.toDouble * x.toDouble)
    val normQ = math.sqrt(nq)
    val d = norm(a) * lit(normQ)
    when(d === 0.0, lit(0.0)).otherwise(dot(a, typedLit(q)) / d)
  }

  /** Brute-force cosine top-k vs a literal query vector. */
  def topK(embeddings: DataFrame, embCol: String, idCol: String,
           query: Seq[Float], k: Int): DataFrame = {
    embeddings
      .select(col(idCol), round(cosineToConst(col(embCol), query), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** RANGE (radius) search: every vector with cosine >= `minSim` of the
    * query — the fixed-threshold complement of [[topK]] (FAISS
    * `range_search`). One narrow projection + filter, no global sort or
    * limit, so the plan is a single codegen'd scan stage and the result
    * set is whatever the radius admits. Scale path: compose with the IVF
    * index exactly like [[ivfTopKIndexed]] — `index.filter(col("list_id")
    * .isin(probeLists(...)))` first, then this threshold filter — so the
    * scan reads only the probed list partitions. Similarity is
    * floor-rounded to 6dp (fr6) on both engine sides: bit-stable, unlike
    * decimal HALF_UP at half boundaries.
    */
  def rangeSearch(embeddings: DataFrame, embCol: String, idCol: String,
                  query: Seq[Float], minSim: Double): DataFrame =
    embeddings
      .select(col(idCol), fr6(cosineToConst(col(embCol), query)).as("sim"))
      .filter(col("sim") >= minSim)

  /** Sign-LSH bucket id: bit i = (emb[i] > 0) for the first `nbits`
    * dimensions. Cheap, deterministic, and a valid partition key for
    * bucket-pruned ANN over a partitioned table.
    */
  def signBucket(emb: Column, nbits: Int = 8): Column =
    (0 until nbits).map(i =>
      when(element_at(emb, i + 1) > 0f, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  /** ANN: restrict the scan to rows in the query's sign bucket, then exact
    * cosine top-k within it. With the table partitioned by `bucket`, the
    * filter prunes partitions at the source.
    */
  def annTopK(embeddings: DataFrame, embCol: String, idCol: String,
              query: Seq[Float], k: Int, nbits: Int = 8): DataFrame = {
    val qBucket = (0 until nbits).map(i => if (query(i) > 0f) 1 << i else 0).sum
    topK(embeddings.filter(signBucket(col(embCol), nbits) === qBucket),
      embCol, idCol, query, k)
  }

  // ------------------------------------------------------------------
  // IVF (inverted-file) ANN — the second scale path. A coarse quantizer of
  // C centroids partitions vectors into inverted lists (list_id = nearest
  // centroid); a query probes only the nprobe nearest lists. At cluster
  // scale the lists are the partition key of the index table, so a query
  // scans nprobe/C of the data; the assignment itself is a narrow
  // broadcast-centroids map (no shuffle).
  // ------------------------------------------------------------------

  /** Deterministic coarse centroids: the embeddings of the first `c` ids.
    * (Lloyd refinement via [[ivfTrain]] is optional — IVF correctness only
    * needs SOME fixed quantizer; recall improves with training.)
    */
  def ivfCentroids(embeddings: DataFrame, embCol: String, idCol: String, c: Int): Seq[(Long, Array[Float])] =
    embeddings.filter(col(idCol) >= 1 && col(idCol) <= c)
      .select(col(idCol).cast("long"), col(embCol))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq.sortBy(_._1)

  private def cosSeq(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  /** Assign each vector its inverted-list id = argmax-cosine centroid
    * (ties -> lowest centroid id). One narrow projection over broadcast
    * centroid literals; sims rounded to 6dp so assignment is reproducible
    * across engines.
    */
  def ivfAssign(embeddings: DataFrame, embCol: String,
                centroids: Seq[(Long, Array[Float])]): DataFrame = {
    val scored = centroids.map { case (cid, cv) =>
      struct(round(cosineToConst(col(embCol), cv.toSeq), 6).as("s"),
        lit(-cid).as("negc"))
    }
    embeddings.withColumn("list_id", (-greatest(scored: _*).getField("negc")).cast("long"))
  }

  /** Prototype-based cluster pruning (Sorscher et al. 2022, "Beyond neural
    * scaling laws"): assign each embedding to its nearest centroid
    * (prototype), measure prototypicality as the cosine to that centroid,
    * and KEEP only the `keepNum/keepDen` hardest (least prototypical —
    * lowest-cosine) fraction of each cluster. The published result: pruning
    * easy/prototypical examples beats random pruning at large data scale.
    *
    * Output: id, `list_id` (cluster), `proto_cos` (6dp cosine to the
    * prototype), `keep`. The per-cluster quota is exact integer math
    * (`ceil(n·keepNum/keepDen)` as `(n·keepNum + keepDen−1) div keepDen`)
    * so both engines agree without float thresholds.
    *
    * Scale: assignment is the [[ivfAssign]] zero-exchange projection over
    * broadcast centroid literals; the rank-within-cluster window shuffles
    * once keyed on `list_id` with per-key populations bounded by the
    * cluster size — the same C-scales-with-N contract as
    * [[graft.functions.Dedup.semDedup]] (keep cluster populations fixed as
    * the corpus grows and no reducer ever sees more than one cluster).
    */
  def protoPrune(embeddings: DataFrame, embCol: String, idCol: String,
                 centroids: Seq[(Long, Array[Float])],
                 keepNum: Int = 1, keepDen: Int = 2): DataFrame = {
    val scored = centroids.map { case (cid, cv) =>
      struct(round(cosineToConst(col(embCol), cv.toSeq), 6).as("s"),
        lit(-cid).as("negc"))
    }
    val best = greatest(scored: _*)
    val asg = embeddings.select(col(idCol),
      (-best.getField("negc")).cast("long").as("list_id"),
      best.getField("s").as("proto_cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("list_id").orderBy(col("proto_cos").asc, col(idCol).asc)
    val cw = org.apache.spark.sql.expressions.Window.partitionBy("list_id")
    asg.withColumn("_rk", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(cw))
      .withColumn("keep",
        col("_rk") <= floor((col("_n") * keepNum + (keepDen - 1)) / keepDen))
      .drop("_rk", "_n")
  }

  /** Driver-side probe ranking: top-`nprobe` centroid ids by cosine vs the
    * query, rounded HALF_UP to 6dp — the SAME rounding as the engine path's
    * round(x, 6) and the DuckDB oracle, so a similarity landing exactly on a
    * 0.5e-6 boundary probes the same lists everywhere.
    */
  private[graft] def probeLists(centroids: Seq[(Long, Array[Float])],
                                query: Array[Float], nprobe: Int): Seq[Long] =
    centroids
      .map { case (cid, cv) =>
        (cid, BigDecimal(cosSeq(cv, query))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (cid, s) => (-s, cid) }.take(nprobe).map(_._1)

  /** IVF query: rank centroids vs the query on the driver (same fold, same
    * 6dp rounding), probe the top `nprobe` lists, exact cosine top-k within.
    */
  def ivfTopK(embeddings: DataFrame, embCol: String, idCol: String,
              centroids: Seq[(Long, Array[Float])], query: Array[Float],
              k: Int, nprobe: Int): DataFrame = {
    val probed = probeLists(centroids, query, nprobe)
    val assigned = ivfAssign(embeddings, embCol, centroids)
      .filter(col("list_id").isin(probed: _*))
    assigned.select(col(idCol), col("list_id"),
        round(cosineToConst(col(embCol), query.toSeq), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF query over a PRE-BUILT partitioned index (the [[ivfBuild]] output):
    * the probe filter is a partition-column predicate, so the scan reads only
    * the nprobe list directories — query cost O(N * nprobe / C) instead of
    * the O(N * C) a full re-assignment pays. This is the 100 TB query path;
    * [[ivfTopK]] (assign-on-the-fly) remains for index-less one-shot use.
    */
  def ivfTopKIndexed(index: DataFrame, embCol: String, idCol: String,
                     centroids: Seq[(Long, Array[Float])], query: Array[Float],
                     k: Int, nprobe: Int): DataFrame = {
    val probed = probeLists(centroids, query, nprobe)
    index
      .filter(col("list_id").isin(probed: _*)) // partition pruning at the scan
      .select(col(idCol), col("list_id").cast("long").as("list_id"),
        round(cosineToConst(col(embCol), query.toSeq), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** RANGE search through a PRE-BUILT partitioned IVF index (the
    * [[ivfBuild]] output): probe the top `nprobe` lists like
    * [[ivfTopKIndexed]] — a partition-column predicate, so the scan reads
    * only the probed list directories — then keep every vector within
    * cosine >= `minSim` of the query. The at-scale form of
    * [[rangeSearch]]: query cost O(N * nprobe / C), no global sort, and
    * like any IVF query the recall bound is the probed lists (a
    * qualifying vector assigned to an unprobed list is not returned —
    * raise nprobe for recall, FAISS semantics).
    */
  def ivfRangeIndexed(index: DataFrame, embCol: String, idCol: String,
                      centroids: Seq[(Long, Array[Float])], query: Array[Float],
                      minSim: Double, nprobe: Int): DataFrame = {
    val probed = probeLists(centroids, query, nprobe)
    index
      .filter(col("list_id").isin(probed: _*)) // partition pruning at the scan
      .select(col(idCol), col("list_id").cast("long").as("list_id"),
        fr6(cosineToConst(col(embCol), query.toSeq)).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Build a partitioned IVF index table: assign + write partitioned by
    * `list_id`, so probe filters prune partitions at the source. Returns the
    * reader frame.
    */
  def ivfBuild(embeddings: DataFrame, embCol: String,
               centroids: Seq[(Long, Array[Float])], path: String): Unit =
    ivfAssign(embeddings, embCol, centroids)
      .write.mode("overwrite").partitionBy("list_id").parquet(path)

  /** Lloyd refinement of the coarse quantizer (k-means, `iters` rounds):
    * assign -> per-list per-dimension mean -> new centroids. Runs on a
    * sample at scale (training is offline); each round is one posexplode +
    * groupBy over rows x dims.
    */
  def ivfTrain(embeddings: DataFrame, embCol: String,
               init: Seq[(Long, Array[Float])], iters: Int): Seq[(Long, Array[Float])] = {
    var cents = init
    for (_ <- 0 until iters) {
      val updated = ivfAssign(embeddings, embCol, cents)
        .select(col("list_id"), posexplode(col(embCol)).as(Seq("pos", "v")))
        .groupBy("list_id", "pos").agg(avg("v").as("mean"))
        .groupBy("list_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("mean")))).as("ps"))
        .select(col("list_id"), transform(col("ps"), p => p.getField("mean").cast("float")).as("cv"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
      // empty lists keep their previous centroid (standard Lloyd convention)
      cents = cents.map { case (cid, cv) => (cid, updated.getOrElse(cid, cv)) }
    }
    cents
  }

  // ------------------------------------------------------------------
  // Product quantization (PQ) — the third scale path (Jégou et al. 2011,
  // the FAISS IVF-PQ construction). Split the d-dim space into m subspaces;
  // quantize each subvector to one of k codebook entries; a vector becomes
  // m small ints (m bytes at k<=256) instead of d floats — at d=64/m=4 a
  // 64x index-size cut — and query scoring becomes m table LOOKUPS (ADC,
  // asymmetric distance computation) instead of d multiplies: per-row cost
  // is dimension-independent. At 100 TB the PQ code table is what gets
  // scanned (codes only, raw vectors stay cold), and it composes with the
  // IVF index: partition-prune lists first, ADC-score the survivors.
  // ------------------------------------------------------------------

  /** floor-round to 6dp in pure IEEE double math (floor(x*1e6+0.5)/1e6) —
    * bit-stable across engines, unlike decimal HALF_UP round(x,6) which can
    * disagree exactly at half boundaries.
    */
  private def fr6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
  private def fr6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Left-to-right double fold — the same op order as [[dot]] and DuckDB's
    * list_dot_product, so driver-side table entries are bit-equal to what
    * the engines compute from the same floats.
    */
  private def dotSeq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Deterministic PQ codebooks: entry (j, c) = subvector j of the vector
    * with id c+1 — the same fixed-quantizer convention as [[ivfCentroids]]
    * (k-means refinement improves recall but is orthogonal to the encode/
    * ADC machinery, and a fixed quantizer keeps the oracle exact).
    */
  def pqCodebooks(embeddings: DataFrame, embCol: String, idCol: String,
                  m: Int, k: Int): Array[Array[Array[Float]]] = {
    val rows = embeddings.filter(col(idCol) >= 1 && col(idCol) <= k)
      .select(col(idCol).cast("long"), col(embCol))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    require(rows.length == k, s"pqCodebooks: need ids 1..$k present, got ${rows.length}")
    val dim = rows.head._2.length
    require(dim % m == 0, s"pqCodebooks: dim $dim not divisible by m=$m")
    val sub = dim / m
    Array.tabulate(m, k)((j, c) => rows(c)._2.slice(j * sub, (j + 1) * sub))
  }

  /** PQ-encode: per subspace j, code = argmin over codebook entries of
    * L2²(subvector, entry), distances floor-rounded to 6dp (ties -> lowest
    * code) so assignment is reproducible across engines. ONE narrow
    * projection over broadcast codebook literals — no shuffle; the L2² is
    * expanded as dot(a,a) - 2·dot(a,c) + dot(c,c) with the constant dot(c,c)
    * folded driver-side. Output: `code_0..code_{m-1}` ints + a `codes`
    * array — the m-byte row representation an index table persists.
    */
  def pqEncode(embeddings: DataFrame, embCol: String,
               codebooks: Array[Array[Array[Float]]]): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val withCodes = (0 until m).foldLeft(embeddings) { (d, j) =>
      val subv = slice(col(embCol), j * sub + 1, sub)
      val scored = codebooks(j).zipWithIndex.map { case (cv, c) =>
        val d2 = dot(subv, subv) - lit(2.0) * dot(subv, typedLit(cv.toSeq)) +
          lit(dotSeq(cv, cv))
        struct(fr6(d2).as("d"), lit(c).as("code"))
      }
      // k=1 degenerates to code 0 (least() needs >=2 args)
      val code = if (scored.length == 1) lit(0)
        else least(scored.toSeq: _*).getField("code")
      d.withColumn(s"code_$j", code)
    }
    withCodes.withColumn("codes",
      array((0 until m).map(j => col(s"code_$j")): _*))
  }

  /** ADC lookup table for one query: dtable(j)(c) = floor-rounded
    * L2²(query subvector j, codebook(j)(c)), computed ONCE driver-side with
    * the same left-to-right fold as the engine paths. m×k doubles — the
    * per-query cost that replaces any per-row vector math.
    */
  def pqAdcTable(query: Array[Float],
                 codebooks: Array[Array[Array[Float]]]): Array[Array[Double]] = {
    val sub = codebooks(0)(0).length
    Array.tabulate(codebooks.length, codebooks(0).length) { (j, c) =>
      val qs = query.slice(j * sub, (j + 1) * sub)
      val cv = codebooks(j)(c)
      fr6d(dotSeq(qs, qs) - 2.0 * dotSeq(qs, cv) + dotSeq(cv, cv))
    }
  }

  /** Approximate distance of an ENCODED row to the query: m literal-array
    * lookups summed in explicit left-to-right order (deterministic double
    * addition). Reads only the code columns — scoring cost is independent
    * of the embedding dimension, and a scan over a codes-only table moves
    * m bytes/row instead of 4·d.
    */
  def pqAdcDistance(dtable: Array[Array[Double]]): Column =
    dtable.zipWithIndex.map { case (row, j) =>
      // a pre-encoded codes table from a DIFFERENT k (or a corrupt code)
      // must fail with a named error, not ANSI's opaque out-of-range (and
      // never rank null-first in the top-k)
      val c = col(s"code_$j")
      when(c.between(0, row.length - 1), element_at(typedLit(row.toSeq), c + 1))
        .otherwise(raise_error(concat(
          lit(s"pqAdcDistance: code_$j out of range for k=${row.length}: "),
          c.cast("string"))))
    }.reduceLeft(_ + _)

  /** Lloyd refinement of PQ codebooks (k-means per subspace, `iters`
    * rounds): encode -> per-(subspace, code) per-dimension mean -> new
    * entries; empty cells keep their previous entry. ONE posexplode over the
    * full embedding per round (subspace j = pos / sub, the per-row codes
    * array supplies j's code) — a single scan per iteration; at corpus
    * scale training runs on a sample (it's offline) — encode/ADC are what
    * touch the full data.
    */
  def pqTrain(embeddings: DataFrame, embCol: String,
              init: Array[Array[Array[Float]]], iters: Int): Array[Array[Array[Float]]] = {
    var cbs = init
    val m = init.length
    val sub = init(0)(0).length
    for (_ <- 0 until iters) {
      val enc = pqEncode(embeddings, embCol, cbs)
      val parts = enc
        .select(col("codes"), posexplode(col(embCol)).as(Seq("fullpos", "v")))
        .select((col("fullpos") / sub).cast("int").as("j"),
          element_at(col("codes"), (col("fullpos") / sub).cast("int") + 1).as("code"),
          pmod(col("fullpos"), lit(sub)).as("pos"), col("v"))
      val updated = parts.groupBy("j", "code", "pos").agg(avg("v").as("mean"))
        .groupBy("j", "code")
        .agg(array_sort(collect_list(struct(col("pos"), col("mean")))).as("ps"))
        .select(col("j"), col("code"),
          transform(col("ps"), p => p.getField("mean").cast("float")).as("cv"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Float](2).toArray)).toMap
      cbs = Array.tabulate(m, init(0).length)((j, c) => updated.getOrElse((j, c), cbs(j)(c)))
    }
    cbs
  }

  /** PQ top-k: encode (or read a pre-encoded codes table) + ADC-score +
    * TakeOrdered — per-partition top-k merged on the driver, no global sort.
    */
  def pqTopK(encoded: DataFrame, idCol: String,
             dtable: Array[Array[Double]], k: Int): DataFrame =
    encoded.select(col(idCol), pqAdcDistance(dtable).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol))
      .limit(k)

  /** Two-stage PQ search with EXACT re-rank (the FAISS `refine` stage):
    * ADC-score the compressed codes, keep the `shortlist` nearest (ties by
    * id), then re-score ONLY those rows with the exact cosine against the
    * raw vectors and return the true top `k`. The ADC pass touches codes
    * only (compressed, dimension-independent per-row cost); the raw-vector
    * read is a `shortlist`-sized broadcast semi-join back onto the base
    * table — so at 100 TB the full-precision vectors stay cold except for
    * O(shortlist) rows per query, while recall recovers what quantization
    * lost. Composes with IVF the same way [[ivfTopKIndexed]] does (prune
    * lists first, ADC the survivors, refine the shortlist).
    */
  def pqTopKRefined(encoded: DataFrame, raw: DataFrame, embCol: String,
                    idCol: String, dtable: Array[Array[Double]],
                    query: Seq[Float], k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val cand = pqTopK(encoded, idCol, dtable, shortlist).select(col(idCol))
    topK(raw.join(broadcast(cand), Seq(idCol)), embCol, idCol, query, k)
  }

  /** Sign-LSH band bucket id for band `b`: bit i = (emb[b*bitsPerBand+i] > 0).
    * Each band is a SEPARATE, narrow bucket key — 2^bitsPerBand buckets per
    * band — so per-bucket population shrinks exponentially with bitsPerBand
    * while `bands` independent attempts keep recall.
    */
  private def bandBucket(emb: Column, band: Int, bitsPerBand: Int): Column =
    (0 until bitsPerBand).map(i =>
      when(element_at(emb, band * bitsPerBand + i + 1) > 0f, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  /** Embedding near-dup candidate pairs via BANDED sign-LSH (the MinHash-band
    * construction over hyperplane sign bits): a pair is a candidate iff it
    * collides in ANY band's bucket. Unlike a single wide bucket key (which is
    * all-pairs over N/2^nbits rows — quadratic at corpus scale), every band
    * here has 2^bitsPerBand buckets, so bucket population is N/2^bitsPerBand
    * per band and `bands` bands recover recall; scale bitsPerBand with corpus
    * size to bound the per-bucket self-join. Pairs are deduplicated across
    * bands BEFORE the CPU-heavy exact-cosine verify, then spread explicitly
    * (AQE coalesces byte-small candidate partitions onto one core otherwise).
    */
  def bandedPairs(embeddings: DataFrame, embCol: String, idCol: String,
                  bands: Int = 5, bitsPerBand: Int = 12,
                  minSim: Double = 0.9): DataFrame = {
    // guard: past the embedding dimension element_at yields null, which would
    // silently collapse the overflow bands' buckets to a constant — the exact
    // all-pairs blowup this construction exists to prevent
    embeddings.schema(embCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(_, _) => ()
      case t => throw new IllegalArgumentException(s"bandedPairs: $embCol is $t, need array")
    }
    embeddings.select(size(col(embCol))).limit(1).collect().headOption.foreach { r =>
      val dim = r.getInt(0)
      require(dim >= bands * bitsPerBand,
        s"bandedPairs: bands*bitsPerBand = ${bands * bitsPerBand} exceeds embedding dim $dim — " +
          "lower bands or bitsPerBand (hash bits must come from real coordinates)")
    }
    val base = embeddings.select(col(idCol).as("id"), col(embCol).as("emb"))
    val banded = base.select(col("id"), col("emb"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandBucket(col("emb"), b, bitsPerBand).as("bk"))): _*)).as("bb"))
      .select(col("id"), col("emb"), col("bb.band").as("band"), col("bb.bk").as("bk"))
    val a = banded.select(col("band"), col("bk"), col("id").as("id_a"), col("emb").as("emb_a"))
    val b2 = banded.select(col("band"), col("bk"), col("id").as("id_b"), col("emb").as("emb_b"))
    val parallelism = embeddings.sparkSession.sparkContext.defaultParallelism
    a.join(b2, Seq("band", "bk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("emb_a"), col("emb_b"))
      .dropDuplicates("id_a", "id_b")
      .repartition(parallelism, col("id_a"), col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("emb_a"), col("emb_b")), 6).as("sim"))
      .filter(col("sim") >= minSim)
  }
}
