package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Similarity, Text}
import graft.model.Tok

/** Driver-gate queries for the training-data-pipeline operators: text
  * analysis, deduplication, fingerprinting, embedding similarity. Oracle SQL
  * is generated from the same constants as the Spark expressions.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  // shared DuckDB fragments, generated from the same constants
  private val P = Text.FpMod
  private def sqlShingles(k: Int = 3): String = {
    val terms = (0 until k).map(j =>
      s"tokens[i+$j]*${math.pow(Text.ShingleBase.toDouble, (k - 1 - j).toDouble).toLong}").mkString(" + ")
    s"CASE WHEN n_tok < $k THEN [] ELSE list_transform(generate_series(1, n_tok-${k - 1}), i -> $terms) END"
  }
  private def sqlSimhash16(tokensExpr: String): String = {
    val knuth = 2654435761L
    val bits = (0 until 16).map { j =>
      val pow = 1L << j
      s"(CASE WHEN list_sum(list_transform($tokensExpr, t -> CASE WHEN ((t*${knuth}) % 4294967296) // $pow % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN $pow ELSE 0 END)"
    }
    s"CAST(${bits.mkString("(", " + ", ")")} AS INTEGER)"
  }
  private def sqlMinhashSig(shinglesExpr: String, numHashes: Int): String = {
    val mins = (0 until numHashes).map { j =>
      val a = 2L * j + 1; val b = j.toLong * j + 7
      s"coalesce(list_min(list_transform($shinglesExpr, s -> (s*$a + $b) % $P)), $P)"
    }
    mins.mkString("[", ", ", "]")
  }

  /** Shared keep-set CTE chain (raw -> exact collapse -> banded LSH pairs)
    * used by the dedup_keep AND doc_curate oracles — one source of truth.
    */
  private def sqlKeepCtes: String = {
    val bands = 8; val rpb = 2
    val bandKeys = (0 until bands).map { b =>
      val slice = (0 until rpb).map(r => s"CAST(sig[${b * rpb + r + 1}] AS VARCHAR)").mkString(" || '-' || ")
      s"SELECT id, shset, $b AS band, $slice AS bh FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""${Tok.sqlRawSequences},
       |idd AS (SELECT CAST(doc_id AS BIGINT) AS id, tokens, n_tok FROM raw),
       |reps AS (
       |  SELECT id, tokens, n_tok FROM (
       |    SELECT *, row_number() OVER (PARTITION BY array_to_string(tokens, ',') ORDER BY id) AS rk
       |    FROM idd) WHERE rk = 1),
       |sigs AS (
       |  SELECT id,
       |         list_distinct(${sqlShingles(3)}) AS shset,
       |         ${sqlMinhashSig(s"list_distinct(${sqlShingles(3)})", bands * rpb)} AS sig
       |  FROM reps),
       |banded AS (
       |  $bandKeys
       |), pairs AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
       |  WHERE CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE) /
       |        len(list_distinct(list_concat(a.shset, b.shset))) >= 0.5),
       |keep AS (SELECT id FROM reps WHERE id NOT IN (SELECT id_b FROM pairs))""".stripMargin
  }

  /** Shared curation-decision CTE chain (keep-set + langid + quality) —
    * one source of truth for the doc_curate AND txt_e2e oracles. Extends
    * [[sqlKeepCtes]] with `lang` (doc_id, lang_guess) and `q`
    * (doc_id, quality) CTEs.
    */
  private def sqlCurateCtes: String = {
    val hits = Text.LangMarkers.map { case (lang, ms) =>
      val inList = ms.map(m => s"'$m'").mkString("(", ",", ")")
      s"len(list_filter(string_split(text,' '), w -> w IN $inList)) AS h_$lang"
    }.mkString(",\n         ")
    val best = Text.LangMarkers.map(m => s"h_${m._1}").mkString("greatest(", ", ", ")")
    val pick = Text.LangMarkers.foldRight("'und'") { case ((lang, _), acc) =>
      s"CASE WHEN h_$lang = best AND best > 0 THEN '$lang' ELSE $acc END"
    }
    s"""$sqlKeepCtes,
       |scored AS (SELECT doc_id, $hits FROM documents),
       |best_t AS (SELECT *, $best AS best FROM scored),
       |lang AS (SELECT doc_id, $pick AS lang_guess FROM best_t),
       |w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |q AS (
       |  SELECT doc_id,
       |         round(least(CAST(len(words) AS DOUBLE) / 100.0, 1.0) * 0.4
       |           + (CAST(len(list_distinct(words)) AS DOUBLE) / len(words)) * 0.4
       |           + (1.0 - CAST(len(list_filter(words, x -> x IN ('the','a'))) AS DOUBLE) / len(words)) * 0.2, 6) AS quality
       |  FROM w),
       |qq AS (
       |  SELECT doc_id,
       |         floor((least(CAST(len(words) AS DOUBLE) / 100.0, 1.0) * 0.4
       |           + (CAST(len(list_distinct(words)) AS DOUBLE) / len(words)) * 0.4
       |           + (1.0 - CAST(len(list_filter(words, x -> x IN ('the','a'))) AS DOUBLE) / len(words)) * 0.2) * 1e6 + 0.5) / 1e6 AS qualityq
       |  FROM w)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // language-ID heuristic (marker stopwords, first-max-wins)
    "txt_langid" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), Text.langId(col("text")).as("lang_guess"),
          Text.markerHits(col("text"), Text.LangMarkers.head._2).as("en_hits"))
        .orderBy("doc_id")
    }),

    // quality scoring: components + composite
    "txt_quality" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"),
        Text.nWords(col("text")).as("n_words"),
        round(Text.distinctRatio(col("text")), 6).as("distinct_ratio"),
        round(Text.stopwordRatio(col("text")), 6).as("stop_ratio"),
        round(Text.meanWordLen(col("text")), 6).as("mean_wlen"),
        Text.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    // source-weighted mixture assembly: deterministic up-/down-sampling per
    // source (2.5x src0, 0.4x src1, 1x rest) via the hash01 copies rule
    "txt_mix" -> ((s, dir) => {
      Text.mixBySource(docs(s, dir), "doc_id", "source",
          Map("src0" -> 2.5, "src1" -> 0.4))
        .select(col("doc_id"), col("source"), col("rep"))
        .orderBy("doc_id", "rep")
    }),

    // PII redaction: emails/IPv4s/phones -> typed placeholders, plus audit
    // counts; pii-bearing text synthesized deterministically onto each doc
    "txt_pii" -> ((s, dir) => {
      val uid = col("doc_id").cast("long")
      val piiText = concat(col("text"),
        lit(" contact u"), (uid % 7).cast("string"), lit("@mail"),
        (uid % 3).cast("string"), lit(".com or +1 555-01"), (uid % 90 + 10).cast("string"),
        lit(" at 10."), (uid % 200).cast("string"), lit(".0."), (uid % 250).cast("string"))
      docs(s, dir).select(col("doc_id"),
        Text.redactPii(piiText).as("redacted"),
        Text.piiCount(piiText, Text.PiiEmail).as("n_email"),
        Text.piiCount(piiText, Text.PiiIpv4).as("n_ip"),
        Text.piiCount(piiText, Text.PiiPhone).as("n_phone"))
        .orderBy("doc_id")
    }),

    // URL canonicalization + dedup: each doc gets a deterministic MESSY url
    // (case-shuffled scheme/host, default ports, tracking params, duplicate
    // slashes, trailing slash, fragment); the oracle constructs the EXPECTED
    // canonical form analytically, so the gate verifies the normalizer
    // rather than mirroring it. Dedup keeps min doc_id per canonical key —
    // the shuffle key is the canonical url, never the raw text.
    "txt_urlnorm" -> ((s, dir) => {
      val d = col("doc_id")
      val url = concat(
        when(d % 3 === 0, lit("HTTP://")).when(d % 3 === 1, lit("https://"))
          .otherwise(lit("Http://")),
        lit("WWW.Site"), (d % 7).cast("string"), lit(".COM"),
        when(d % 4 === 0, when(d % 3 === 1, lit(":443")).otherwise(lit(":80")))
          .otherwise(lit("")),
        lit("/A/"), (d % 50).cast("string"),
        when(d % 5 === 0, lit("//b")).otherwise(lit("")),
        when(d % 2 === 1 && d % 3 === 1, lit("/")).otherwise(lit("")),
        when(d % 2 === 0,
          when(d % 10 === 0, lit("?utm_source=x&utm_medium=y"))
            .otherwise(concat(lit("?utm_source=x&q="), (d % 10).cast("string"))))
          .otherwise(lit("")),
        when(d % 3 === 0, lit("#sec")).otherwise(lit("")))
      docs(s, dir).select(Text.urlNormalize(url).as("canon"), d)
        .groupBy("canon")
        .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
        .orderBy("canon")
    }),

    // repetition filters (Gopher-style): duplicate word / 2-gram / 3-gram
    // fractions + the composed keep decision, all narrow HOFs on the scan
    "txt_rep" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      docs(s, dir).select(col("doc_id"),
        Text.dupFrac(ws).as("dup_word_frac"),
        Text.dupFrac(Text.wordBigrams(ws)).as("dup_bigram_frac"),
        Text.dupFrac(Text.wordTrigrams(ws)).as("dup_trigram_frac"),
        Text.repetitionKeep(ws).as("keep_rep"))
        .orderBy("doc_id")
    }),

    // token counting: whitespace + BPE-ish regex over the punct-rich props
    "txt_tokcount" -> ((s, dir) => {
      s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"),
          Text.tokenCountWs(col("props")).as("tok_ws"),
          Text.tokenCountBpe(col("props")).as("tok_bpe"))
        .orderBy("event_id")
    }),

    // document fingerprinting: rolling polynomial hash + simhash
    "txt_fingerprint" -> ((s, dir) => {
      Tok.rawSequences(docs(s, dir))
        .select(col("doc_id"),
          Text.rollingFingerprint(col("tokens")).as("roll_fp"),
          Text.simhash16(col("tokens")).as("simhash"))
        .orderBy("doc_id")
    }),

    // exact dedup flags
    "dedup_exact" -> ((s, dir) => {
      Dedup.exact(docs(s, dir), "text", "doc_id")
        .select(col("doc_id"), col("content_hash"), col("is_dup"))
        .orderBy("doc_id")
    }),

    // n-gram Jaccard near-dup pairs via shingle inverted index
    "dedup_jaccard" -> ((s, dir) => {
      // numeric ids so pair orientation (a < b) matches the BIGINT oracle
      val raw = Tok.rawSequences(docs(s, dir)).withColumn("doc_id", col("doc_id").cast("long"))
      Dedup.jaccardPairs(raw, "tokens", "doc_id", shingleK = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // MinHash+LSH banding candidates (verified with exact Jaccard)
    "dedup_minhash" -> ((s, dir) => {
      val raw = Tok.rawSequences(docs(s, dir)).withColumn("doc_id", col("doc_id").cast("long"))
      Dedup.minhashCandidates(raw, "tokens", "doc_id",
        shingleK = 3, bands = 8, rowsPerBand = 2, jaccardThreshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // batch SHADOW of the streaming sketch-state near-dedup (nearDupStream
    // run as one micro-batch): dup_of = lowest earlier id sharing an LSH
    // band bucket with >= 8/16 equal minhash components — the estimator
    // rule the stream applies against checkpointed sketches
    "dedup_stream" -> ((s, dir) => {
      val raw = Tok.rawSequences(docs(s, dir)).withColumn("doc_id", col("doc_id").cast("long"))
      Dedup.reduceNearDup(Dedup.nearDupStream(s, raw, "tokens", "doc_id"))
        .orderBy("id")
    }),

    // EDIT-DISTANCE near-dup confirm: the same LSH band candidates as
    // dedup_minhash, each verified with Levenshtein similarity over the raw
    // text (integer DP — bit-identical across engines) instead of Jaccard
    "dedup_edit" -> ((s, dir) => {
      val d = docs(s, dir)
        .withColumn("doc_id", col("doc_id").cast("long"))
        .withColumn("tokens", Tok.tokenize(col("text")))
      Dedup.editPairs(d, "text", "tokens", "doc_id",
        shingleK = 3, bands = 8, rowsPerBand = 2, simThreshold = 0.8)
        .orderBy("id_a", "id_b")
    }),

    // INCREMENTAL dedup: new-snapshot rows not already in the corpus
    // history — bloom-gated candidates, broadcast-confirmed, zero history
    // shuffle. History = 80% of docs (doc_id % 5 != 4); incoming = the even
    // half; survivors = even docs outside history. The deliberately
    // UNDERSIZED sketch (high fpp) forces real false positives through the
    // exact-confirm path — the result must stay exact regardless.
    "dedup_incr" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.incrementalNew(
          d.filter(col("doc_id") % 5 =!= 4),
          d.filter(col("doc_id") % 2 === 0),
          "text", expectedItems = 64, fpp = 0.3)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // near-dup CLUSTERING: Jaccard pairs -> connected components (iterative
    // min-label propagation over the edge list) -> cluster id per document
    // (min doc_id transitively reachable; singletons cluster to themselves)
    // + canonical flag. The closure is what id-ordered pair-dropping can't
    // express: A~B, B~C, A!~C still collapse to ONE cluster
    "dedup_cc" -> ((s, dir) => {
      val raw = Tok.rawSequences(docs(s, dir)).withColumn("doc_id", col("doc_id").cast("long"))
      Dedup.dupClusters(raw, "tokens", "doc_id", shingleK = 3, threshold = 0.5)
        .orderBy("doc_id")
    }),

    // the dedup DECISION: exact-collapse -> near-dup pairs among reps ->
    // drop higher-id side; output = kept doc_ids
    "dedup_keep" -> ((s, dir) => {
      Dedup.keepSet(Tok.rawSequences(docs(s, dir)), "tokens", "doc_id",
          shingleK = 3, bands = 8, rowsPerBand = 2, jaccardThreshold = 0.5)
        .orderBy("doc_id")
    }),

    // deterministic STRATIFIED sampling: per-source keep rates over the
    // same hash buckets as the split assignment (replayable downsampling)
    "doc_sample" -> ((s, dir) => {
      docs(s, dir).select(col("source"),
          Text.sampleKeep(col("doc_id"), col("source"),
            Seq("src0" -> 50, "src1" -> 10, "src2" -> 0), defaultPct = 25).as("keep"))
        .groupBy("source", "keep").agg(count(lit(1)).as("n"))
        .orderBy("source", "keep")
    }),

    // EXACT stratified sampling: ceil(10%·n_lang) docs per language through
    // the two-phase salted rank (parallelism = langs × 256 salt buckets, no
    // per-group single-reducer window); the gate checksums the SELECTION
    // (count + id sum per lang), which matches only if both engines picked
    // the identical doc set
    "doc_strat" -> ((s, dir) => {
      Text.stratifiedSample(docs(s, dir), "lang", "doc_id", 0.1)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"), sum(col("doc_id")).as("id_sum"))
        .orderBy("lang")
    }),

    // canonical-URL dedup: messy URL variants (scheme/host case, www,
    // userinfo, default ports, trailing slash, param order, utm/fbclid/ref
    // junk, fragments) normalize to one canonical key; dedup = groupBy on
    // that key. The messy strings are BUILT from doc_id so the oracle can
    // compute the canonical form arithmetically while Spark actually parses.
    "doc_url" -> ((s, dir) => {
      val id = col("doc_id").cast("long")
      val page = (id % 97).cast("string")
      val scheme0 = when(id % 97 % 2 === 0, lit("http")).otherwise(lit("https"))
      val scheme = when(id % 2 === 0, upper(scheme0)).otherwise(scheme0)
      val host = when(id % 3 === 0, lit("WWW.Example.COM"))
        .when(id % 3 === 1, lit("u:pw@Example.Com"))
        .otherwise(lit("example.com"))
      val port = when(id % 5 === 0,
        when(id % 97 % 2 === 0, lit(":80")).otherwise(lit(":443")))
        .otherwise(lit(""))
      val path = concat(lit("/p/"), page,
        when(id % 4 === 0, lit("/")).otherwise(lit("")))
      val qa = concat(lit("a="), (id % 97 % 5).cast("string"))
      val query = when(id % 2 === 0, concat(lit("?"), qa, lit("&z=9")))
        .otherwise(concat(lit("?z=9&"), qa))
      val junk = when(id % 3 === 0, lit("&utm_source=x&fbclid=1&ref")).otherwise(lit(""))
      val frag = when(id % 6 === 0, lit("#sec-2")).otherwise(lit(""))
      val url = concat(scheme, lit("://"), host, port, path, query, junk, frag)
      docs(s, dir)
        .select(id.as("doc_id"), Text.canonicalUrl(url).as("canonical_url"))
        .groupBy("canonical_url")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dupes"))
        .orderBy("canonical_url")
    }),

    // deterministic shard assignment (reproducible global shuffle for
    // training-output writes) + per-shard occupancy
    "doc_shard" -> ((s, dir) => {
      docs(s, dir).select(Text.shardAssign(col("doc_id"), 8).as("shard"), col("doc_id"))
        .groupBy("shard").agg(count(lit(1)).as("n"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("shard")
    }),

    // deterministic per-EPOCH training-order shuffle: permutation = global
    // rank over an integer hash of (doc_id, seed) — a new epoch is a new
    // seed, not a new copy of the corpus; two-phase rank, no global window
    "doc_shuffle" -> ((s, dir) => {
      Text.shuffleOrder(docs(s, dir), "doc_id", seed = 3L).orderBy("shuffle_pos")
    }),

    // deterministic train/val/test split assignment (hash buckets, replay-
    // identical) + per-split counts in one pass
    "doc_splitsets" -> ((s, dir) => {
      val assigned = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"),
        Text.splitAssign(col("doc_id"), Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split"))
      assigned.groupBy("split").agg(count(lit(1)).as("n")).orderBy("split")
    }),

    // sequence PACKING: concat-and-chunk assignment (pack_id, pack_offset)
    // via the two-phase distributed cumsum (no global window)
    "doc_pack" -> ((s, dir) => {
      Text.packAssignments(Tok.rawSequences(docs(s, dir)), "doc_id", "n_tok",
          seqLen = 2048)
        .orderBy("doc_id")
    }),

    // the packed TRAINING SEQUENCES themselves (concat-and-chunk at 2048):
    // every pack's token content byte-pinned via the comma-joined tok_str
    // convention; boundary-spanning docs contribute slices to both packs
    "doc_packseq" -> ((s, dir) => {
      Text.packSequences(Tok.rawSequences(docs(s, dir)), "doc_id",
          "tokens", "n_tok", seqLen = 2048)
        .select(col("pack_id"), col("n_pieces"), col("pack_len"),
          concat_ws(",", col("pack_tokens")).as("tok_str"))
        .orderBy("pack_id")
    }),

    // long-document CHUNKING: max-48-token windows, stride 32; contents
    // pinned by the rolling fingerprint of each chunk
    "doc_chunk" -> ((s, dir) => {
      Text.chunk(Tok.rawSequences(docs(s, dir))
          .withColumn("doc_id", col("doc_id").cast("long")),
          "tokens", maxLen = 48, stride = 32)
        .select(col("doc_id"), col("chunk_idx"), col("chunk_len"),
          Text.rollingFingerprint(col("chunk")).as("chunk_fp"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // DECONTAMINATION: training-vs-eval n-gram overlap (cross-corpus
    // prefix-filtered jaccard; eval = even doc_ids, train = odd)
    "dedup_decontam" -> ((s, dir) => {
      val raw = Tok.rawSequences(docs(s, dir)).withColumn("doc_id", col("doc_id").cast("long"))
      val train = raw.filter(col("doc_id") % 2 === 1)
      val eval0 = raw.filter(col("doc_id") % 2 === 0)
      Dedup.crossJaccard(train, eval0, "tokens", "doc_id", shingleK = 3, threshold = 0.5)
        .select(col("train_id"), col("eval_id"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("train_id", "eval_id")
    }),

    // per-train-doc k-gram contamination FRACTION vs the eval corpus (the
    // GPT-3-style decontamination score — partial overlap visible even
    // below any pair threshold)
    "txt_contam" -> ((s, dir) => {
      val raw = Tok.rawSequences(docs(s, dir)).withColumn("doc_id", col("doc_id").cast("long"))
      Dedup.contaminationFraction(
          raw.filter(col("doc_id") % 2 === 1), raw.filter(col("doc_id") % 2 === 0),
          "tokens", "doc_id", shingleK = 3)
        .orderBy("doc_id")
    }),

    // the CURATION decision a training-data pipeline materializes: keep a
    // doc iff it survives dedup AND passes quality AND language gates —
    // one composed boolean per document
    "doc_curate" -> ((s, dir) => {
      val d = docs(s, dir)
      val raw = Tok.rawSequences(d)
      val keep = Dedup.keepSet(raw, "tokens", "doc_id",
          shingleK = 3, bands = 8, rowsPerBand = 2, jaccardThreshold = 0.5)
        .withColumn("in_keep", lit(true))
      d.select(col("doc_id").cast("long").as("doc_id"),
          Text.qualityScore(col("text")).as("quality"),
          Text.langId(col("text")).as("lang_guess"))
        .join(keep, Seq("doc_id"), "left")
        .withColumn("kept",
          (coalesce(col("in_keep"), lit(false)) &&
            col("quality") >= 0.5 && col("lang_guess") === "en").cast("int"))
        .select(col("doc_id"), col("quality"), col("lang_guess"), col("kept"))
        .orderBy("doc_id")
    }),

    // the FULL CURATION RECIPE as one declarative plan: near-dup keep-set
    // ∧ quality ∧ langid decide the corpus (the doc_curate decision), then
    // ONLY the survivors pack into 2048-token training sequences (the
    // doc_pack machinery) — dedup → filter → pack end-to-end, one plan,
    // no materialization between stages
    "txt_e2e" -> ((s, dir) => {
      val d = docs(s, dir)
      val raw = Tok.rawSequences(d)
      val keep = Dedup.keepSet(raw, "tokens", "doc_id",
          shingleK = 3, bands = 8, rowsPerBand = 2, jaccardThreshold = 0.5)
        .withColumn("in_keep", lit(true))
      // fr6-quantized quality (qualityScoreQ): a half-boundary rounding
      // disagreement here would flip the kept SET and cascade through
      // every later pack offset — the round-3 bit-safety rule
      val kept = d.select(col("doc_id").cast("long").as("doc_id"),
          Text.qualityScoreQ(col("text")).as("quality"),
          Text.langId(col("text")).as("lang_guess"))
        .join(keep, Seq("doc_id"), "left")
        .filter(coalesce(col("in_keep"), lit(false)) &&
          col("quality") >= 0.5 && col("lang_guess") === "en")
        .select("doc_id")
      val rawKept = raw.withColumn("doc_id", col("doc_id").cast("long"))
        .join(kept, Seq("doc_id"), "left_semi")
      Text.packAssignments(rawKept, "doc_id", "n_tok", seqLen = 2048)
        .orderBy("doc_id")
    }),

    // SimHash bucket histogram (near-dup candidate buckets)
    "dedup_simhash" -> ((s, dir) => {
      Dedup.simhashBuckets(Tok.rawSequences(docs(s, dir)), "tokens", "doc_id")
        .select(col("simhash"), col("n_docs"))
        .orderBy("simhash")
    }),

    // brute-force cosine top-20 vs the vec_id=0 embedding
    "sim_topk" -> ((s, dir) => {
      val q = embs(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding")).collect()(0)
        .getSeq[Float](0).toSeq
      Similarity.topK(embs(s, dir).filter(col("vec_id") =!= 0), "embedding", "vec_id", q, 20)
        .orderBy(col("sim").desc, col("vec_id"))
    }),

    // radius search: every vector within cosine >= 0.2 of the vec_id=0
    // query — fixed-threshold retrieval (no top-k sort), one filter stage
    "sim_range" -> ((s, dir) => {
      val q = embs(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding")).collect()(0)
        .getSeq[Float](0).toSeq
      Similarity.rangeSearch(embs(s, dir).filter(col("vec_id") =!= 0),
          "embedding", "vec_id", q, 0.2)
        .orderBy(col("sim").desc, col("vec_id"))
    }),

    // embedding-cosine near-dup pairs via BANDED sign-LSH (5 bands x 12 bits
    // = 4096 buckets/band; per-bucket population N/4096, never all-pairs)
    "dedup_embed" -> ((s, dir) => {
      Similarity.bandedPairs(embs(s, dir), "embedding", "vec_id",
          bands = 5, bitsPerBand = 12, minSim = 0.3)
        .orderBy("id_a", "id_b")
    }),

    // multimodal: binary payload + typed metadata + size-bucketed layout
    "mm_meta" -> ((s, dir) => {
      val media = graft.operators.Multimodal.withSizeBucket(
        graft.operators.Multimodal.mediaTable(docs(s, dir), "doc_id", "text"))
      media.select(col("doc_id"), col("media_type"),
          length(col("payload")).as("n_bytes"), col("size_bucket"))
        .orderBy("doc_id")
    }),

    // REAL image decode through the multimodal seam: synthetic-but-valid
    // PNG/GIF/BMP container bytes (format = doc_id mod 3) parsed by the
    // pure-JVM header decoders — real byte parsing, oracle'd dims
    "mm_decode" -> ((s, dir) => {
      import s.implicits._
      val ids = docs(s, dir).select(col("doc_id").cast("long")).as[Long]
      val media = ids.map(id => (id, graft.operators.Multimodal.syntheticImagePayload(id)))
        .toDF("doc_id", "payload")
      graft.operators.Multimodal.decodeImages(s, media)
        .orderBy("doc_id")
    }),

    // IVF ANN through the PARTITIONED INDEX: build (assign + write
    // partitionBy(list_id)) once, then query via a partition-pruned read —
    // the scan touches only the nprobe probed list directories, so query
    // cost is O(N * nprobe / C), not the O(N * C) of per-query re-assignment.
    "sim_ivf" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.ivfCentroids(e, "embedding", "vec_id", 8)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
      val idxPath = new java.io.File(
        sys.props("java.io.tmpdir"),
        "graft_ivf_idx_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
      Similarity.ivfBuild(e.filter(col("vec_id") > 8), "embedding", cents, idxPath)
      Similarity.ivfTopKIndexed(s.read.parquet(idxPath), "embedding", "vec_id",
          cents, q, k = 10, nprobe = 2)
        .orderBy(col("sim").desc, col("vec_id"))
    }),

    // radius search THROUGH the partitioned IVF index: probe filter is a
    // partition-column predicate (only nprobe list dirs are scanned), then
    // the cosine threshold — the at-scale form of sim_range; recall bound
    // = the probed lists, mirrored exactly by the oracle's probe CTE
    "sim_rangeidx" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.ivfCentroids(e, "embedding", "vec_id", 8)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
      val idxPath = new java.io.File(
        sys.props("java.io.tmpdir"),
        "graft_ivfr_idx_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
      Similarity.ivfBuild(e.filter(col("vec_id") > 8), "embedding", cents, idxPath)
      Similarity.ivfRangeIndexed(s.read.parquet(idxPath), "embedding", "vec_id",
          cents, q, minSim = 0.15, nprobe = 2)
        .orderBy(col("sim").desc, col("vec_id"))
    }),

    // cross-document EXACT-SUBSTRING duplication (Lee et al. 2022
    // ExactSubstr): 8-token windows keyed corpus-wide; a window in >1 doc
    // marks all its positions as duplicated spans. Explode -> window-keyed
    // agg -> semi-join back -> per-doc fraction, never all-pairs
    "txt_spans" -> ((s, dir) => {
      Text.dupSpanWindows(docs(s, dir), "doc_id", "text", 8)
        .select(col("doc_id"), col("n_windows"), col("dup_windows"),
          col("dup_span_frac"))
        .orderBy("doc_id")
    }),

    // corpus-frequency token stats (the KenLM-scoring shape) + blocklist
    // curation: global token counts broadcast back per position; rare_frac
    // flags rare/garbage tokens, keep_block drops blocklisted docs
    // one round of BPE merge statistics: top-K adjacent token pairs
    // (TakeOrdered, never a global sort)
    "txt_bpe" -> ((s, dir) => {
      Text.bpePairStats(docs(s, dir), "text", topK = 50)
    }),

    // BPE APPLICATION: learn the top-8 merges from one round of int-token
    // pair stats (count desc, pair asc — engine-deterministic), apply them
    // in rank order. Encoded sequences byte-pinned via tok_str.
    "txt_bpe_apply" -> ((s, dir) => {
      val seqs = Tok.rawSequences(docs(s, dir))
      val merges = Text.bpeTopMerges(seqs, "tokens", 8)
      require(merges.size == 8, s"corpus yields only ${merges.size} merge pairs")
      Text.bpeApply(seqs, "tokens", "enc", merges, newIdBase = 1000000)
        .select(col("doc_id"), size(col("enc")).as("n_enc"),
          concat_ws(",", col("enc")).as("tok_str"))
        .orderBy("doc_id")
    }),

    // character-fraction repetition rules (Gopher §A1.1 completion):
    // top-2-gram char fraction + duplicated-5-gram char COVERAGE fraction;
    // guaranteed repetition synthesized from doc_id (the doc's own first-5
    // slice re-appended -> a certain dup 5-gram; a spam bigram run)
    "txt_ngramrep" -> ((s, dir) => {
      val uid = col("doc_id").cast("long")
      val first5 = array_join(slice(split(col("text"), " "), 1, 5), " ")
      val t = concat(col("text"),
        when(uid % 3 === 0, concat(lit(" "), first5)).otherwise(""),
        when(uid % 4 === 0, lit(" spam spam spam spam")).otherwise(""))
      Text.ngramCharStats(docs(s, dir).withColumn("_t", t), "doc_id", "_t")
        .orderBy("doc_id")
    }),

    // iterative BPE TRAINING with per-round recount (Sennrich et al. 2016):
    // round k's winner depends on every prior merge having been applied, so
    // the merge table pins the whole iterative process; n is the pair count
    // at selection time
    "txt_bpe_train" -> ((s, dir) => {
      val seqs = Tok.rawSequences(docs(s, dir))
      val merges = Text.bpeTrain(seqs, "tokens", rounds = 6, newIdBase = 1000000)
      require(merges.size == 6, s"corpus dried up at ${merges.size} rounds")
      import s.implicits._
      merges.toDF("rk", "a", "b", "n").orderBy("rk")
    }),

    // GLOBAL curriculum rank by a quality score (two-phase distributed
    // rank: range partition + broadcast offsets, no single-partition window)
    "doc_rank" -> ((s, dir) => {
      Text.globalRank(docs(s, dir), "doc_id", "n_chars").orderBy("rank")
    }),

    // bigram LM surprisal quality scoring (integer-log2 formulation — see
    // Text.bigramSurprisal scaladoc for the engine-exactness rationale)
    "txt_ppx" -> ((s, dir) => {
      Text.bigramSurprisal(docs(s, dir), "doc_id", "text").orderBy("doc_id")
    }),

    "txt_freq" -> ((s, dir) => {
      val stats = Text.tokenFrequencyStats(docs(s, dir), "doc_id", "text", 900L)
      docs(s, dir)
        .select(col("doc_id"),
          Text.blocklistKeep(col("text"), Seq("slow", "xxbadword")).as("keep_block"))
        .join(stats, Seq("doc_id"))
        .select(col("doc_id"), col("n_tok"), col("mean_tok_count"),
          col("rare_frac"), col("keep_block"))
        .orderBy("doc_id")
    }),

    // SEMANTIC dedup (SemDeDup): cluster the embedding space on the IVF
    // quantizer, pairwise cosine ONLY within a cluster, lowest-id-wins —
    // the all-pairs blow-up stays bounded to cluster_size² per cluster
    "dedup_sem" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.ivfCentroids(e, "embedding", "vec_id", 8)
      graft.functions.Dedup.semDedup(e, "embedding", "vec_id", cents, 0.3)
        .orderBy("vec_id")
    }),

    // hashed-n-gram linear quality classifier: zero-shuffle inference
    // (transform + aggregate projection), integer weights for engine-exact
    // score sums
    "txt_classify" -> ((s, dir) => {
      Text.hashedClassify(docs(s, dir), "text")
        .select(col("doc_id"), col("n_tok"), col("score"),
          (col("score").cast("double") / col("n_tok")).as("score_per_tok"),
          col("keep"))
        .orderBy("doc_id")
    }),

    // PRODUCT QUANTIZATION (the IVF-PQ scale path): 64-dim vectors -> 4
    // codes of 3 bits here (codebooks = subvectors of vec_ids 1..8), then
    // ADC distance to the vec_id=0 query = 4 table lookups per row. Output
    // is EVERY base vector's codes + ADC distance — encode and scoring both
    // checked row-for-row, not just a top-k tail.
    "sim_pq" -> ((s, dir) => {
      val e = embs(s, dir)
      val cbs = Similarity.pqCodebooks(e, "embedding", "vec_id", m = 4, k = 8)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
      val dt = Similarity.pqAdcTable(q, cbs)
      Similarity.pqEncode(e.filter(col("vec_id") > 8), "embedding", cbs)
        .select(col("vec_id"),
          concat_ws(",", (0 until 4).map(j => col(s"code_$j").cast("string")): _*)
            .as("code_str"),
          Similarity.pqAdcDistance(dt).as("adc_dist"))
        .orderBy("vec_id")
    }),

    // IVF + PQ composed (the FAISS IVF-PQ architecture): coarse-quantize to
    // inverted lists, probe the query's top-2 lists (partition pruning at
    // scale), PQ-encode ONLY the survivors and ADC-score them — the scan
    // reads nprobe/C of the corpus and scoring is dimension-independent.
    "sim_ivfpq" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.ivfCentroids(e, "embedding", "vec_id", 8)
      val cbs = Similarity.pqCodebooks(e, "embedding", "vec_id", m = 4, k = 8)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
      val probed = Similarity.probeLists(cents, q, nprobe = 2)
      val dt = Similarity.pqAdcTable(q, cbs)
      val survivors = Similarity.ivfAssign(e.filter(col("vec_id") > 8), "embedding", cents)
        .filter(col("list_id").isin(probed: _*))
      Similarity.pqEncode(survivors, "embedding", cbs)
        .select(col("vec_id"), col("list_id"),
          concat_ws(",", (0 until 4).map(j => col(s"code_$j").cast("string")): _*)
            .as("code_str"),
          Similarity.pqAdcDistance(dt).as("adc_dist"))
        .orderBy("vec_id")
    }),

    // ADC shortlist -> EXACT re-rank (the FAISS refine stage): PQ codes
    // pick the 50 nearest candidates dimension-independently, then ONLY
    // those 50 raw vectors are re-scored with the exact cosine for the
    // true top-10 — at 100 TB the full-precision vectors stay cold except
    // for O(shortlist) rows per query (broadcast semi-join back).
    "sim_rerank" -> ((s, dir) => {
      val e = embs(s, dir)
      val cbs = Similarity.pqCodebooks(e, "embedding", "vec_id", m = 4, k = 8)
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding")).collect()(0).getSeq[Float](0).toArray
      val dt = Similarity.pqAdcTable(q, cbs)
      val base = e.filter(col("vec_id") > 8)
      val enc = Similarity.pqEncode(base, "embedding", cbs)
      Similarity.pqTopKRefined(enc, base, "embedding", "vec_id", dt,
          q.toSeq, k = 10, shortlist = 50)
        .orderBy(col("sim").desc, col("vec_id"))
    }),

    // C4-style heuristic cleaning rules (Raffel et al. 2020 §2.2): the
    // corpus is a bare word stream, so rule-triggering decorations
    // (terminal punct, lorem-ipsum / curly-brace / javascript boilerplate)
    // are synthesized deterministically from doc_id — every rule branch
    // fires on a known subset and the oracle rebuilds the same text
    "txt_c4" -> ((s, dir) => {
      val uid = col("doc_id").cast("long")
      val t = concat(col("text"),
        when(uid % 4 === 0, ".").when(uid % 4 === 1, "!")
          .when(uid % 4 === 2, "?").otherwise(""),
        when(uid % 7 === 0, " lorem ipsum dolor sit").otherwise(""),
        when(uid % 11 === 0, " css { margin }").otherwise(""),
        when(uid % 13 === 0, " please enable javascript").otherwise(""))
      docs(s, dir).select(col("doc_id"),
        Text.nWords(t).as("n_words"),
        Text.c4EndsPunct(t).as("ends_punct"),
        Text.c4HasLorem(t).as("has_lorem"),
        Text.c4HasBrace(t).as("has_brace"),
        Text.c4HasJavascript(t).as("has_js"),
        Text.c4Keep(t).as("keep_c4"))
        .orderBy("doc_id")
    }),

    // Gopher quality rules (Rae et al. 2021 §A1.1): word-count band, mean
    // word length band, symbol ratio, alphabetic-word floor, stopword
    // hits; symbol/digit decorations synthesized from doc_id
    "txt_gopher" -> ((s, dir) => {
      val uid = col("doc_id").cast("long")
      val t = concat(col("text"),
        when(uid % 5 === 0, " ### #### ...").otherwise(""),
        when(uid % 9 === 0, " 123 4567 89 00 11 22").otherwise(""))
      docs(s, dir).select(col("doc_id"),
        Text.nWords(t).as("n_words"),
        (floor(Text.meanWordLen(t) * 1e6 + 0.5) / 1e6).as("mean_wlen"),
        (floor(Text.gopherSymbolRatio(t) * 1e6 + 0.5) / 1e6).as("symbol_ratio"),
        (floor(Text.gopherAlphaFrac(t) * 1e6 + 0.5) / 1e6).as("alpha_frac"),
        Text.gopherStopHits(t).as("stop_hits"),
        Text.gopherKeep(t).as("keep_gopher"))
        .orderBy("doc_id")
    }),

    // corpus-level LINE dedup (CCNet/RefinedWeb boilerplate removal): each
    // doc becomes 4 lines — a per-source promo header, two text slices,
    // and an alternating footer; lines in > 5 distinct docs drop from
    // every doc, survivors rejoin in original order
    "txt_linededup" -> ((s, dir) => {
      val uid = col("doc_id").cast("long")
      val lines = array(
        concat(lit("promo "), col("source")),
        substring(col("text"), 1, 30),
        when(uid % 2 === 0, "subscribe to updates").otherwise("contact support"),
        substring(col("text"), 31, 60))
      Text.lineDedup(docs(s, dir).withColumn("_lines", lines),
          "doc_id", "_lines", 5L)
        .orderBy("doc_id")
    }),

    // DSIR importance resampling (Xie et al. 2023): src0/src1 are the
    // target corpus, everything else is raw; hashed-unigram bucket
    // log-ratios (integer-log2) score each raw doc's target-likeness
    "txt_dsir" -> ((s, dir) => {
      Text.dsirScores(docs(s, dir), "doc_id", "text",
          col("source").isin("src0", "src1"))
        .orderBy("doc_id")
    }),

    // two-corpus DSIR SELECTION (the production shape: a small curated
    // TARGET frame steers selection over a huge RAW frame): bucket
    // log-ratio deltas fold into one literal array, scoring is a
    // zero-shuffle projection, top-k is TakeOrderedAndProject
    "txt_dsirsel" -> ((s, dir) => {
      val d = docs(s, dir)
      Text.dsirSelect(
          d.filter(!col("source").isin("src0", "src1")),
          d.filter(col("source").isin("src0", "src1")),
          "doc_id", "text", k = 50)
        .select(col("doc_id"), col("source"), col("dsir_w"))
        .orderBy("doc_id")
    }),

    // prototype-based cluster pruning (Sorscher et al. 2022): assign to
    // the fixed quantizer's prototypes, keep the hardest (least
    // prototypical) half of every cluster
    "doc_proto" -> ((s, dir) => {
      val e = embs(s, dir)
      val cents = Similarity.ivfCentroids(e, "embedding", "vec_id", 8)
      Similarity.protoPrune(e.filter(col("vec_id") > 8), "embedding",
          "vec_id", cents)
        .orderBy("vec_id")
    }),

    // sign-LSH bucket histogram (the ANN partition key)
    "sim_buckets" -> ((s, dir) => {
      embs(s, dir)
        .select(Similarity.signBucket(col("embedding"), 8).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "txt_spans" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |w AS (
        |  SELECT doc_id, array_to_string(list_slice(toks, i, i + 7), ' ') AS win
        |  FROM t, LATERAL (SELECT unnest(range(1, len(toks) - 8 + 2)) AS i) u
        |  WHERE len(toks) >= 8),
        |d AS (SELECT win FROM w GROUP BY win HAVING COUNT(DISTINCT doc_id) > 1),
        |pd AS (SELECT w.doc_id, COUNT(*) AS dup_windows
        |       FROM w JOIN d USING (win) GROUP BY w.doc_id),
        |base AS (SELECT doc_id,
        |                GREATEST(len(string_split(text, ' ')) - 7, 0) AS n_windows
        |         FROM documents)
        |SELECT b.doc_id, CAST(b.n_windows AS BIGINT) AS n_windows,
        |       CAST(COALESCE(pd.dup_windows, 0) AS BIGINT) AS dup_windows,
        |       CASE WHEN b.n_windows > 0
        |            THEN floor(COALESCE(pd.dup_windows, 0) / b.n_windows * 1000000 + 0.5)
        |                 / 1000000
        |            ELSE 0.0 END AS dup_span_frac
        |FROM base b LEFT JOIN pd USING (doc_id) ORDER BY b.doc_id""".stripMargin,

    "txt_freq" ->
      """WITH e AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT tok, COUNT(*) AS cnt FROM e GROUP BY tok),
        |pd AS (
        |  SELECT e.doc_id, COUNT(*) AS n_tok,
        |         SUM(c.cnt) AS sum_c,
        |         COUNT(*) FILTER (c.cnt < 900) AS rare
        |  FROM e JOIN c USING (tok) GROUP BY e.doc_id)
        |SELECT d.doc_id, CAST(pd.n_tok AS BIGINT) AS n_tok,
        |       floor(CAST(pd.sum_c AS DOUBLE) / pd.n_tok * 1000000 + 0.5) / 1000000
        |         AS mean_tok_count,
        |       floor(CAST(pd.rare AS DOUBLE) / pd.n_tok * 1000000 + 0.5) / 1000000
        |         AS rare_frac,
        |       len(list_filter(string_split(d.text, ' '),
        |                       w -> w IN ('slow', 'xxbadword'))) = 0 AS keep_block
        |FROM documents d JOIN pd USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    "txt_bpe" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS toks FROM documents),
        |pos AS (
        |  SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t),
        |bg AS (SELECT toks[i] AS prev, toks[i+1] AS cur FROM pos)
        |SELECT prev, cur, COUNT(*) AS n FROM bg
        |GROUP BY prev, cur ORDER BY n DESC, prev, cur LIMIT 50""".stripMargin,

    "txt_bpe_apply" -> {
      val m = 8; val base = 1000000
      // one CTE per rule: the chained encodings stay bound relations (the
      // same reason the Spark side is one projection per rule)
      val steps = (0 until m).map { k =>
        s"""e${k + 1} AS (
           |  SELECT doc_id, list_filter(list_transform(generate_series(1, len(t)), i ->
           |    CASE WHEN i < len(t) AND t[i] = r.a AND t[i+1] = r.b THEN ${base + k}
           |         WHEN i > 1 AND t[i-1] = r.a AND t[i] = r.b THEN -1
           |         ELSE t[i] END), x -> x <> -1) AS t
           |  FROM e$k, (SELECT a, b FROM rules WHERE rk = $k) r)""".stripMargin
      }.mkString(",\n")
      s"""${Tok.sqlRawSequences},
         |pos AS (SELECT tokens AS t, unnest(generate_series(1, n_tok - 1)) AS i
         |        FROM raw WHERE n_tok > 1),
         |bg AS (SELECT t[i] AS a, t[i+1] AS b FROM pos WHERE t[i] <> t[i+1]),
         |rules AS (
         |  SELECT a, b, rk FROM (
         |    SELECT a, b, row_number() OVER (ORDER BY n DESC, a, b) - 1 AS rk
         |    FROM (SELECT a, b, COUNT(*) AS n FROM bg GROUP BY a, b))
         |  WHERE rk < $m),
         |e0 AS (SELECT doc_id, tokens AS t FROM raw),
         |$steps
         |SELECT doc_id, CAST(len(t) AS INTEGER) AS n_enc,
         |       array_to_string(t, ',') AS tok_str
         |FROM e$m ORDER BY doc_id""".stripMargin
    },

    "txt_ngramrep" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    concat(text,
        |      CASE WHEN CAST(doc_id AS BIGINT) % 3 = 0
        |           THEN ' ' || array_to_string(
        |                  list_slice(string_split(text, ' '), 1, 5), ' ')
        |           ELSE '' END,
        |      CASE WHEN CAST(doc_id AS BIGINT) % 4 = 0
        |           THEN ' spam spam spam spam' ELSE '' END) AS tx
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, string_split(tx, ' ') AS words,
        |         CAST(list_sum(list_transform(string_split(tx, ' '),
        |                                      w -> length(w))) AS BIGINT) AS tc
        |  FROM t),
        |g2 AS (SELECT doc_id, array_to_string(list_slice(words, i, i + 1), ' ') AS gram
        |       FROM base, LATERAL (SELECT unnest(range(1, len(words))) AS i) u
        |       WHERE len(words) >= 2),
        |c2 AS (SELECT doc_id, gram, COUNT(*) AS n FROM g2 GROUP BY 1, 2),
        |t2 AS (SELECT doc_id, gram, CAST(n * (length(gram) - 1) AS BIGINT) AS tch
        |       FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |                                          ORDER BY n DESC, gram) AS rn
        |             FROM c2)
        |       WHERE rn = 1),
        |g5 AS (SELECT doc_id, i, array_to_string(list_slice(words, i, i + 4), ' ') AS gram
        |       FROM base, LATERAL (SELECT unnest(range(1, len(words) - 3)) AS i) u
        |       WHERE len(words) >= 5),
        |d5 AS (SELECT doc_id, gram FROM g5 GROUP BY doc_id, gram HAVING COUNT(*) >= 2),
        |ix AS (SELECT DISTINCT doc_id, wi FROM (
        |         SELECT g.doc_id, unnest(generate_series(g.i, g.i + 4)) AS wi
        |         FROM g5 g JOIN d5 USING (doc_id, gram))),
        |cov AS (SELECT ix.doc_id, CAST(SUM(length(b.words[ix.wi])) AS BIGINT) AS dch
        |        FROM ix JOIN base b USING (doc_id) GROUP BY 1)
        |SELECT b.doc_id, b.tc AS total_chars,
        |       coalesce(t2.gram, '') AS top_gram,
        |       floor(CAST(coalesce(t2.tch, 0) AS DOUBLE) / b.tc * 1000000 + 0.5)
        |         / 1000000 AS top_frac,
        |       floor(CAST(coalesce(cov.dch, 0) AS DOUBLE) / b.tc * 1000000 + 0.5)
        |         / 1000000 AS dup_frac,
        |       (CAST(coalesce(t2.tch, 0) AS DOUBLE) / b.tc <= 0.2
        |        AND CAST(coalesce(cov.dch, 0) AS DOUBLE) / b.tc <= 0.15) AS keep_rep
        |FROM base b LEFT JOIN t2 USING (doc_id) LEFT JOIN cov USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "txt_bpe_train" -> {
      val r = 6; val base = 1000000
      // one (count, top-1, apply) CTE triple per round: round k's count runs
      // over e_k, the encoding AFTER the first k merges — the recount that
      // distinguishes training from the static-rank txt_bpe_apply oracle
      val rounds = (0 until r).map { k =>
        s"""c$k AS (
           |  SELECT t[i] AS a, t[i+1] AS b, COUNT(*) AS n
           |  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
           |        FROM e$k WHERE len(t) > 1)
           |  WHERE t[i] <> t[i+1] GROUP BY 1, 2),
           |r$k AS (SELECT a, b, n FROM c$k ORDER BY n DESC, a, b LIMIT 1),
           |e${k + 1} AS (
           |  SELECT doc_id, list_filter(list_transform(generate_series(1, len(t)), i ->
           |    CASE WHEN i < len(t) AND t[i] = r.a AND t[i+1] = r.b THEN ${base + k}
           |         WHEN i > 1 AND t[i-1] = r.a AND t[i] = r.b THEN -1
           |         ELSE t[i] END), x -> x <> -1) AS t
           |  FROM e$k, r$k r)""".stripMargin
      }.mkString(",\n")
      val sel = (0 until r)
        .map(k => s"SELECT $k AS rk, a, b, n FROM r$k")
        .mkString("\nUNION ALL ")
      s"""${Tok.sqlRawSequences},
         |e0 AS (SELECT doc_id, tokens AS t FROM raw),
         |$rounds
         |$sel
         |ORDER BY rk""".stripMargin
    },

    "doc_rank" ->
      """SELECT doc_id, CAST(n_chars AS DOUBLE) AS score,
        |       ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rank
        |FROM documents ORDER BY rank""".stripMargin,

    "txt_ppx" ->
      """WITH t AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t),
        |bg AS (
        |  SELECT doc_id, toks[i] AS prev, toks[i+1] AS cur FROM pos),
        |cu AS (SELECT prev, COUNT(*) AS cu FROM bg GROUP BY 1),
        |cb AS (SELECT prev, cur, COUNT(*) AS cb FROM bg GROUP BY 1, 2)
        |SELECT bg.doc_id,
        |       COUNT(*) AS n_bigrams,
        |       MAX(length(bin(cu.cu)) - length(bin(cb.cb))) AS max_surprisal,
        |       floor(CAST(SUM(length(bin(cu.cu)) - length(bin(cb.cb))) AS DOUBLE)
        |             / COUNT(*) * 1000000 + 0.5) / 1000000 AS surprisal
        |FROM bg JOIN cu USING (prev) JOIN cb USING (prev, cur)
        |GROUP BY bg.doc_id ORDER BY doc_id""".stripMargin,

    "txt_langid" -> {
      val hits = Text.LangMarkers.map { case (lang, ms) =>
        val inList = ms.map(m => s"'$m'").mkString("(", ",", ")")
        s"len(list_filter(string_split(text,' '), w -> w IN $inList)) AS h_$lang"
      }.mkString(",\n         ")
      val best = Text.LangMarkers.map(m => s"h_${m._1}").mkString("greatest(", ", ", ")")
      val pick = Text.LangMarkers.foldRight("'und'") { case ((lang, _), acc) =>
        s"CASE WHEN h_$lang = best AND best > 0 THEN '$lang' ELSE $acc END"
      }
      s"""WITH scored AS (
         |  SELECT doc_id, $hits
         |  FROM documents
         |), best_t AS (SELECT *, $best AS best FROM scored)
         |SELECT doc_id, $pick AS lang_guess, CAST(h_en AS INTEGER) AS en_hits
         |FROM best_t ORDER BY doc_id""".stripMargin
    },

    "txt_quality" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
        |), c AS (
        |  SELECT doc_id,
        |         CAST(len(words) AS INTEGER) AS n_words,
        |         CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS dr,
        |         CAST(len(list_filter(words, x -> x IN ('the','a'))) AS DOUBLE) / len(words) AS sr,
        |         CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE) / len(words) AS mw
        |  FROM w)
        |SELECT doc_id, n_words, round(dr, 6) AS distinct_ratio, round(sr, 6) AS stop_ratio,
        |       round(mw, 6) AS mean_wlen,
        |       round(least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4 + dr * 0.4 + (1.0 - sr) * 0.2, 6) AS quality
        |FROM c ORDER BY doc_id""".stripMargin,

    "txt_mix" ->
      """WITH m AS (
        |  SELECT doc_id, source,
        |         ((doc_id % 1000003) * 2654435761) % 4294967296 / 4294967296.0 AS h,
        |         CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.4
        |                     ELSE 1.0 END AS w
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source,
        |         CAST(floor(w) + CASE WHEN h < w - floor(w) THEN 1 ELSE 0 END AS INTEGER) AS n
        |  FROM m)
        |SELECT doc_id, source, CAST(unnest(range(n)) AS INTEGER) AS rep
        |FROM c WHERE n > 0 ORDER BY doc_id, rep""".stripMargin,

    "txt_c4" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         concat(text,
        |           CASE CAST(doc_id AS BIGINT) % 4 WHEN 0 THEN '.' WHEN 1 THEN '!'
        |                WHEN 2 THEN '?' ELSE '' END,
        |           CASE WHEN CAST(doc_id AS BIGINT) % 7 = 0
        |                THEN ' lorem ipsum dolor sit' ELSE '' END,
        |           CASE WHEN CAST(doc_id AS BIGINT) % 11 = 0
        |                THEN ' css { margin }' ELSE '' END,
        |           CASE WHEN CAST(doc_id AS BIGINT) % 13 = 0
        |                THEN ' please enable javascript' ELSE '' END) AS tx
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(tx, ' ')) AS INTEGER) AS n_words,
        |         regexp_matches(tx, '[.!?"'']$') AS ends_punct,
        |         contains(lower(tx), 'lorem ipsum') AS has_lorem,
        |         contains(tx, '{') AS has_brace,
        |         list_contains(string_split(lower(tx), ' '), 'javascript') AS has_js
        |  FROM t)
        |SELECT doc_id, n_words, ends_punct, has_lorem, has_brace, has_js,
        |       (ends_punct AND NOT has_lorem AND NOT has_brace AND NOT has_js
        |        AND n_words >= 15) AS keep_c4
        |FROM m ORDER BY doc_id""".stripMargin,

    "txt_gopher" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         concat(text,
        |           CASE WHEN CAST(doc_id AS BIGINT) % 5 = 0
        |                THEN ' ### #### ...' ELSE '' END,
        |           CASE WHEN CAST(doc_id AS BIGINT) % 9 = 0
        |                THEN ' 123 4567 89 00 11 22' ELSE '' END) AS tx
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, string_split(tx, ' ') AS words,
        |         length(tx) - length(replace(tx, '#', '')) AS hashes,
        |         (length(tx) - length(replace(tx, '...', ''))) / 3 AS ell
        |  FROM t),
        |m AS (
        |  SELECT doc_id,
        |         CAST(len(words) AS INTEGER) AS n_words,
        |         CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE)
        |           / len(words) AS mw,
        |         (hashes + ell) / len(words) AS sr,
        |         CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))
        |           AS DOUBLE) / len(words) AS af,
        |         CAST((CASE WHEN list_contains(words, 'the') THEN 1 ELSE 0 END)
        |            + (CASE WHEN list_contains(words, 'a') THEN 1 ELSE 0 END)
        |            + (CASE WHEN list_contains(words, 'value') THEN 1 ELSE 0 END)
        |            + (CASE WHEN list_contains(words, 'data') THEN 1 ELSE 0 END)
        |           AS INTEGER) AS sh
        |  FROM c)
        |SELECT doc_id, n_words,
        |       floor(mw * 1000000 + 0.5) / 1000000 AS mean_wlen,
        |       floor(sr * 1000000 + 0.5) / 1000000 AS symbol_ratio,
        |       floor(af * 1000000 + 0.5) / 1000000 AS alpha_frac,
        |       sh AS stop_hits,
        |       (n_words BETWEEN 15 AND 120 AND mw BETWEEN 3.0 AND 6.0
        |        AND sr <= 0.01 AND af >= 0.9 AND sh >= 2) AS keep_gopher
        |FROM m ORDER BY doc_id""".stripMargin,

    "txt_linededup" ->
      """WITH lines AS (
        |  SELECT doc_id, 0 AS pos, 'promo ' || source AS line FROM documents
        |  UNION ALL SELECT doc_id, 1, substring(text, 1, 30) FROM documents
        |  UNION ALL SELECT doc_id, 2,
        |    CASE WHEN CAST(doc_id AS BIGINT) % 2 = 0
        |         THEN 'subscribe to updates' ELSE 'contact support' END
        |  FROM documents
        |  UNION ALL SELECT doc_id, 3, substring(text, 31, 60) FROM documents),
        |freq AS (SELECT line, COUNT(DISTINCT doc_id) AS docs
        |         FROM lines GROUP BY line)
        |SELECT l.doc_id, COUNT(*) AS n_lines,
        |       COUNT(*) FILTER (f.docs <= 5) AS n_kept,
        |       COALESCE(string_agg(l.line, ' / ' ORDER BY l.pos)
        |                  FILTER (f.docs <= 5), '') AS kept_text
        |FROM lines l JOIN freq f USING (line)
        |GROUP BY l.doc_id ORDER BY l.doc_id""".stripMargin,

    "txt_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, source IN ('src0', 'src1') AS t,
        |         unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, t,
        |         CAST('0x' || substring(md5(tok), 1, 6) AS BIGINT) % 256 AS bkt
        |  FROM toks),
        |w AS (
        |  SELECT bkt,
        |         CAST(length(bin(COUNT(*) FILTER (t) + 1)) -
        |              length(bin(COUNT(*) FILTER (NOT t) + 1)) AS BIGINT) AS w
        |  FROM b GROUP BY bkt),
        |sc AS (
        |  SELECT b.doc_id, COUNT(*) AS n_tok, CAST(SUM(w.w) AS BIGINT) AS dsir_score
        |  FROM b JOIN w USING (bkt) WHERE NOT b.t GROUP BY b.doc_id)
        |SELECT doc_id, n_tok, dsir_score,
        |       floor(CAST(dsir_score AS DOUBLE) / n_tok * 1000000 + 0.5) / 1000000
        |         AS dsir_avg,
        |       dsir_score > 0 AS keep
        |FROM sc ORDER BY doc_id""".stripMargin,

    "txt_dsirsel" ->
      """WITH tgt AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |raw AS (
        |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE source NOT IN ('src0', 'src1')),
        |tb AS (
        |  SELECT CAST('0x' || substring(md5(tok), 1, 6) AS BIGINT) % 512 AS bkt,
        |         COUNT(*) AS ct
        |  FROM tgt GROUP BY 1),
        |rb AS (
        |  SELECT doc_id, source,
        |         CAST('0x' || substring(md5(tok), 1, 6) AS BIGINT) % 512 AS bkt
        |  FROM raw),
        |rc AS (SELECT bkt, COUNT(*) AS cr FROM rb GROUP BY 1),
        |nrm AS (
        |  SELECT CAST(length(bin((SELECT COUNT(*) FROM raw) + 512)) -
        |              length(bin((SELECT COUNT(*) FROM tgt) + 512)) AS BIGINT) AS n),
        |w AS (
        |  SELECT rc.bkt,
        |         CAST(length(bin(COALESCE(tb.ct, 0) + 1)) -
        |              length(bin(rc.cr + 1)) AS BIGINT) + (SELECT n FROM nrm) AS w
        |  FROM rc LEFT JOIN tb USING (bkt)),
        |sc AS (
        |  SELECT rb.doc_id, rb.source, CAST(SUM(w.w) AS BIGINT) AS dsir_w
        |  FROM rb JOIN w USING (bkt) GROUP BY rb.doc_id, rb.source)
        |SELECT doc_id, source, dsir_w FROM (
        |  SELECT * FROM sc ORDER BY dsir_w DESC, doc_id LIMIT 50)
        |ORDER BY doc_id""".stripMargin,

    "doc_proto" ->
      """WITH cent AS (
        |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
        |base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
        |         FROM embeddings WHERE vec_id > 8),
        |asg AS (
        |  SELECT vec_id, cid,
        |         round(list_dot_product(ev, cv) /
        |               (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(cv, cv))), 6) AS s,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY
        |           round(list_dot_product(ev, cv) /
        |                 (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(cv, cv))), 6) DESC,
        |           cid) AS rk
        |  FROM base, cent),
        |lists AS (SELECT vec_id, CAST(cid AS BIGINT) AS list_id, s AS proto_cos
        |          FROM asg WHERE rk = 1),
        |r AS (
        |  SELECT vec_id, list_id, proto_cos,
        |         row_number() OVER (PARTITION BY list_id
        |                            ORDER BY proto_cos ASC, vec_id) AS rk,
        |         COUNT(*) OVER (PARTITION BY list_id) AS n
        |  FROM lists)
        |SELECT vec_id, list_id, proto_cos,
        |       rk <= floor((n + 1) / 2) AS keep
        |FROM r ORDER BY vec_id""".stripMargin,

    "txt_pii" ->
      // NB DuckDB single-quoted strings treat backslash literally, so the
      // shared Scala regex constants embed verbatim
      s"""WITH p AS (
         |  SELECT doc_id,
         |         text || ' contact u' || (doc_id % 7) || '@mail' || (doc_id % 3)
         |           || '.com or +1 555-01' || (doc_id % 90 + 10)
         |           || ' at 10.' || (doc_id % 200) || '.0.' || (doc_id % 250) AS t
         |  FROM documents)
         |SELECT doc_id,
         |       regexp_replace(regexp_replace(regexp_replace(t,
         |         '${graft.functions.Text.PiiEmail}', '<EMAIL>', 'g'),
         |         '${graft.functions.Text.PiiIpv4}', '<IP>', 'g'),
         |         '${graft.functions.Text.PiiPhone}', '<PHONE>', 'g') AS redacted,
         |       CAST(len(regexp_extract_all(t, '${graft.functions.Text.PiiEmail}')) AS INTEGER) AS n_email,
         |       CAST(len(regexp_extract_all(t, '${graft.functions.Text.PiiIpv4}')) AS INTEGER) AS n_ip,
         |       CAST(len(regexp_extract_all(t, '${graft.functions.Text.PiiPhone}')) AS INTEGER) AS n_phone
         |FROM p ORDER BY doc_id""".stripMargin,

    "txt_urlnorm" ->
      // the oracle CONSTRUCTS the expected canonical form analytically from
      // the same residues the Spark side uses to build the messy url — the
      // normalizer is verified against ground truth, not against itself
      """SELECT canon, COUNT(*) AS n_dups, MIN(doc_id) AS keep_id FROM (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 3 = 1 THEN 'https://' ELSE 'http://' END) ||
        |    'www.site' || CAST(doc_id % 7 AS VARCHAR) || '.com' ||
        |    '/A/' || CAST(doc_id % 50 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '/b' ELSE '' END) ||
        |    (CASE WHEN doc_id % 2 = 0 AND doc_id % 10 <> 0
        |          THEN '?q=' || CAST(doc_id % 10 AS VARCHAR) ELSE '' END) AS canon
        |  FROM documents) t
        |GROUP BY canon ORDER BY canon""".stripMargin,

    "txt_rep" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |), g AS (
        |  SELECT doc_id, ws,
        |         list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS bg,
        |         list_transform(range(1, len(ws) - 1),
        |                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS tg
        |  FROM w
        |), f AS (
        |  SELECT doc_id,
        |         CASE WHEN len(ws) > 0 THEN
        |           floor(CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / len(ws) * 1000000.0 + 0.5) / 1000000.0 END AS dup_word_frac,
        |         CASE WHEN len(bg) > 0 THEN
        |           floor(CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg) * 1000000.0 + 0.5) / 1000000.0 END AS dup_bigram_frac,
        |         CASE WHEN len(tg) > 0 THEN
        |           floor(CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE) / len(tg) * 1000000.0 + 0.5) / 1000000.0 END AS dup_trigram_frac
        |  FROM g)
        |SELECT doc_id, dup_word_frac, dup_bigram_frac, dup_trigram_frac,
        |       dup_word_frac <= 0.55 AND dup_bigram_frac <= 0.05 AS keep_rep
        |FROM f ORDER BY doc_id""".stripMargin,

    "txt_tokcount" ->
      """SELECT event_id,
        |       CAST(len(regexp_split_to_array(props, '\s+')) AS INTEGER) AS tok_ws,
        |       CAST(len(regexp_extract_all(props, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS tok_bpe
        |FROM events ORDER BY event_id""".stripMargin,

    "txt_fingerprint" ->
      s"""${Tok.sqlRawSequences}
         |SELECT doc_id,
         |       list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(tokens, t -> CAST(t AS BIGINT))),
         |                   (h, t) -> (h * ${Text.FpBase} + t) % $P) AS roll_fp,
         |       ${sqlSimhash16("tokens")} AS simhash
         |FROM raw ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT doc_id, sha256(text) AS content_hash,
        |       row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) > 1 AS is_dup
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_jaccard" ->
      s"""${Tok.sqlRawSequences},
         |sh AS (
         |  SELECT CAST(doc_id AS BIGINT) AS id,
         |         list_distinct(${sqlShingles(3)}) AS shset
         |  FROM raw
         |), posting AS (
         |  SELECT id, len(shset) AS n_sh, unnest(shset) AS s FROM sh
         |), pairs AS (
         |  SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS inter
         |  FROM posting a JOIN posting b ON a.s = b.s AND a.id < b.id
         |  GROUP BY 1, 2, 3, 4)
         |SELECT id_a, id_b,
         |       round(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 6) AS jaccard
         |FROM pairs WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    "dedup_stream" -> {
      val bands = 8; val rpb = 2; val nh = bands * rpb
      val bandKeys = (0 until bands).map { b =>
        val slice = (0 until rpb).map(r => s"CAST(sig[${b * rpb + r + 1}] AS VARCHAR)")
          .mkString(" || '-' || ")
        s"SELECT id, sig, $b AS band, $slice AS bh FROM sigs"
      }.mkString("\n  UNION ALL\n  ")
      s"""${Tok.sqlRawSequences},
         |sigs AS (
         |  SELECT CAST(doc_id AS BIGINT) AS id,
         |         ${sqlMinhashSig(s"list_distinct(${sqlShingles(3)})", nh)} AS sig
         |  FROM raw
         |), banded AS (
         |  $bandKeys
         |), cand AS (
         |  SELECT b2.id AS id, a.id AS earlier, a.sig AS sa, b2.sig AS sb
         |  FROM banded a JOIN banded b2
         |    ON a.band = b2.band AND a.bh = b2.bh AND a.id < b2.id
         |), m AS (
         |  SELECT id, MIN(earlier) AS dup_of FROM cand
         |  WHERE len(list_filter(generate_series(1, $nh), i -> sa[i] = sb[i]))
         |        >= ${nh / 2}
         |  GROUP BY id)
         |SELECT s.id, m.dup_of, m.dup_of IS NULL AS keep
         |FROM sigs s LEFT JOIN m USING (id) ORDER BY s.id""".stripMargin
    },

    "dedup_minhash" -> {
      val bands = 8; val rpb = 2
      val bandKeys = (0 until bands).map { b =>
        val slice = (0 until rpb).map(r => s"CAST(sig[${b * rpb + r + 1}] AS VARCHAR)").mkString(" || '-' || ")
        s"SELECT id, shset, $b AS band, $slice AS bh FROM sigs"
      }.mkString("\n  UNION ALL\n  ")
      s"""${Tok.sqlRawSequences},
         |sigs AS (
         |  SELECT CAST(doc_id AS BIGINT) AS id,
         |         list_distinct(${sqlShingles(3)}) AS shset,
         |         ${sqlMinhashSig(s"list_distinct(${sqlShingles(3)})", bands * rpb)} AS sig
         |  FROM raw
         |), banded AS (
         |  $bandKeys
         |), cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |         round(CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE) /
         |               len(list_distinct(list_concat(a.shset, b.shset))), 6) AS jaccard
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id)
         |SELECT id_a, id_b, jaccard FROM cand WHERE jaccard >= 0.5
         |ORDER BY id_a, id_b""".stripMargin
    },

    "dedup_edit" -> {
      val bands = 8; val rpb = 2
      val bandKeys = (0 until bands).map { b =>
        val slice = (0 until rpb).map(r => s"CAST(sig[${b * rpb + r + 1}] AS VARCHAR)").mkString(" || '-' || ")
        s"SELECT id, $b AS band, $slice AS bh FROM sigs"
      }.mkString("\n  UNION ALL\n  ")
      s"""${Tok.sqlRawSequences},
         |sigs AS (
         |  SELECT CAST(doc_id AS BIGINT) AS id,
         |         ${sqlMinhashSig(s"list_distinct(${sqlShingles(3)})", bands * rpb)} AS sig
         |  FROM raw
         |), banded AS (
         |  $bandKeys
         |), cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
         |), conf AS (
         |  SELECT id_a, id_b,
         |         CAST(levenshtein(da.text, db.text) AS INTEGER) AS lev,
         |         floor((1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE) /
         |                greatest(len(da.text), len(db.text))) * 1000000.0 + 0.5) /
         |           1000000.0 AS edit_sim
         |  FROM cand JOIN documents da ON da.doc_id = id_a
         |            JOIN documents db ON db.doc_id = id_b)
         |SELECT id_a, id_b, lev, edit_sim FROM conf WHERE edit_sim >= 0.8
         |ORDER BY id_a, id_b""".stripMargin
    },

    "dedup_incr" ->
      """SELECT i.doc_id, i.source, i.n_chars FROM documents i
        |WHERE i.doc_id % 2 = 0 AND NOT EXISTS (
        |  SELECT 1 FROM documents h WHERE h.doc_id % 5 <> 4 AND h.text = i.text)
        |ORDER BY i.doc_id""".stripMargin,

    "txt_contam" ->
      s"""${Tok.sqlRawSequences},
         |tr AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |         list_distinct(${sqlShingles(3)}) AS sh
         |  FROM raw WHERE CAST(doc_id AS BIGINT) % 2 = 1),
         |ev AS (
         |  SELECT DISTINCT unnest(list_distinct(${sqlShingles(3)})) AS g
         |  FROM raw WHERE CAST(doc_id AS BIGINT) % 2 = 0),
         |tg AS (SELECT doc_id, unnest(sh) AS g FROM tr)
         |SELECT tg.doc_id, COUNT(*) AS n_grams,
         |       COUNT(ev.g) AS n_contaminated,
         |       floor(CAST(COUNT(ev.g) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000
         |         AS contam_frac
         |FROM tg LEFT JOIN ev ON tg.g = ev.g
         |GROUP BY tg.doc_id ORDER BY tg.doc_id""".stripMargin,

    "dedup_cc" ->
      s"""${Tok.sqlRawSequences.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |sh AS (
         |  SELECT CAST(doc_id AS BIGINT) AS id,
         |         list_distinct(${sqlShingles(3)}) AS shset
         |  FROM raw
         |), posting AS (
         |  SELECT id, len(shset) AS n_sh, unnest(shset) AS s FROM sh
         |), pairs AS (
         |  SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS inter
         |  FROM posting a JOIN posting b ON a.s = b.s AND a.id < b.id
         |  GROUP BY 1, 2, 3, 4
         |), edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.5
         |  UNION ALL
         |  SELECT id_b AS src, id_a AS dst FROM pairs
         |  WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.5
         |), reach AS (
         |  SELECT CAST(doc_id AS BIGINT) AS node, CAST(doc_id AS BIGINT) AS comp FROM raw
         |  UNION
         |  SELECT r.node, e.dst AS comp FROM reach r JOIN edges e ON e.src = r.comp
         |)
         |SELECT node AS doc_id, MIN(comp) AS cluster,
         |       CAST(node = MIN(comp) AS INTEGER) AS is_canonical
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,

    "dedup_keep" ->
      s"""$sqlKeepCtes
         |SELECT id AS doc_id FROM keep ORDER BY doc_id""".stripMargin,

    "doc_sample" ->
      """WITH b AS (
        |  SELECT source,
        |         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT source,
        |       bucket < CASE source WHEN 'src0' THEN 50 WHEN 'src1' THEN 10
        |                            WHEN 'src2' THEN 0 ELSE 25 END AS keep,
        |       COUNT(*) AS n
        |FROM b GROUP BY 1, 2 ORDER BY source, keep""".stripMargin,

    "doc_strat" ->
      // single-window form: global order within a group is (salt, md5, id)
      // bucket-major — identical selection to the two-phase Spark rank
      """WITH s AS (
        |  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS key,
        |         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS BIGINT) AS salt
        |  FROM documents),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY salt, key, doc_id) AS rk,
        |         COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM s)
        |SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM r WHERE rk <= ceil(n * 0.1) GROUP BY lang ORDER BY lang""".stripMargin,

    "doc_url" ->
      """WITH c AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |         (CASE WHEN (doc_id % 97) % 2 = 0 THEN 'http' ELSE 'https' END)
        |           || '://example.com/p/' || CAST(doc_id % 97 AS VARCHAR)
        |           || '?a=' || CAST((doc_id % 97) % 5 AS VARCHAR) || '&z=9' AS canonical_url
        |  FROM documents)
        |SELECT canonical_url, MIN(doc_id) AS keep_id, COUNT(*) AS n_dupes
        |FROM c GROUP BY 1 ORDER BY canonical_url""".stripMargin,

    "doc_shard" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS shard
        |  FROM documents)
        |SELECT shard, COUNT(*) AS n, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM b GROUP BY 1 ORDER BY shard""".stripMargin,

    "doc_shuffle" ->
      """WITH m AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |         (CAST(doc_id AS BIGINT) + 3 * 7919) % 2147483647 AS m1
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, ((m1 * m1) % 2147483647 * 2654435761 + m1) % 2147483647 AS h
        |  FROM m)
        |SELECT doc_id, h,
        |       row_number() OVER (ORDER BY h DESC, doc_id) AS shuffle_pos
        |FROM h ORDER BY shuffle_pos""".stripMargin,

    "doc_splitsets" ->
      """WITH b AS (
        |  SELECT CAST(('0x' || substring(md5(CAST(CAST(doc_id AS BIGINT) AS VARCHAR)), 1, 4)) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |       COUNT(*) AS n
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,

    "doc_pack" ->
      s"""${Tok.sqlRawSequences},
         |cum AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |         coalesce(SUM(n_tok) OVER (ORDER BY CAST(doc_id AS BIGINT)
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
         |  FROM raw)
         |SELECT doc_id, CAST(before // 2048 AS BIGINT) AS pack_id,
         |       CAST(before % 2048 AS BIGINT) AS pack_offset
         |FROM cum ORDER BY doc_id""".stripMargin,

    "doc_packseq" ->
      s"""${Tok.sqlRawSequences},
         |cum AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, tokens, CAST(n_tok AS BIGINT) AS n,
         |         CAST(coalesce(SUM(CAST(n_tok AS BIGINT)) OVER (ORDER BY CAST(doc_id AS BIGINT)
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS before
         |  FROM raw),
         |spans AS (
         |  SELECT doc_id, tokens, n, before,
         |         unnest(generate_series(before // 2048, (before + n - 1) // 2048)) AS pack_id
         |  FROM cum WHERE n > 0),
         |pieces AS (
         |  SELECT pack_id,
         |         greatest(before - pack_id * 2048, 0) AS pos,
         |         tokens[greatest(pack_id * 2048 - before, 0) + 1 :
         |                least(n, (pack_id + 1) * 2048 - before)] AS piece
         |  FROM spans)
         |SELECT pack_id,
         |       CAST(count(*) AS INTEGER) AS n_pieces,
         |       CAST(len(flatten(list(piece ORDER BY pos))) AS INTEGER) AS pack_len,
         |       array_to_string(flatten(list(piece ORDER BY pos)), ',') AS tok_str
         |FROM pieces GROUP BY pack_id ORDER BY pack_id""".stripMargin,

    "doc_chunk" ->
      s"""${Tok.sqlRawSequences},
         |st AS (
         |  SELECT CAST(doc_id AS BIGINT) AS doc_id, tokens, n_tok,
         |         unnest(CASE WHEN n_tok <= 0 THEN [] ELSE generate_series(0, n_tok - 1, 32) END) AS start
         |  FROM raw),
         |ch AS (
         |  SELECT doc_id, CAST(start // 32 AS INTEGER) AS chunk_idx,
         |         tokens[start + 1 : least(start + 48, n_tok)] AS chunk
         |  FROM st)
         |SELECT doc_id, chunk_idx, CAST(len(chunk) AS INTEGER) AS chunk_len,
         |       list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(chunk, t -> CAST(t AS BIGINT))),
         |                   (h, t) -> (h * ${Text.FpBase} + t) % $P) AS chunk_fp
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    "dedup_decontam" ->
      s"""${Tok.sqlRawSequences},
         |sh AS (
         |  SELECT CAST(doc_id AS BIGINT) AS id,
         |         list_distinct(${sqlShingles(3)}) AS shset
         |  FROM raw
         |), posting AS (
         |  SELECT id, len(shset) AS n_sh, unnest(shset) AS s FROM sh
         |), pairs AS (
         |  SELECT a.id AS train_id, b.id AS eval_id, a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS inter
         |  FROM posting a JOIN posting b ON a.s = b.s
         |  WHERE a.id % 2 = 1 AND b.id % 2 = 0
         |  GROUP BY 1, 2, 3, 4)
         |SELECT train_id, eval_id,
         |       round(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 6) AS jaccard
         |FROM pairs WHERE CAST(inter AS DOUBLE) / (n_a + n_b - inter) >= 0.5
         |ORDER BY train_id, eval_id""".stripMargin,

    "doc_curate" ->
      s"""$sqlCurateCtes
         |SELECT CAST(d.doc_id AS BIGINT) AS doc_id, q.quality, lang.lang_guess,
         |       CAST((CAST(d.doc_id AS BIGINT) IN (SELECT id FROM keep)
         |             AND q.quality >= 0.5 AND lang.lang_guess = 'en') AS INTEGER) AS kept
         |FROM documents d JOIN q USING (doc_id) JOIN lang USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // the full recipe composed: near-dedup keep ∧ quality ∧ langid decide
    // the corpus, then ONLY survivors pack into 2048-token training
    // sequences — pack ids/offsets shift vs doc_pack exactly by the
    // rejected docs' token mass
    "txt_e2e" ->
      s"""$sqlCurateCtes,
         |kept AS (
         |  SELECT CAST(d.doc_id AS BIGINT) AS doc_id
         |  FROM documents d JOIN qq USING (doc_id) JOIN lang USING (doc_id)
         |  WHERE CAST(d.doc_id AS BIGINT) IN (SELECT id FROM keep)
         |    AND qq.qualityq >= 0.5 AND lang.lang_guess = 'en'),
         |raw2 AS (
         |  SELECT CAST(r.doc_id AS BIGINT) AS doc_id, n_tok FROM raw r
         |  WHERE CAST(r.doc_id AS BIGINT) IN (SELECT doc_id FROM kept)),
         |cum AS (
         |  SELECT doc_id,
         |         coalesce(SUM(n_tok) OVER (ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
         |  FROM raw2)
         |SELECT doc_id, CAST(before // 2048 AS BIGINT) AS pack_id,
         |       CAST(before % 2048 AS BIGINT) AS pack_offset
         |FROM cum ORDER BY doc_id""".stripMargin,

    "dedup_simhash" ->
      s"""${Tok.sqlRawSequences},
         |hashed AS (SELECT doc_id, ${sqlSimhash16("tokens")} AS simhash FROM raw)
         |SELECT simhash, COUNT(*) AS n_docs
         |FROM hashed GROUP BY simhash HAVING COUNT(*) > 1
         |ORDER BY simhash""".stripMargin,

    "sim_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT vec_id,
        |         round(list_dot_product(CAST(embedding AS DOUBLE[]), qv) /
        |               (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
        |                sqrt(list_dot_product(qv, qv))), 6) AS sim
        |  FROM embeddings, q WHERE vec_id <> 0)
        |SELECT vec_id, sim FROM scored ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin,

    "sim_range" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT vec_id,
        |         floor((list_dot_product(CAST(embedding AS DOUBLE[]), qv) /
        |                (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
        |                 sqrt(list_dot_product(qv, qv)))) * 1e6 + 0.5) / 1e6 AS sim
        |  FROM embeddings, q WHERE vec_id <> 0)
        |SELECT vec_id, sim FROM scored WHERE sim >= 0.2
        |ORDER BY sim DESC, vec_id""".stripMargin,

    "dedup_embed" -> {
      val bands = 5; val bpb = 12
      val bandSelects = (0 until bands).map { b =>
        val bits = (0 until bpb).map(i =>
          s"(CASE WHEN embedding[${b * bpb + i + 1}] > 0 THEN ${1 << i} ELSE 0 END)")
        s"SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev, $b AS band, ${bits.mkString(" + ")} AS bk FROM embeddings"
      }.mkString("\n  UNION ALL\n  ")
      val cos = "round(list_dot_product(a.ev, b2.ev) / " +
        "(sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b2.ev, b2.ev))), 6)"
      s"""WITH banded AS (
         |  $bandSelects
         |), cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b, $cos AS sim
         |  FROM banded a JOIN banded b2 ON a.band = b2.band AND a.bk = b2.bk AND a.vec_id < b2.vec_id)
         |SELECT id_a, id_b, sim FROM cand WHERE sim >= 0.3
         |ORDER BY id_a, id_b""".stripMargin
    },

    "mm_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |       CASE CAST(doc_id AS BIGINT) % 3 WHEN 0 THEN 'image'
        |            WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |       CAST(strlen(text) AS INTEGER) AS n_bytes,
        |       CAST(CASE WHEN strlen(text) <= 1024 THEN 0
        |            WHEN strlen(text) <= 65536 THEN 1
        |            WHEN strlen(text) <= 1048576 THEN 2 ELSE 3 END AS INTEGER) AS size_bucket
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_decode" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |       CASE CAST(doc_id AS BIGINT) % 4 WHEN 0 THEN 'png'
        |            WHEN 1 THEN 'gif' WHEN 2 THEN 'bmp' ELSE 'jpeg' END AS fmt,
        |       CAST(100 + CAST(doc_id AS BIGINT) % 900 AS INTEGER) AS width,
        |       CAST(50 + CAST(doc_id AS BIGINT) % 500 AS INTEGER) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,

    // same probe/assignment CTEs as sim_ivf (round-6, matching
    // ivfAssign/probeLists), fr6 on the FINAL similarity like sim_range
    "sim_rangeidx" ->
      """WITH cent AS (
        |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
        |         FROM embeddings WHERE vec_id > 8),
        |asg AS (
        |  SELECT vec_id, ev, cid,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY
        |           round(list_dot_product(ev, cv) /
        |                 (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(cv, cv))), 6) DESC,
        |           cid) AS rk
        |  FROM base, cent),
        |lists AS (SELECT vec_id, ev, cid AS list_id FROM asg WHERE rk = 1),
        |probes AS (
        |  SELECT cid FROM cent, q
        |  ORDER BY round(list_dot_product(cv, qv) /
        |                 (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))), 6) DESC, cid
        |  LIMIT 2)
        |SELECT vec_id, list_id,
        |       floor((list_dot_product(ev, qv) /
        |              (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv)))) * 1e6 + 0.5) / 1e6 AS sim
        |FROM lists, q WHERE list_id IN (SELECT cid FROM probes)
        |  AND floor((list_dot_product(ev, qv) /
        |             (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv)))) * 1e6 + 0.5) / 1e6 >= 0.15
        |ORDER BY sim DESC, vec_id""".stripMargin,

    "sim_ivf" ->
      """WITH cent AS (
        |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        |base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
        |         FROM embeddings WHERE vec_id > 8),
        |asg AS (
        |  SELECT vec_id, ev, cid,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY
        |           round(list_dot_product(ev, cv) /
        |                 (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(cv, cv))), 6) DESC,
        |           cid) AS rk
        |  FROM base, cent),
        |lists AS (SELECT vec_id, ev, cid AS list_id FROM asg WHERE rk = 1),
        |probes AS (
        |  SELECT cid FROM cent, q
        |  ORDER BY round(list_dot_product(cv, qv) /
        |                 (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))), 6) DESC, cid
        |  LIMIT 2)
        |SELECT vec_id, list_id,
        |       round(list_dot_product(ev, qv) /
        |             (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))), 6) AS sim
        |FROM lists, q WHERE list_id IN (SELECT cid FROM probes)
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,

    "sim_pq" -> {
      // same construction: subspace slices, floor-rounded L2² via the
      // dot(a,a) - 2·dot(a,c) + dot(c,c) expansion, argmin (ties -> lowest
      // code), ADC summed in explicit left-to-right order
      val l2 = (a: String, b: String) =>
        s"floor((list_dot_product($a, $a) - 2.0 * list_dot_product($a, $b) + " +
          s"list_dot_product($b, $b)) * 1000000 + 0.5) / 1000000"
      s"""WITH sub AS (SELECT unnest(range(4)) AS j),
         |cb AS (SELECT j, vec_id - 1 AS code,
         |              list_slice(CAST(embedding AS DOUBLE[]), j*16 + 1, j*16 + 16) AS cv
         |       FROM embeddings, sub WHERE vec_id BETWEEN 1 AND 8),
         |q AS (SELECT j, list_slice(CAST(embedding AS DOUBLE[]), j*16 + 1, j*16 + 16) AS qv
         |      FROM embeddings, sub WHERE vec_id = 0),
         |base AS (SELECT vec_id, j, list_slice(CAST(embedding AS DOUBLE[]), j*16 + 1, j*16 + 16) AS ev
         |         FROM embeddings, sub WHERE vec_id > 8),
         |scored AS (SELECT b.vec_id, b.j, cb.code, ${l2("ev", "cv")} AS d2
         |           FROM base b JOIN cb ON b.j = cb.j),
         |enc AS (SELECT vec_id, j, code,
         |               row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, code) AS rk
         |        FROM scored),
         |codes AS (SELECT vec_id, j, code FROM enc WHERE rk = 1),
         |dt AS (SELECT cb.j, cb.code, ${l2("qv", "cv")} AS d
         |       FROM cb JOIN q ON cb.j = q.j),
         |cd AS (SELECT c.vec_id, c.j, c.code, dt.d
         |       FROM codes c JOIN dt ON c.j = dt.j AND c.code = dt.code),
         |piv AS (SELECT vec_id,
         |          MAX(CASE WHEN j = 0 THEN code END) AS c0,
         |          MAX(CASE WHEN j = 1 THEN code END) AS c1,
         |          MAX(CASE WHEN j = 2 THEN code END) AS c2,
         |          MAX(CASE WHEN j = 3 THEN code END) AS c3,
         |          MAX(CASE WHEN j = 0 THEN d END) AS d0,
         |          MAX(CASE WHEN j = 1 THEN d END) AS d1,
         |          MAX(CASE WHEN j = 2 THEN d END) AS d2,
         |          MAX(CASE WHEN j = 3 THEN d END) AS d3
         |        FROM cd GROUP BY vec_id)
         |SELECT vec_id, concat_ws(',', c0, c1, c2, c3) AS code_str,
         |       ((d0 + d1) + d2) + d3 AS adc_dist
         |FROM piv ORDER BY vec_id""".stripMargin
    },

    "sim_ivfpq" -> {
      val l2 = (a: String, b: String) =>
        s"floor((list_dot_product($a, $a) - 2.0 * list_dot_product($a, $b) + " +
          s"list_dot_product($b, $b)) * 1000000 + 0.5) / 1000000"
      val cos = (x: String, y: String) =>
        s"round(list_dot_product($x, $y) / " +
          s"(sqrt(list_dot_product($x, $x)) * sqrt(list_dot_product($y, $y))), 6)"
      s"""WITH cent AS (
         |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
         |qf AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         |basef AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
         |          FROM embeddings WHERE vec_id > 8),
         |asg AS (
         |  SELECT vec_id, ev, cid,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY ${cos("ev", "cv")} DESC, cid) AS rk
         |  FROM basef, cent),
         |probes AS (
         |  SELECT cid FROM cent, qf
         |  ORDER BY ${cos("cv", "qv")} DESC, cid LIMIT 2),
         |surv AS (SELECT vec_id, cid AS list_id, ev FROM asg
         |         WHERE rk = 1 AND cid IN (SELECT cid FROM probes)),
         |sub AS (SELECT unnest(range(4)) AS j),
         |cb AS (SELECT j, e.vec_id - 1 AS code,
         |              list_slice(CAST(e.embedding AS DOUBLE[]), j*16 + 1, j*16 + 16) AS cv
         |       FROM embeddings e, sub WHERE e.vec_id BETWEEN 1 AND 8),
         |qs AS (SELECT j, list_slice(qv, j*16 + 1, j*16 + 16) AS qv FROM qf, sub),
         |bsub AS (SELECT vec_id, list_id, j, list_slice(ev, j*16 + 1, j*16 + 16) AS ev
         |         FROM surv, sub),
         |scored AS (SELECT b.vec_id, b.list_id, b.j, cb.code, ${l2("ev", "cv")} AS d2
         |           FROM bsub b JOIN cb ON b.j = cb.j),
         |enc AS (SELECT vec_id, list_id, j, code,
         |               row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, code) AS rk
         |        FROM scored),
         |codes AS (SELECT vec_id, list_id, j, code FROM enc WHERE rk = 1),
         |dt AS (SELECT cb.j, cb.code, ${l2("qs.qv", "cv")} AS d
         |       FROM cb JOIN qs ON cb.j = qs.j),
         |cd AS (SELECT c.vec_id, c.list_id, c.j, c.code, dt.d
         |       FROM codes c JOIN dt ON c.j = dt.j AND c.code = dt.code),
         |piv AS (SELECT vec_id, list_id,
         |          MAX(CASE WHEN j = 0 THEN code END) AS c0,
         |          MAX(CASE WHEN j = 1 THEN code END) AS c1,
         |          MAX(CASE WHEN j = 2 THEN code END) AS c2,
         |          MAX(CASE WHEN j = 3 THEN code END) AS c3,
         |          MAX(CASE WHEN j = 0 THEN d END) AS d0,
         |          MAX(CASE WHEN j = 1 THEN d END) AS d1,
         |          MAX(CASE WHEN j = 2 THEN d END) AS d2,
         |          MAX(CASE WHEN j = 3 THEN d END) AS d3
         |        FROM cd GROUP BY vec_id, list_id)
         |SELECT vec_id, list_id, concat_ws(',', c0, c1, c2, c3) AS code_str,
         |       ((d0 + d1) + d2) + d3 AS adc_dist
         |FROM piv ORDER BY vec_id""".stripMargin
    },

    // sim_pq's ADC pipeline -> top-50 shortlist -> exact-cosine re-rank
    "sim_rerank" -> {
      val l2 = (a: String, b: String) =>
        s"floor((list_dot_product($a, $a) - 2.0 * list_dot_product($a, $b) + " +
          s"list_dot_product($b, $b)) * 1000000 + 0.5) / 1000000"
      s"""WITH sub AS (SELECT unnest(range(4)) AS j),
         |cb AS (SELECT j, vec_id - 1 AS code,
         |              list_slice(CAST(embedding AS DOUBLE[]), j*16 + 1, j*16 + 16) AS cv
         |       FROM embeddings, sub WHERE vec_id BETWEEN 1 AND 8),
         |q AS (SELECT j, list_slice(CAST(embedding AS DOUBLE[]), j*16 + 1, j*16 + 16) AS qv
         |      FROM embeddings, sub WHERE vec_id = 0),
         |base AS (SELECT vec_id, j, list_slice(CAST(embedding AS DOUBLE[]), j*16 + 1, j*16 + 16) AS ev
         |         FROM embeddings, sub WHERE vec_id > 8),
         |scored AS (SELECT b.vec_id, b.j, cb.code, ${l2("ev", "cv")} AS d2
         |           FROM base b JOIN cb ON b.j = cb.j),
         |enc AS (SELECT vec_id, j, code,
         |               row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, code) AS rk
         |        FROM scored),
         |codes AS (SELECT vec_id, j, code FROM enc WHERE rk = 1),
         |dt AS (SELECT cb.j, cb.code, ${l2("qv", "cv")} AS d
         |       FROM cb JOIN q ON cb.j = q.j),
         |cd AS (SELECT c.vec_id, c.j, dt.d
         |       FROM codes c JOIN dt ON c.j = dt.j AND c.code = dt.code),
         |piv AS (SELECT vec_id,
         |          MAX(CASE WHEN j = 0 THEN d END) AS d0,
         |          MAX(CASE WHEN j = 1 THEN d END) AS d1,
         |          MAX(CASE WHEN j = 2 THEN d END) AS d2,
         |          MAX(CASE WHEN j = 3 THEN d END) AS d3
         |        FROM cd GROUP BY vec_id),
         |short AS (SELECT vec_id FROM (
         |            SELECT vec_id, ((d0 + d1) + d2) + d3 AS adc_dist FROM piv)
         |          ORDER BY adc_dist, vec_id LIMIT 50),
         |qf AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |       round(list_dot_product(CAST(e.embedding AS DOUBLE[]), qf.qv) /
         |             (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
         |                                    CAST(e.embedding AS DOUBLE[]))) *
         |              sqrt(list_dot_product(qf.qv, qf.qv))), 6) AS sim
         |FROM embeddings e JOIN short s ON e.vec_id = s.vec_id, qf
         |ORDER BY sim DESC, e.vec_id LIMIT 10""".stripMargin
    },

    "sim_buckets" -> {
      val bits = (0 until 8).map(i => s"(CASE WHEN embedding[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)")
      s"""SELECT CAST(${bits.mkString(" + ")} AS INTEGER) AS bucket, COUNT(*) AS n
         |FROM embeddings GROUP BY 1 ORDER BY bucket""".stripMargin
    },

    "dedup_sem" -> {
      val cos = (x: String, y: String) =>
        s"round(list_dot_product($x, $y) / " +
          s"(sqrt(list_dot_product($x, $x)) * sqrt(list_dot_product($y, $y))), 6)"
      s"""WITH cent AS (
         |  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings WHERE vec_id BETWEEN 1 AND 8),
         |base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
         |asg AS (
         |  SELECT vec_id, ev, cid,
         |         row_number() OVER (PARTITION BY vec_id
         |           ORDER BY ${cos("ev", "cv")} DESC, cid) AS rk
         |  FROM base, cent),
         |lists AS (SELECT vec_id, ev, cid AS list_id FROM asg WHERE rk = 1),
         |dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM lists a JOIN lists b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
         |  WHERE ${cos("a.ev", "b.ev")} >= 0.3)
         |SELECT l.vec_id, l.list_id, (d.vec_id IS NULL) AS keep
         |FROM lists l LEFT JOIN dropped d ON l.vec_id = d.vec_id
         |ORDER BY l.vec_id""".stripMargin
    },

    "txt_classify" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |w AS (
        |  SELECT doc_id,
        |         (CAST('0x' || substr(md5(tok), 1, 6) AS BIGINT) % 1024)
        |           * 2654435761 % 2001 - 1000 AS wt
        |  FROM t),
        |agg AS (
        |  SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS score,
        |         CAST(COUNT(*) AS INTEGER) AS n_tok
        |  FROM w GROUP BY doc_id)
        |SELECT doc_id, n_tok, score, CAST(score AS DOUBLE) / n_tok AS score_per_tok,
        |       score > 0 AS keep
        |FROM agg ORDER BY doc_id""".stripMargin,
  )
}
