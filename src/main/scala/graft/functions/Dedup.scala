package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for large-scale training-data pipelines:
  * exact (hash-groupBy), MinHash+LSH banding, SimHash, n-gram Jaccard.
  *
  * Scale design: every algorithm here is a bounded-fanout shuffle —
  *  - exact dedup shuffles on a 256-bit content hash (uniform keys);
  *  - MinHash/LSH shuffles on (band_id, band_hash) buckets, so candidate
  *    generation is local to a bucket and never quadratic in the corpus;
  *  - candidate verification joins only within buckets.
  * No collect(), no cross join; AQE splits any hot bucket.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical content hash.
    * Returns the input plus `content_hash`, `is_dup` (true for all but the
    * keeper) — callers filter(!is_dup) to materialize the deduped corpus.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy("content_hash").orderBy(col(idCol))
    df.withColumn("content_hash", sha2(col(textCol), 256))
      .withColumn("is_dup", row_number().over(w) > 1)
  }

  /** MinHash+LSH candidate pairs: signature -> `bands` bands of `rowsPerBand`
    * hashes -> bucket join. Returns (id_a, id_b) candidate pairs (a < b),
    * deduplicated across bands, with their exact Jaccard over shingles.
    */
  def minhashCandidates(df: DataFrame, tokensCol: String, idCol: String,
                        shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
                        jaccardThreshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val withSig = df
      .withColumn("_shingles", array_distinct(Text.shingleIds(col(tokensCol), shingleK)))
      .withColumn("_sig", Text.minhashSignature(col("_shingles"), numHashes))
    // band key: (band index, canonical string of the band's signature slice)
    // — a portable key (no engine-specific hash function), still uniform
    // because minhash values are themselves uniform
    val banded = withSig.select(
      col(idCol).as("id"), col("_shingles"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          array_join(transform(slice(col("_sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            _.cast("string")), "-").as("bh")))).as("bk"))
      .select(col("id"), col("_shingles"), col("bk.band"), col("bk.bh"))
    val a = banded.select(col("band"), col("bh"), col("id").as("id_a"), col("_shingles").as("sh_a"))
    val b = banded.select(col("band"), col("bh"), col("id").as("id_b"), col("_shingles").as("sh_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), Text.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= jaccardThreshold)
  }

  /** SimHash near-dup candidates: identical 16-bit simhash -> candidate
    * bucket (cheap first pass; callers verify with hamming/jaccard).
    */
  def simhashBuckets(df: DataFrame, tokensCol: String, idCol: String): DataFrame =
    df.withColumn("simhash", Text.simhash16(col(tokensCol)))
      .groupBy("simhash")
      .agg(count(lit(1)).as("n_docs"), sort_array(collect_list(col(idCol))).as("doc_ids"))
      .filter(col("n_docs") > 1)

  /** Exact n-gram Jaccard pairs via shingle inverted index (no LSH
    * approximation): explode shingles, join on shingle, count shared,
    * compute |A∩B| / (|A|+|B|-|A∩B|). Quadratic only within a shingle's
    * posting list — safe for corpora where no shingle is ubiquitous; for
    * web-scale corpora prefer [[minhashCandidates]].
    */
  def jaccardPairs(df: DataFrame, tokensCol: String, idCol: String,
                   shingleK: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(Text.shingleIds(col(tokensCol), shingleK)).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val posting = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("s"))
    val p2 = posting.select(col("s"), col("id").as("id_b"), col("n_sh").as("n_sh_b"))
    posting.join(p2, "s")
      .filter(col("id") < col("id_b"))
      .groupBy(col("id").as("id_a"), col("id_b"), col("n_sh"), col("n_sh_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_sh") + col("n_sh_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
