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

  /** Brute-force cosine top-k vs a literal query vector. */
  def topK(embeddings: DataFrame, embCol: String, idCol: String,
           query: Seq[Float], k: Int): DataFrame = {
    val q = typedLit(query)
    embeddings
      .select(col(idCol), round(cosine(col(embCol), q), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

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

  /** All-pairs candidate generation within sign buckets (ANN join for
    * embedding near-dup detection): bucket -> self-join -> exact cosine.
    */
  def bucketedPairs(embeddings: DataFrame, embCol: String, idCol: String,
                    nbits: Int = 8, minSim: Double = 0.9): DataFrame = {
    val b = embeddings.select(col(idCol).as("id"), col(embCol).as("emb"),
      signBucket(col(embCol), nbits).as("bucket"))
    val b2 = b.select(col("bucket"), col("id").as("id_b"), col("emb").as("emb_b"))
    b.join(b2, "bucket")
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"),
        round(cosine(col("emb"), col("emb_b")), 6).as("sim"))
      .filter(col("sim") >= minSim)
  }
}
