package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence probe for the dedup/ANN suite (SCALE.md §6/§7): times the
  * full keep-set decision over deterministically amplified corpora (each
  * document replicated R times with fresh ids — the classic
  * exact-duplicate-heavy web crawl shape) and the banded-LSH / IVF paths at
  * sf0.1. Prints one line per measurement.
  *
  * Usage: sbt "runMain graft.tools.DedupScale [sfDir]"
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def amplifiedDocs(reps: Int): DataFrame = {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      s.range(0, reps, 1, 32).withColumnRenamed("id", "rep")
        .join(broadcast(docs))
        .withColumn("doc_id", col("doc_id").cast("long") * reps + col("rep"))
        .drop("rep")
    }

    for (reps <- Seq(1, 4, 16)) {
      val raw = graft.model.Tok.rawSequences(amplifiedDocs(reps))
      val nDocs = raw.count()
      val (kept, secs) = time {
        graft.functions.Dedup.keepSet(raw, "tokens", "doc_id",
          shingleK = 3, bands = 8, rowsPerBand = 2, jaccardThreshold = 0.5).count()
      }
      s.catalog.clearCache()
      println(f"keep_set reps=$reps docs=$nDocs kept=$kept secs=$secs%.2f docs_per_sec=${(nDocs / secs).toLong}")
    }

    for (q <- Seq("dedup_minhash", "dedup_jaccard", "dedup_embed", "sim_ivf", "sim_topk", "sim_buckets")) {
      val secs = (1 to 2).map { _ =>
        s.catalog.clearCache()
        time(graft.SparkEntry.queries(q)(s, dir).count())._2
      }.min
      println(f"$q%s sf0.1 secs=$secs%.2f")
    }
    s.stop()
  }
}
