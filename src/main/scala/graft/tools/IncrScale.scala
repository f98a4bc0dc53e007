package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence probe for bloom-gated incremental dedup (PLANS_r05.md):
  * a FIXED-size increment deduped against a GROWING history. The claims
  * under test:
  *   - the history side is scanned once and never shuffled (plan holds no
  *     SortMergeJoin at any size — every join builds a candidate-sized
  *     broadcast), so wall time grows only with the single history scan;
  *   - the confirm volume stays candidate-bounded: bloom candidates ≈
  *     true dups + fpp·|incoming| regardless of history size.
  *
  * Usage: sbt "runMain graft.tools.IncrScale"
  */
object IncrScale {
  def main(args: Array[String]): Unit = {
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

    // incoming: 100k rows, 10% duplicating history texts (ids 0..9999 of
    // history), 90% fresh content
    val nIn = 100000L
    val incoming = s.range(0, nIn, 1, 32)
      .select(col("id").as("doc_id"),
        when(col("id") % 10 === 0, concat(lit("hist text "), col("id")))
          .otherwise(concat(lit("fresh text "), col("id"))).as("text"))

    for (nHist <- Seq(1000000L, 4000000L, 16000000L)) {
      val history = s.range(0, nHist, 1, 32)
        .select(concat(lit("hist text "), col("id")).as("text"))
      val res = graft.functions.Dedup.incrementalNew(
        history, incoming, "text", expectedItems = nHist, fpp = 0.01)
      val plan = res.queryExecution.executedPlan.toString
      require(!plan.contains("SortMergeJoin"),
        "history side must never shuffle-join:\n" + plan)
      val (kept, secs) = time(res.count())
      s.catalog.clearCache()
      val dups = nIn / 10
      println(f"incr hist=$nHist kept=$kept expected=${nIn - dups} " +
        f"secs=$secs%.2f hist_rows_per_sec=${(nHist / secs).toLong}")
      require(kept == nIn - dups, s"kept wrong: $kept")
    }
    s.stop()
  }
}
