package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostics for the dedup_edit verify stage. */
object EditProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.model.Tok

    val d = s.read.parquet(s"$dir/documents.parquet")
      .withColumn("doc_id", col("doc_id").cast("long"))
      .withColumn("tokens", Tok.tokenize(col("text")))
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    println(s"docs: ${d.count()}")
    d.select(min(length(col("text"))), avg(length(col("text"))),
      max(length(col("text")))).show()

    val cands = graft.functions.Dedup.minhashCandidates(
      d, "tokens", "doc_id", 3, 8, 2, jaccardThreshold = 0.0)
    val (nc, tc) = time(cands.count())
    println(f"band candidates: $nc in $tc%.1f s")
    graft.plans.CacheScope.release()

    val ep = graft.functions.Dedup.editPairs(d, "text", "tokens", "doc_id", 3, 8, 2, 0.8)
    val (ne, te) = time(ep.count())
    println(f"editPairs: $ne in $te%.1f s")
    val plan = ep.queryExecution.executedPlan.toString
    println(plan.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") ||
      l.contains("levenshtein") || l.contains("AQE")).take(25).mkString("\n"))
    val (ne2, te2) = time(ep.count())
    println(f"editPairs warm: $ne2 in $te2%.1f s")

    // stage isolation: the same joins WITHOUT levenshtein
    val cands2 = graft.functions.Dedup.minhashCandidates(
      d, "tokens", "doc_id", 3, 8, 2, jaccardThreshold = 0.0).select("id_a", "id_b")
    val txt = d.select(col("doc_id"), col("text"))
    val paired = cands2
      .join(txt.select(col("doc_id").as("id_a"), col("text").as("_ta")), "id_a")
      .join(txt.select(col("doc_id").as("id_b"), col("text").as("_tb")), "id_b")
    val (np, tp) = time(paired.count())
    println(f"paired (no lev): $np in $tp%.1f s")
    val (nl, tl) = time(paired.select(levenshtein(col("_ta"), col("_tb")).as("lev"))
      .agg(sum("lev")).collect()(0).getLong(0))
    println(f"lev once per pair: sum=$nl in $tl%.1f s")
    s.stop()
  }
}
