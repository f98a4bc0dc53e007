package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence probe for connected-components clustering (SCALE.md):
  * synthesizes edge graphs of the near-dup shape — many small cliques plus
  * a sprinkle of longer chains — at growing edge counts, and times
  * `Dedup.connectedComponents` at each size. The claims under test:
  * rounds stay O(log diameter) (constant for a fixed graph SHAPE as the
  * graph GROWS), and per-round work scales with the edge set, so total
  * wall time grows ~linearly while cluster counts stay exact.
  *
  * Usage: sbt "runMain graft.tools.CcScale"
  */
object CcScale {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // graph: nClusters cliques of size 5 (10 edges each) + nClusters/10
    // chains of length 12 (the adversarial tail) — disjoint node spaces
    def edges(nClusters: Long) = {
      val clique = s.range(0, nClusters, 1, 32)
        .select(col("id").as("c"), explode(lit((for {
          a <- 0 until 5; b <- (a + 1) until 5
        } yield (a, b)).toArray.map { case (a, b) => s"$a-$b" })).as("pair"))
        .select(
          (col("c") * 100 + split(col("pair"), "-")(0).cast("long")).as("src"),
          (col("c") * 100 + split(col("pair"), "-")(1).cast("long")).as("dst"))
      val chains = s.range(0, nClusters / 10, 1, 32)
        .select(col("id").as("c"), explode(lit((0 until 11).toArray)).as("i"))
        .select(
          (lit(1000000000L) + col("c") * 100 + col("i")).as("src"),
          (lit(1000000000L) + col("c") * 100 + col("i") + 1).as("dst"))
      clique.union(chains)
    }

    for (n <- Seq(20000L, 80000L, 320000L)) {
      val e = edges(n)
      val nEdges = e.count()
      val ((nNodes, nComps), secs) = time {
        val comps = graft.functions.Dedup.connectedComponents(e, "src", "dst")
        (comps.count(), comps.select("comp").distinct().count())
      }
      s.catalog.clearCache()
      val expected = n + n / 10
      println(f"cc clusters=$n edges=$nEdges nodes=$nNodes comps=$nComps " +
        f"expected=$expected secs=$secs%.2f edges_per_sec=${(nEdges / secs).toLong}")
      require(nComps == expected, s"component count wrong: $nComps != $expected")
    }
    s.stop()
  }
}
