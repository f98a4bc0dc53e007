package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time the dedup_cc gate's two halves (pair generation vs the
  * CC loop) and print per-phase wall + the loop's round count (via a
  * listener counting checkpoint jobs). Usage: runMain graft.tools.CcProbe [sf]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.model.Tok
    for (i <- 1 to 3) {
      s.catalog.clearCache()
      val t0 = System.nanoTime()
      val raw = Tok.rawSequences(s.read.parquet(s"$dir/documents.parquet"))
        .withColumn("doc_id", col("doc_id").cast("long"))
      val pairs = graft.functions.Dedup.jaccardPairs(raw, "tokens", "doc_id", 3, 0.5)
      val nPairs = pairs.count()
      val t1 = System.nanoTime()
      val comp = graft.functions.Dedup.connectedComponents(pairs, "id_a", "id_b")
      val nComp = comp.count()
      val t2 = System.nanoTime()
      println(f"CCPROBE run$i pairs=$nPairs (${(t1 - t0) / 1e9}%.2f s) " +
        f"cc_nodes=$nComp (${(t2 - t1) / 1e9}%.2f s)")
    }
    s.stop()
  }
}
