package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time one registered query N times in one session.
  * Usage: sbt "runMain graft.tools.QueryProbe <query> [runs] [sfDir]"
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val dir = args.drop(2).headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to runs) {
      if (args.contains("--clear")) s.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(s, dir).count()
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    s.stop()
  }
}
