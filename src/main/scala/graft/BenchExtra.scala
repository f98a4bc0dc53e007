package graft

import org.apache.spark.sql.SparkSession

/** Extra benchmark main (guide §1.4): the per-query half of [[Bench]] only —
  * same session config, same min-of-2 / clearCache methodology — with an
  * optional substring filter, so one gate family can be re-timed in seconds
  * during optimization instead of the full 20-minute scaling bench.
  * [[Bench]] itself is frozen for the driver; this is the dev-loop tool.
  *
  * Usage: sbt "runMain graft.BenchExtra [filter ...]"
  *   env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.isEmpty || args.exists(n.contains))
    // warmup (JIT, codegen) — same as Bench
    StandardPipeline.fromDir(spark, sfDir).counts.collect()
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val secs = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        time {
          try fn(spark, sfDir).count()
          catch { case e: Throwable => System.err.println(s"[benchextra] $name failed: $e"); -1L }
        }
      }
      println(f"BENCHX $name ${secs.min}%.3f")
      name -> secs.min
    }
    println(f"""BENCHX_TOTAL ${results.map(_._2).sum}%.3f over ${results.size} queries""")
    spark.stop()
  }
}
