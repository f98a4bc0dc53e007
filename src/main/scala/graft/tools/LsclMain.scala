package graft.tools

import org.apache.spark.sql.SparkSession

/** The `bin/logstash -f pipeline.conf` equivalent: run a config file
  * end-to-end on Spark.
  *
  *   spark-submit --class graft.tools.LsclMain app.jar <config-file> <outDir> [master]
  *
  * Parses the LSCL text (env vars from the real environment, like the
  * reference), builds input -> filter -> routed-output plans, executes with
  * the production session defaults (AQE, skew-join handling, dynamic
  * partition overwrite), prints the per-sink counts and the node-stats JSON.
  */
object LsclMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: LsclMain <config-file> <outDir> [master]")
    val configText = java.nio.file.Files.readString(java.nio.file.Paths.get(args(0)))
    val outDir = args(1)
    val master = if (args.length > 2) args(2) else "local[*]"
    val spark = graft.LogPipeline.session("graft-lscl", master,
      shufflePartitions = Runtime.getRuntime.availableProcessors * 2)
    spark.sparkContext.setLogLevel("WARN")
    try {
      val result = graft.lscl.LsclRun.runConfig(spark, configText, outDir)
      result.counts.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"$k\t$v") }
      println(graft.operators.Route.nodeStats(spark, outDir))
    } finally spark.stop()
  }
}
