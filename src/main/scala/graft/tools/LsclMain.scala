package graft.tools

import org.apache.spark.sql.SparkSession

/** The `bin/logstash` equivalent: run config text end-to-end on Spark.
  *
  *   # single pipeline (bin/logstash -f pipeline.conf):
  *   spark-submit --class graft.tools.LsclMain app.jar <config-file> <outDir> [master]
  *
  *   # multiple pipelines (bin/logstash with config/pipelines.yml):
  *   spark-submit ... LsclMain --pipelines <pipelines.yml> <outRoot> [master]
  *
  *   # streaming (the reference's actual always-on mode; file-tail/generator
  *   # inputs, checkpointed offsets, exactly-once restart):
  *   spark-submit ... LsclMain --stream <config-file> <outDir> [master]
  *
  * Parses the LSCL text (env vars from the real environment, like the
  * reference), builds input -> filter -> routed-output plans, executes with
  * the production session defaults (AQE, skew-join handling, dynamic
  * partition overwrite), prints the per-sink counts and the node-stats JSON.
  * `--pipelines` converges the whole set (create/reload only what changed,
  * address-bus wiring across configs) and prints per-pipeline counts.
  */
object LsclMain {
  def main(args: Array[String]): Unit = {
    val (mode, rest) = args.headOption match {
      case Some("--pipelines") => ("pipelines", args.tail)
      case Some("--stream") => ("stream", args.tail)
      case _ => ("single", args)
    }
    require(rest.length >= 2,
      "usage: LsclMain [--pipelines|--stream] <config-file> <outDir> [master]")
    val outDir = rest(1)
    val master = if (rest.length > 2) rest(2) else "local[*]"
    val spark = graft.LogPipeline.session("graft-lscl", master,
      shufflePartitions = Runtime.getRuntime.availableProcessors * 2)
    spark.sparkContext.setLogLevel("WARN")
    try {
      mode match {
        case "pipelines" =>
          val specs = graft.lscl.Pipelines.fromYaml(rest(0))
          val reg = new graft.lscl.Pipelines.Registry(spark, outDir)
          val actions = reg.converge(specs)
          actions.foreach(a => println(s"${a.getClass.getSimpleName}\t${a.id}"))
          reg.running.toSeq.sortBy(_._1).foreach { case (id, st) =>
            st.lastResult.foreach(_.counts.toSeq.sortBy(_._1).foreach {
              case (k, v) => println(s"$id\t$k\t$v")
            })
          }
        case "stream" =>
          val configText = java.nio.file.Files.readString(java.nio.file.Paths.get(rest(0)))
          val q = graft.lscl.LsclRun.runConfigStream(spark, configText, outDir,
            s"$outDir/_checkpoint")
          q.awaitTermination() // runs until the trigger drains / is killed
          println(graft.operators.Route.nodeStats(spark, outDir))
        case _ =>
          val configText = java.nio.file.Files.readString(java.nio.file.Paths.get(rest(0)))
          val result = graft.lscl.LsclRun.runConfig(spark, configText, outDir)
          result.counts.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"$k\t$v") }
          println(graft.operators.Route.nodeStats(spark, outDir))
      }
    } finally spark.stop()
  }
}
