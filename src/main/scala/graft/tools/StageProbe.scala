package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev tool: stage-duration breakdown for one registered query. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val dur = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1000.0
        val m = i.taskMetrics
        println(f"stage ${i.stageId}%3d ${i.numTasks}%4d tasks ${dur}%8.2f s " +
          f"cpu=${m.executorCpuTime / 1e9}%8.1f run=${m.executorRunTime / 1e3}%8.1f " +
          f"in=${m.inputMetrics.recordsRead}%10d shRead=${m.shuffleReadMetrics.recordsRead}%10d " +
          f"shWrite=${m.shuffleWriteMetrics.recordsWritten}%10d  ${i.name.takeWhile(_ != '\n')}")
      }
    })
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(s, dir).count()
    println(f"TOTAL: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    s.stop()
  }
}
