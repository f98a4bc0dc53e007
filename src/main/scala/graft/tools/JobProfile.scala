package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev tool: run one registered query and print every Spark job it submits —
  * wall time, stage/task counts and the callsite — so the fixed-job-count
  * overhead of commit-protocol-style gates is visible (guide §1: measure
  * where the time actually goes before touching anything).
  *
  * Usage: sbt "runMain graft.tools.JobProfile <query> [runs] [sfDir]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val dir = args.drop(2).headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    case class JobRec(id: Int, var desc: String, var start: Long = 0L,
                      var end: Long = 0L, var tasks: Int = 0, var stages: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs(e.jobId) = JobRec(e.jobId, desc, start = e.time)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val sid = e.stageInfo.stageId
        // attribute to the most recent unfinished job (good enough for a dev tool)
        jobs.values.lastOption.foreach { j => j.stages += 1; j.tasks += e.stageInfo.numTasks }
      }
    }
    s.sparkContext.addSparkListener(listener)

    for (i <- 1 to runs) {
      jobs.synchronized(jobs.clear())
      s.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(s, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      val snap = jobs.synchronized(jobs.values.toVector)
      println(f"==== $name run$i: $wall%.3f s, $n rows, ${snap.size} jobs ====")
      val byDesc = snap.groupBy(_.desc).map { case (d, js) =>
        (d, js.size, js.map(j => (j.end - j.start) / 1e3).sum, js.map(_.tasks).sum)
      }.toVector.sortBy(-_._3)
      var cum = 0.0
      for (j <- snap) {
        val dur = (j.end - j.start) / 1e3
        cum += dur
        println(f"  job ${j.id}%3d ${dur}%7.3f s tasks=${j.tasks}%4d  ${j.desc.take(110)}")
      }
      println(f"  -- sum of job walls: $cum%.3f s (gaps = driver-side work: ${wall - cum}%.3f s)")
      println("  -- grouped by callsite --")
      for ((d, cnt, tot, tasks) <- byDesc.take(25))
        println(f"  $tot%7.3f s  n=$cnt%3d tasks=$tasks%5d  ${d.take(100)}")
    }
    s.stop()
  }
}
