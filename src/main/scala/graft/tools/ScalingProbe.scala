package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.StandardPipeline

/** Dev tool: iterate on the scaling experiment without running full Bench.
  * Usage: sbt "runMain graft.tools.ScalingProbe [reps] [parts]"
  */
object ScalingProbe {
  def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def amplified(spark: SparkSession, dir: String, reps: Int, parts: Int): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    spark.range(0, reps, 1, parts).withColumnRenamed("id", "rep")
      .join(broadcast(docs))
      .withColumn("doc_id", col("doc_id") * reps + col("rep"))
      .drop("rep")
  }

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(1600)
    val parts = args.drop(1).headOption.map(_.toInt).getOrElse(128)
    def runAt(n: Int): Unit = {
      val s = session(n)
      try {
        val input = amplified(s, "/root/testdata/sf0.1", reps, parts)
        StandardPipeline.over(s, input).counts.collect() // warmup
        for (i <- 1 to 3) {
          val t0 = System.nanoTime()
          StandardPipeline.over(s, input).counts.collect()
          println(f"local[$n] run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      } finally s.stop()
    }
    val levels = args.drop(2).toSeq.map(_.toInt) match { case Nil => Seq(8, 32); case xs => xs }
    levels.foreach(runAt)
  }
}
