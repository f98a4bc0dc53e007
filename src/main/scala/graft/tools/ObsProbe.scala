package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe: does Observation collect metrics on a DataFrameWriter
  * parquet write (V1 InsertIntoHadoopFsRelationCommand) in Spark 4.1?
  * Checks count/min/max on a normal frame, an EMPTY frame, and an observe
  * placed on an INTERMEDIATE frame below further operators.
  */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("obsprobe").toString

    val df = s.range(0, 1000).toDF("id")
      .withColumn("name", concat(lit("k"), col("id") % 7))
    val obs = Observation()
    df.observe(obs, count(lit(1)).as("rows"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"), min(col("name")).as("min_n"),
        max(col("name")).as("max_n"))
      .write.mode("overwrite").parquet(s"$tmp/a")
    println(s"OBS_FULL ${obs.get.toSeq.sortBy(_._1)}")

    val obs2 = Observation()
    df.filter(col("id") < 0)
      .observe(obs2, count(lit(1)).as("rows"), min(col("id")).as("min_id"))
      .write.mode("overwrite").parquet(s"$tmp/b")
    println(s"OBS_EMPTY ${obs2.get.toSeq.sortBy(_._1)}")

    // observe below a distinct + union (intermediate node)
    val obs3 = Observation()
    val d1 = df.select(col("id")).observe(obs3, count(lit(1)).as("n1"))
    d1.union(s.range(0, 10).toDF("id")).distinct()
      .write.mode("overwrite").parquet(s"$tmp/c")
    println(s"OBS_MID ${obs3.get.toSeq.sortBy(_._1)}")

    // does an eager localCheckpoint fire observed metrics?
    val obs4 = Observation()
    val cp = df.observe(obs4, count(lit(1)).as("n"),
        sum(when(col("id") % 2 === 0, 1L).otherwise(0L)).as("even"))
      .localCheckpoint(true)
    println(s"OBS_CKPT_rows=${cp.count()} metrics=" + {
      val f = obs4.future
      try scala.concurrent.Await.result(f,
          scala.concurrent.duration.Duration(3, "s")).toSeq.sortBy(_.toString).toString
      catch { case e: Throwable => s"ERR ${e.getClass.getSimpleName}" }
    })
    s.stop()
  }
}
