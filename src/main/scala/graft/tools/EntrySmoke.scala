package graft.tools

import org.apache.spark.sql.SparkSession

/** Local smoke runner for the driver's entry-point contract:
  * prints SparkEntry.entry rows and the physical plan.
  * Usage: sbt "runMain graft.tools.EntrySmoke"
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    // production session factory (AQE + skew join + dynamic overwrite)
    System.setProperty("spark.sql.session.timeZone", "UTC")
    System.setProperty("spark.ui.enabled", "false")
    val spark = graft.LogPipeline.session("entry-smoke", "local[8]", shufflePartitions = 8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    println("ENTRY_ROWS=" + rows.length + " :: " + rows.mkString("; "))
    if (args.contains("--explain")) df.explain("formatted")
    spark.stop()
  }
}
