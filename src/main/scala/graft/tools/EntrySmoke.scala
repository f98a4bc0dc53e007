package graft.tools

import org.apache.spark.sql.SparkSession

/** Local smoke runner for the driver's entry-point contract:
  * prints SparkEntry.entry rows and the physical plan.
  * Usage: sbt "runMain graft.tools.EntrySmoke"
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    println("ENTRY_ROWS=" + rows.length + " :: " + rows.mkString("; "))
    if (args.contains("--explain")) df.explain("formatted")
    spark.stop()
  }
}
