package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of one registered query:
  * runMain graft.tools.PlanDump <queryName> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .appName(s"plan-$name").master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      println(s"=== PLAN $name ===")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println(s"=== END $name ===")
    } finally spark.stop()
  }
}
