package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence probe for the hot-key-safe config throttle
  * (Stateful.throttleMatchedTwoPhase): builds a flooded-key fixture — ONE
  * key holding 80% of all events inside ONE period, the regime throttle
  * exists for — and reports
  *
  *  1. agreement with the single-window reference form (throttleMatched),
  *  2. the phase-1 salt fan-out: max rows any (key, slot, bucket) window
  *     partition holds vs the flooded key's total (the single-window form
  *     puts ALL of them on one reducer),
  *  3. the phase-2 bound: candidates per (key, slot) vs the salt*threshold
  *     guarantee,
  *  4. the formatted physical plan of the two-phase output.
  *
  *   runMain graft.tools.ThrottleFloodProbe [nFlood] [nOther]
  */
object ThrottleFloodProbe {
  def main(args: Array[String]): Unit = {
    val nFlood = if (args.length > 0) args(0).toInt else 400000
    val nOther = if (args.length > 1) args(1).toInt else 100000
    val spark = SparkSession.builder()
      .appName("throttle-flood-probe").master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    try {
      val salt = 16
      val (before, after) = (3, 5)
      val threshold = after
      val df = spark.range(nFlood + nOther).select(
        when(col("id") < nFlood, lit("hot")).otherwise(concat(lit("k"), col("id") % 997)).as("key"),
        timestamp_seconds(lit(1704067200L) + col("id") % 3000).as("ts"),
        col("id").as("eid"))
      val two = graft.operators.Stateful.throttleMatchedTwoPhase(
        df, col("key"), col("ts"), 86400L, before, after,
        orderCols = Seq(col("eid")), salt = salt)
      val ref = graft.operators.Stateful.throttleMatched(
        df, col("key"), col("ts"), 86400L, before, after, orderCols = Seq(col("eid")))
      val diff = two.as("a").join(ref.as("b"), Seq("eid"))
        .filter(col("a._throttle_matched") =!= col("b._throttle_matched")).count()
      println(s"AGREEMENT diff_rows=$diff of ${nFlood + nOther} " +
        s"(flood=$nFlood on one (key,period))")

      // phase-1 partition bound: the biggest salted window partition
      val slot = floor(unix_timestamp(col("ts")) / 86400L)
      val p1 = df
        .withColumn("_sb", pmod(xxhash64(col("ts").cast("string"), col("eid").cast("string")), lit(salt)))
        .groupBy(col("key"), slot.as("slot"), col("_sb")).count()
        .agg(max("count")).as[Long].head()
      println(f"PHASE1 max rows per (key,slot,bucket) window partition = $p1 " +
        f"(single-window form: $nFlood on one reducer; fan-out = ${nFlood.toDouble / p1}%.1f x)")

      // phase-2 bound: candidates per (key, slot) <= salt * threshold
      val w1 = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key"), slot, col("_sb")).orderBy(col("ts"), col("eid"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val cands = df
        .withColumn("_sb", pmod(xxhash64(col("ts").cast("string"), col("eid").cast("string")), lit(salt)))
        .withColumn("_rk1", sum(lit(1)).over(w1))
        .filter(col("_rk1") <= threshold)
        .groupBy(col("key"), slot.as("slot")).count()
        .agg(max("count")).as[Long].head()
      println(s"PHASE2 max candidates per (key,slot) = $cands " +
        s"(bound salt*threshold = ${salt * threshold})")

      println("=== PLAN throttleMatchedTwoPhase ===")
      println(two.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    } finally spark.stop()
  }
}
