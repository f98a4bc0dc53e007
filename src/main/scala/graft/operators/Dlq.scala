package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dead-letter-queue side channel with the reference's entry metadata
  * (DLQEntry.java:49-65): the full failed event plus `reason`,
  * `plugin_type`, `plugin_id`, `entry_time` — the reference serializes the
  * whole event alongside exactly these fields, and its DLQ input replays
  * entries from a start timestamp (the age seek).
  *
  * `entryTime` is caller-provided: a deterministic clock in gates/tests,
  * `current_timestamp()` in production — keeping replays and oracle
  * comparisons reproducible.
  */
object Dlq {

  /** Decorate failed events with DLQ entry metadata (columns appended; the
    * event payload is preserved like the reference's serialized event).
    */
  def entries(failed: DataFrame, reason: Column, pluginType: String,
              pluginId: String, entryTime: Column): DataFrame =
    failed
      .withColumn("reason", reason)
      .withColumn("plugin_type", lit(pluginType))
      .withColumn("plugin_id", lit(pluginId))
      .withColumn("entry_time", entryTime)

  /** Age-filtered replay feed — the DLQ reader's start-from-timestamp seek
    * (commit offsets in the reference's dead_letter_queue input).
    */
  def replayable(entries: DataFrame, minEntryTime: Column): DataFrame =
    entries.filter(col("entry_time") >= minEntryTime)

  /** Age retention (`dead_letter_queue.retain.age`): entries older than
    * `now - maxAgeSeconds` are expelled
    * (DeadLetterQueueWriter.java:475-483 executeAgeRetentionPolicy — the
    * reference deletes whole expired segments; the entry-level analogue).
    * `now` is caller-provided for deterministic gates/tests.
    */
  def ageRetained(entries: DataFrame, now: Column, maxAgeSeconds: Long): DataFrame =
    entries.filter(col("entry_time") >= now - expr(s"INTERVAL $maxAgeSeconds SECONDS"))

  /** `dead_letter_queue.max_bytes` with the two storage policies
    * (DeadLetterQueueWriter.java:489-524 executeStoragePolicy):
    *
    *  - `drop_newer` (reference default): the queue fills oldest-first and
    *    stops accepting — kept = the maximal oldest-first prefix whose
    *    cumulative size fits maxBytes;
    *  - `drop_older`: old segments are beheaded to admit new writes — kept =
    *    the maximal newest-first suffix that fits.
    *
    * (The reference enforces the bound at segment granularity and re-checks
    * per write; entry-granularity is the DataFrame analogue.)
    *
    * Scale shape: the running byte total is a TWO-PHASE distributed cumsum
    * in (entry_time, id) order — range-partition, per-partition totals to
    * the driver (one row per partition), broadcast exclusive prefix
    * offsets, per-partition running sum — never a global single-reducer
    * `Window.orderBy` (same construction as Text.packAssignments).
    */
  def bounded(entries: DataFrame, sizeCol: Column, idCol: String,
              maxBytes: Long, dropOlder: Boolean = false): DataFrame = {
    val spark = entries.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val sorted = entries
      .select(col(idCol).cast("long").as("_id"),
        unix_micros(col("entry_time").cast("timestamp")).as("_et"),
        sizeCol.cast("long").as("_sz"))
      .repartitionByRange(parts, col("_et"), col("_id"))
      .sortWithinPartitions("_et", "_id")
    val rdd = sorted.queryExecution.toRdd
      .mapPartitions(it => it.map(r => (r.getLong(0), r.getLong(2))),
        preservesPartitioning = true)
    val totals = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L; it.foreach(s += _._2); Iterator((pid, s))
    }.collect().sortBy(_._1)
    val grandTotal = totals.map(_._2).sum
    val prefix: Map[Int, Long] = {
      var acc = 0L
      totals.map { case (pid, s) => val before = acc; acc += s; pid -> before }.toMap
    }
    val bc = spark.sparkContext.broadcast(prefix)
    val cums = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = bc.value(pid)
      it.map { case (id, sz) => cum += sz; org.apache.spark.sql.Row(id, sz, cum) }
    }
    import org.apache.spark.sql.types._
    val cumDf = spark.createDataFrame(cums, StructType(Seq(
      StructField("_cid", LongType), StructField("_csz", LongType),
      StructField("_cum", LongType))))
    val kept =
      if (!dropOlder) cumDf.filter(col("_cum") <= maxBytes)
      else cumDf.filter(lit(grandTotal) - col("_cum") + col("_csz") <= maxBytes)
    entries.join(kept.select(col("_cid")),
        col(idCol).cast("long") === col("_cid"), "left_semi")
  }
}
