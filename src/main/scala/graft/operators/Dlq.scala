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
}
