package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Rolling flow metrics — the reference's FlowMetric/ExtendedFlowMetric
  * rate-of-rates windows (`current`, `last_1_minute`, `last_5_minutes`,
  * `last_15_minutes`, ..., `lifetime`; FlowMetric.java:31-50,
  * ExtendedFlowMetric.java) computed batch-exactly over a cumulative
  * counter-capture series.
  *
  * A "capture" is one (key, ts, counter) snapshot; the rate for window W at
  * capture t is Δcounter / Δseconds between t and the EARLIEST capture
  * inside [t-W, t] (the retained-series baseline the extended metric keeps).
  * `current` is the rate vs the immediately preceding capture; `lifetime`
  * spans back to the first capture of the key.
  *
  * All windows share ONE hash partitioning on the key (single exchange);
  * range frames are per-row O(1) running aggregates, so the whole surface is
  * one window stage at any scale.
  */
object Flow {

  val StandardWindows: Seq[(String, Long)] = Seq(
    "last_1_minute" -> 60L, "last_5_minutes" -> 300L, "last_15_minutes" -> 900L)

  /** Rolling rates over captures `(keyCol, tsCol, counterCol)`. Adds one
    * rate column per window plus `current` and `lifetime`, each rounded to
    * 6dp (null when the window holds no prior capture).
    */
  def rollingRates(captures: DataFrame, keyCol: String, tsCol: String,
                   counterCol: String,
                   windows: Seq[(String, Long)] = StandardWindows): DataFrame = {
    val ep = col("_ep")
    val cnt = col(counterCol).cast("double")
    val base = captures.withColumn("_ep", unix_timestamp(col(tsCol).cast("timestamp")))
    def rate(dc: Column, ds: Column): Column =
      round(when(ds > 0, dc / ds), 6) // same-instant or first capture -> null

    val ordered = Window.partitionBy(col(keyCol)).orderBy(ep)
    val life = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var out = base
      .withColumn("current",
        rate(cnt - lag(cnt, 1).over(ordered), ep - lag(ep, 1).over(ordered)))
      .withColumn("lifetime",
        rate(cnt - first(cnt).over(life), ep - first(ep).over(life)))
    for ((name, secs) <- windows) {
      val w = Window.partitionBy(col(keyCol)).orderBy(ep).rangeBetween(-secs, 0)
      out = out.withColumn(name,
        rate(cnt - first(cnt).over(w), ep - first(ep).over(w)))
    }
    out.drop("_ep")
  }

  /** Extended worker flow metrics (AbstractPipelineExt.java:585-600):
    *
    *  - `queue_backpressure` = Δpush_wait_ms / Δuptime_ms — time spent
    *    blocked pushing into the queue per unit uptime;
    *  - `worker_concurrency` = Δduration_ms / Δuptime_ms — average number of
    *    busy workers;
    *  - `worker_utilization` = Δduration_ms · 100 / (Δuptime_ms · workers) —
    *    percent of available worker time spent processing (the reference's
    *    UpScaledMetric(100) over UpScaledMetric(workers) construction).
    *
    * Each is a FlowMetric whose DENOMINATOR is the pipeline's uptime counter
    * rather than wall seconds, so the same delta algebra serves `current`
    * (vs previous capture), the rolling windows (vs earliest capture in
    * range) and `lifetime` (vs first capture). All columns share ONE hash
    * partitioning on the key — a single exchange at any scale.
    */
  def workerFlows(captures: DataFrame, keyCol: String, tsCol: String,
                  pushWaitCol: String, durationCol: String, uptimeCol: String,
                  workers: Int,
                  windows: Seq[(String, Long)] = StandardWindows): DataFrame = {
    val ep = col("_ep")
    val base = captures.withColumn("_ep", unix_timestamp(col(tsCol).cast("timestamp")))
    val ordered = Window.partitionBy(col(keyCol)).orderBy(ep)
    val life = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val den = col(uptimeCol).cast("double")
    // 6dp quantization as PURE double arithmetic (floor(x*1e6+0.5)/1e6)
    // rather than round(x,6): round()'s decimal HALF_UP and an oracle
    // engine's double rounding can disagree when x*1e6 sits exactly on a
    // half boundary (observed once in 80k rows at sf0.1); this formula is
    // deterministic across engines because every step is IEEE double math.
    val q6 = (x: Column) => floor(x * 1000000.0d + 0.5d) / 1000000.0d
    val ratio = (dn: Column, dd: Column) => when(dd > 0, q6(dn / dd))
    val pct = (dn: Column, dd: Column) =>
      when(dd > 0, q6(dn * 100 / (dd * workers)))
    val metrics: Seq[(String, Column, (Column, Column) => Column)] = Seq(
      ("queue_backpressure", col(pushWaitCol).cast("double"), ratio),
      ("worker_concurrency", col(durationCol).cast("double"), ratio),
      ("worker_utilization", col(durationCol).cast("double"), pct))
    var out = base
    for ((name, num, f) <- metrics) {
      out = out.withColumn(name,
        f(num - lag(num, 1).over(ordered), den - lag(den, 1).over(ordered)))
      for ((wn, secs) <- windows) {
        val w = Window.partitionBy(col(keyCol)).orderBy(ep).rangeBetween(-secs, 0)
        out = out.withColumn(s"${name}_$wn",
          f(num - first(num).over(w), den - first(den).over(w)))
      }
      out = out.withColumn(s"${name}_lifetime",
        f(num - first(num).over(life), den - first(den).over(life)))
    }
    out.drop("_ep")
  }

  /** Capture series from an event stream: cumulative event count per key per
    * `period` bucket — the batch analogue of the reference's periodic
    * capture() cadence.
    */
  def captures(events: DataFrame, keyCol: String, tsCol: String,
               period: String = "minute"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("capture_ts"))
    events
      .groupBy(col(keyCol), date_trunc(period, col(tsCol)).as("capture_ts"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("counter", sum(col("_n")).over(w))
      .drop("_n")
  }
}
