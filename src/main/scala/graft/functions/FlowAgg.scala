package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Logstash flow-metric rate (events/sec = Δcount / Δuptime, reference
  * FlowMetric.java:31-50) as a typed Spark Aggregator — the §2.8
  * "flush-capable filter / UDAF" extension surface, exercised end-to-end.
  *
  * Input: event-time micros. Buffer: (n, minTs, maxTs). Output: events/sec
  * over the observed span (0 when the span is empty). Deterministic and
  * mergeable (associative+commutative), so partial aggregation works and the
  * operator map-side combines like any built-in agg.
  */
object FlowAgg {

  final case class RateBuf(n: Long, minTs: Long, maxTs: Long)

  val rate: Aggregator[java.lang.Long, RateBuf, Double] =
    new Aggregator[java.lang.Long, RateBuf, Double] {
      override def zero: RateBuf = RateBuf(0L, Long.MaxValue, Long.MinValue)
      override def reduce(b: RateBuf, tsMicros: java.lang.Long): RateBuf =
        if (tsMicros == null) b
        else RateBuf(b.n + 1, math.min(b.minTs, tsMicros), math.max(b.maxTs, tsMicros))
      override def merge(a: RateBuf, b: RateBuf): RateBuf =
        RateBuf(a.n + b.n, math.min(a.minTs, b.minTs), math.max(a.maxTs, b.maxTs))
      override def finish(b: RateBuf): Double = {
        // op order fixed as n / ((max-min)/1e6) — the oracle SQL mirrors it
        // term-for-term so the IEEE result is bit-identical
        val spanSec = (b.maxTs - b.minTs) / 1e6
        if (b.n == 0 || spanSec <= 0) 0.0 else b.n / spanSec
      }
      override def bufferEncoder: Encoder[RateBuf] = Encoders.product[RateBuf]
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Column form: events/sec over a timestamp column (micros precision). */
  def eventsPerSec(tsMicros: Column): Column =
    org.apache.spark.sql.functions.udaf(rate).apply(tsMicros)
}
