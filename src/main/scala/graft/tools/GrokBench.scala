package graft.tools

import org.apache.spark.sql.functions._

/** Micro-benchmark: one-pass RegexExtractStruct grok vs composed
  * rlike + per-capture regexp_extract, on amplified apache-style lines.
  * Usage: runMain graft.tools.GrokBench [rows]
  */
object GrokBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = graft.LogPipeline.session("grok-bench", "local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val lines = spark.range(rows).select(
      concat(lit("10."), (col("id") % 100).cast("string"), lit(".0.1 - - ["),
        lit("02/Jan/2024:03:04:05 +0000] \"GET /api/v"), (col("id") % 9).cast("string"),
        lit(" HTTP/1.1\" 200 "), (col("id") % 5000).cast("string"),
        lit(" \"Mozilla/5.0 Chrome/120.0\"")).as("line"))
      .repartition(8).persist()
    lines.count()
    val pat = "%{IP:client} - - [%{HTTPDATE:tstamp}] \"%{WORD:verb} %{URIPATH:path} " +
      "HTTP/%{NUMBER:httpv}\" %{INT:status:int} %{INT:bytes:int} \"%{DATA:uastr}\""
    // force every capture: hash all extracted fields, aggregate the hashes
    def forceAll(df: org.apache.spark.sql.DataFrame): Unit = {
      df.select(xxhash64(col("client"), col("tstamp"), col("verb"), col("path"),
          col("httpv"), col("status"), col("bytes"), col("uastr")).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      ()
    }
    def time(label: String, f: => Unit): Unit = {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"GROKBENCH $label%s best=$best%.2fs rate=${rows / best / 1e6}%.2fM rows/s")
    }
    time("one-pass", forceAll(graft.operators.Parse.grok(lines.toDF(), "line", pat)))
    time("composed", forceAll(graft.operators.Parse.grokComposed(lines.toDF(), "line", pat)))
    spark.stop()
  }
}
