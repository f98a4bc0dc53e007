package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.operators.SnapshotPipe]]: per-run cost must track
  * the DELTA, not the source table. The source table grows 4M → 36M rows
  * across stages; at each stage ONE fixed-size 1M-row delta is appended and
  * piped. Flat wall across stages = the pipe lists and scans only the
  * delta's data dirs (plus one manifest read), regardless of how much
  * history sits behind them.
  */
object PipeScale {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.operators.{SnapshotPipe, SnapshotTable => ST}

    val src = java.nio.file.Files.createTempDirectory("graft_pscale_src").toString
    val sink = java.nio.file.Files.createTempDirectory("graft_pscale_sink").toString
    def rows(n: Long, tag: Int) =
      s.range(n).select((col("id") + tag * 100000000L).as("id"),
        md5(concat(lit(tag), col("id"))).as("payload"))
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    var grown = 0L
    for (stage <- 0 until 3) {
      // grow history: stage adds 4M, then 12M, then 20M rows of bulk
      val bulk = 4000000L * (1 + stage * 2)
      ST.append(s, rows(bulk, stage * 10 + 1), src)
      grown += bulk
      // catch the sink up over the bulk (untimed), so the timed run below
      // has exactly ONE unprocessed snapshot — the fixed 1M delta
      SnapshotPipe.run(s, src, sink)((d, _) => d.filter(col("id") % 10 =!= 0))
      ST.append(s, rows(1000000L, stage * 10 + 2), src)
      val t = time {
        SnapshotPipe.run(s, src, sink) { (delta, _) =>
          delta.filter(col("id") % 10 =!= 0)
        }
      }
      println(f"source=${grown + (stage + 1) * 1000000L}%,d rows  piped 1M delta in $t%.2f s")
    }
    s.stop()
  }
}
