package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for FileTailSource's byte-range splitting: batch-read a
  * large line file at two split counts and report throughput. The work per
  * line (length + hash aggregation) is constant, so the speedup isolates
  * the SCAN's parallelism — the claim in SCALE.md §9 that a large file
  * reads in parallel with no coordination.
  *
  * Usage: sbt "runMain graft.tools.TailScale [sizeMB] [reps]"
  */
object TailScale {
  def main(args: Array[String]): Unit = {
    val sizeMB = args.headOption.map(_.toInt).getOrElse(400)
    val pairs = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val f = java.nio.file.Files.createTempFile("graft_tailscale", ".log")
    val w = java.nio.file.Files.newBufferedWriter(f)
    var bytes = 0L
    var i = 0L
    while (bytes < sizeMB.toLong * 1024 * 1024) {
      val line = s"2024-01-01T00:00:00 host${i % 512} INFO event-$i payload-${"x" * (i % 64).toInt}\n"
      w.write(line); bytes += line.length; i += 1
    }
    w.close()
    val nLines = i
    println(s"file: $f  ${bytes / 1024 / 1024} MB  $nLines lines")

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def job(parts: Int): Double = {
      val t0 = System.nanoTime()
      val n = spark.read.format("graft.sources.FileTailSource")
        .option("path", f.toString).option("partitions", parts).load()
        .agg(count(lit(1)), sum(length(col("message"))), max(xxhash64(col("message"))))
        .collect()(0).getLong(0)
      require(n == nLines, s"parts=$parts read $n of $nLines lines")
      (System.nanoTime() - t0) / 1e9
    }
    job(4); job(32) // JIT warmup
    val t4 = (1 to pairs).map(_ => job(4)).min
    val t32 = (1 to pairs).map(_ => job(32)).min
    println(f"parts=4: $t4%.2f s (${bytes / t4 / 1024 / 1024}%.0f MB/s)  " +
      f"parts=32: $t32%.2f s (${bytes / t32 / 1024 / 1024}%.0f MB/s)  " +
      f"speedup ${t4 / t32}%.2f")
    java.nio.file.Files.delete(f)
    spark.stop()
  }
}
