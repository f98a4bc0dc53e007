package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence probe for snapshot-table reads (PLANS_r05.md): a table
  * built from K equal appends, then read three ways. The claims under test:
  *   - `incremental` cost ∝ the DELTA, not the table — it lists and scans
  *     only the added dirs of the snapshots in range (here 1/K of the data);
  *   - `read`/`asOf` plan from the manifest's live-dir list (no full
  *     directory walk), so a compacted table reads at full-scan speed with
  *     1 file instead of K;
  *   - the commit path (append) is flat in table size: each append writes
  *     its own dir + one manifest, never touching earlier data.
  *
  * Usage: sbt "runMain graft.tools.SnapScale"
  */
object SnapScale {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.operators.{SnapshotTable => ST}

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val t = java.nio.file.Files.createTempDirectory("graft_snapscale").toString
    val k = 16
    val rowsPer = 4000000L
    val appendSecs = (0 until k).map { i =>
      val batch = s.range(i * rowsPer, (i + 1) * rowsPer, 1, 32)
        .select(col("id"), concat(lit("payload "), col("id")).as("v"))
      time(ST.append(s, batch, t, Some(s"b$i")))._2
    }
    println(f"append wall first=${appendSecs.head}%.2f s last=${appendSecs.last}%.2f s " +
      f"(flat in table size: last/first=${appendSecs.last / appendSecs.head}%.2f)")

    val (full, fullSec) = time(ST.read(s, t).agg(sum("id")).collect()(0).getLong(0))
    val (delta, deltaSec) = time(
      ST.incremental(s, t, k - 2L, k - 1L).agg(sum("id")).collect()(0).getLong(0))
    println(f"full read  : $fullSec%6.2f s (sum=$full)")
    println(f"incremental: $deltaSec%6.2f s (sum=$delta) — " +
      f"${fullSec / deltaSec}%.1fx cheaper for a 1/$k delta")

    val (_, compactSec) = time(ST.compact(s, t, targetFiles = 4))
    val (_, postSec) = time(ST.read(s, t).agg(sum("id")).collect()(0).getLong(0))
    println(f"compact    : $compactSec%6.2f s; read post-compact: $postSec%6.2f s")
    s.stop()
  }
}
